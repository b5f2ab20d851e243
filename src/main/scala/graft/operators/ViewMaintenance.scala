package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshot

/** INCREMENTAL VIEW MAINTENANCE: keep materialized aggregates — over one
  * table or a join — current under inserts, upserts and deletes for
  * O(changes) work per refresh, never an O(table) recompute.
  *
  * [[IncrementalAgg]] covers the insert-only case (additive monoid
  * state). Updates and deletes need RETRACTABLE state: every change
  * becomes a SIGNED row (+1 insert / -1 retraction of a previous row),
  * per-group counts and exact cent sums add the sign through, and a
  * group whose row count reaches zero leaves the view. This is the
  * signed-multiset algebra every IVM engine (DBSP/Materialize, Delta
  * CDF consumers) runs on.
  *
  * Where the signs come from: [[Snapshot.changesBetween]] deliberately
  * emits delete events as keys-only (reading old values would cost the
  * table body at feed time). The consumer enriches them here —
  * [[signedStep]] semi-joins the table read AT the previous version
  * against one version-step's delete keys: ONE pass over the prev
  * version's segments with the key predicate pushed to the scan — no
  * aggregation shuffle, no view rewrite, and prunable further by the
  * key-clustered layouts [[graft.sources.Cluster]] writes (file min/max
  * boxes make a key-range delete touch only its files). This derives
  * exactly the "preimage" rows a CDC log with before-images would
  * carry, lazily, in the one consumer class that needs them.
  *
  * For a view over a JOIN, the delta is the standard bilinear rule
  * Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB (signs multiply; base sides carry +1),
  * so refresh work is O(Δ ⋈ base) — two delta-sized joins against
  * key-skippable base reads — instead of re-joining two 100 TB tables.
  */
object ViewMaintenance {

  /** Sign column: +1 = row arrives in the view's input, -1 = the row it
    * replaces/removes is retracted. */
  val SignCol = "_sign"

  private def cents(c: String) = expr(s"CAST(round($c * 100) AS BIGINT)")

  /** The signed rows of ONE main-version step (prevV -> v) of `table`:
    * the step's inserts as +1 rows and, for each delete event, the full
    * preimage row at `prevV` as a -1 row. Upsert feeds emit delete
    * events for not-previously-live keys too; the preimage inner join
    * drops those no-ops. Cost: O(step changes) feed read + one
    * key-join against the prevV read (skippable via the table's
    * stats/bloom sidecars when committed with them). */
  def signedStep(spark: SparkSession, root: String, table: String,
      prevV: Long, v: Long, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "signedStep: need key columns")
    val feed = Snapshot.changesBetween(spark, root, table, prevV, v)
    val dataCols = feed.columns.filterNot(c =>
      c == Snapshot.ChangeTypeCol || c == Snapshot.CommitVersionCol).toSeq
    val inserts = feed.filter(col(Snapshot.ChangeTypeCol) === "insert")
      .select(dataCols.map(col): _*)
      .withColumn(SignCol, lit(1))
    val delKeys = feed.filter(col(Snapshot.ChangeTypeCol) === "delete")
      .select(keys.map(col): _*)
    val preimages = Snapshot.readAt(spark, root, table, prevV)
      .join(delKeys, keys, "left_semi")
      .select(dataCols.map(col): _*)
      .withColumn(SignCol, lit(-1))
    inserts.unionByName(preimages)
  }

  /** Per-group retractable state of a batch of signed rows: row count
    * and exact cent sums, each weighted by the sign. The same shape as
    * [[IncrementalAgg.state]] (a signed batch of all +1 rows produces
    * identical state), so bootstrap state comes from there. */
  def signedState(signed: DataFrame, groupKeys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(groupKeys.nonEmpty && measures.nonEmpty, "need keys and measures")
    signed.groupBy(groupKeys.map(col): _*)
      .agg(sum(col(SignCol).cast("long")).as("n_rows"),
        measures.map(m => sum(col(SignCol) * cents(m)).as(s"${m}_cents")): _*)
  }

  /** Fold signed-delta state into prior state and drop groups retracted
    * to zero rows. O(state ∪ delta groups) — the facts never reappear. */
  def applySigned(state: DataFrame, delta: DataFrame, groupKeys: Seq[String],
      measures: Seq[String]): DataFrame =
    IncrementalAgg.merge(groupKeys, measures)(state, delta)
      .filter(col("n_rows") =!= 0L)

  /** PERSISTED, cursor-driven refresh: keep `viewTable` — the grouped
    * retractable state of `table` — current inside the same snapshot
    * root. First call bootstraps the view from the table body (the one
    * O(table) pass) and records the version it reflects; later calls
    * walk only the main-history steps past the cursor, union their
    * signed rows, fold ONCE into the stored view, and commit the new
    * view + cursor atomically (one manifest). Replays are idempotent:
    * a call that finds no table changes past its cursor commits
    * nothing. This is the refresh loop [[graft.streaming.StreamOps
    * .streamingIvm]] drives per micro-batch; O(changes + view groups)
    * per call, the table body is never re-read after bootstrap. */
  def advanceView(spark: SparkSession, root: String, table: String,
      keys: Seq[String], groupKeys: Seq[String], measures: Seq[String],
      viewTable: String = ""): Long = {
    import spark.implicits._
    val vt = if (viewTable.nonEmpty) viewTable else table + "_view"
    val ct = vt + "_cursor"
    val tables = Snapshot.tables(spark, root).keySet
    val head = Snapshot.currentVersion(spark, root).getOrElse(0L)
    if (!tables.contains(table)) return head // nothing to view yet
    if (!tables.contains(vt))
      return Snapshot.commit(spark, root, Map(
        vt -> IncrementalAgg.state(
          Snapshot.readAt(spark, root, table, head), groupKeys, measures),
        ct -> Seq(head).toDF("version")))
    val cur = Snapshot.read(spark, root, ct).head().getLong(0)
    if (cur >= head) return head
    val steps = Snapshot.mainVersionsBetween(spark, root, cur, head)
    val signed = steps.foldLeft((cur, Option.empty[DataFrame])) {
      case ((prev, acc), v) =>
        val s = signedStep(spark, root, table, prev, v, keys)
        (v, Some(acc.fold(s)(_ unionByName s)))
    }._2
    signed match {
      case None => head // only branch commits in range
      case Some(sd0) =>
        // materialize once: the emptiness probe and the commit write must
        // not re-derive the multi-step feed
        val sd = sd0.localCheckpoint(true)
        try {
          if (sd.isEmpty) head // other tables moved; cursor stays, view valid
          else Snapshot.commit(spark, root, Map(
            vt -> applySigned(Snapshot.read(spark, root, vt),
              signedState(sd, groupKeys, measures), groupKeys, measures),
            ct -> Seq(head).toDF("version")))
        } finally Curate.release(sd)
    }
  }

  /** Signed delta of A ⋈ B (equi-join on `joinKeys`) given signed ΔA,
    * the POST-step B, the PRE-step A, and signed ΔB:
    * Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB. Pair sign = the delta side's sign
    * (base sides are +1 multisets). Both joins are delta-sized on one
    * side; project the frames to join keys + needed measures before
    * calling so the shuffle carries no dead columns. */
  def signedJoinDelta(dA: DataFrame, bNew: DataFrame,
      aOld: DataFrame, dB: DataFrame, joinKeys: Seq[String]): DataFrame = {
    require(joinKeys.nonEmpty, "signedJoinDelta: need join keys")
    def side(delta: DataFrame, base: DataFrame): DataFrame = {
      // the delta side keeps its sign; the base side must not carry one
      require(delta.columns.contains(SignCol), "delta frame missing _sign")
      require(!base.columns.contains(SignCol), "base frame must be unsigned")
      delta.join(base, joinKeys.toSeq, "inner")
    }
    val left = side(dA, bNew)
    val right = side(dB, aOld).select(left.columns.map(col): _*)
    left.unionByName(right)
  }
}
