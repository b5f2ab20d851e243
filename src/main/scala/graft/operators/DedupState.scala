package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** PERSISTED incremental-dedup state: the per-document signature rows a
  * continuously-ingesting corpus stores so that absorbing a new batch
  * NEVER re-reads corpus text (cf. /root/reference's per-load MERGE
  * staging — the reference re-stages per run; at 100 TB the corpus-side
  * derivation must be paid once and maintained incrementally).
  *
  * State schema (one row per corpus doc, persisted as an ordinary
  * table — [[graft.sources.Snapshot]] append segments are the natural
  * carrier, see [[graft.streaming.StreamOps.ingestBatchExactlyOnce]]):
  *
  *  - `fp`  — md5 fingerprint of the normalized text (exact dedup);
  *  - `sh`  — the doc's DISTINCT shingle set as 31-bit base hashes
  *            (array<long>, in-row distinct — the verify side);
  *  - `sig` — the minhash signature (array<long>, numHashes entries),
  *            derived in-row from `sh` (min over the same universal-hash
  *            family as [[NearDup.minhashSignatures]] — identical values,
  *            since min over the drawn hashes is unaffected by whether
  *            duplicates were merged before or after drawing).
  *
  * SEMANTICS vs [[NearDup.dedupeAgainst]]: verification Jaccard is
  * computed over the 31-bit HASHED shingle sets instead of the string
  * sets — the only thing the state stores. A within-doc 31-bit collision
  * merges two shingles and perturbs the ratio by ~1/|set| (probability
  * ~|set|²/2³², negligible and deterministic); the DuckDB oracle applies
  * the identical hashing, so the gate stays bit-exact by construction.
  *
  * Scale shape: deriving state is ONE text scan, all in-row (no shuffle
  * — the signature comes from an in-row array fold, not an exploded
  * groupBy); the batch-absorb path is the [[NearDup.dedupeAgainst]] join
  * inventory with every corpus-side text re-scan replaced by a state
  * read: exact anti-join on `fp`, LSH band equi-join on `sig` bands
  * (cross-only — corpus-internal pairs never form), candidate-bounded
  * in-row Jaccard over the stored `sh` arrays. Per-batch cost is
  * O(batch + candidates) compute over an O(corpus-rows) state scan —
  * no md5 is ever recomputed for a corpus doc. */
object DedupState {

  /** Reserved state column names (guarded in [[withState]]). */
  val FpCol = "fp"
  val ShCol = "sh"
  val SigCol = "sig"
  val StateCols: Seq[String] = Seq(FpCol, ShCol, SigCol)

  /** Conventional name of the persisted state table/dir for `table`. */
  def stateTable(table: String): String = table + "_sig"

  /** The 31-bit md5 base hash — same value [[NearDup.minhashSignatures]]
    * derives per shingle (and the oracle's `shh.hb`). */
  private def base31(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(0x7fffffffL))

  /** `docs` + the three state columns. One text scan, pure map — no
    * shuffle anywhere: shingles, their hash set, and the signature are
    * all in-row array ops. Each stage is its own projection so HOF
    * lambdas capture plain attributes (the measured-8× re-evaluation
    * pitfall in [[NearDup.shingleArrays]]'s scaladoc). */
  def withState(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 12): DataFrame = {
    require(shingleN > 0, s"shingle size must be positive, got $shingleN")
    StateCols.foreach { c =>
      require(!docs.columns.contains(c),
        s"input already has a column named the reserved state column '$c'") }
    val toks = col("__toks")
    // Par.spread: the in-row shingle/signature derivation is the dense
    // map (pure per-row arrays — partitioning-invariant by construction)
    val withSh = Par.spread(docs)
      .withColumn("__toks",
        filter(Text.tokens(Text.normalize(col(textCol))), t => length(t) > 0))
      // distinct the STRINGS before hashing (one md5 per distinct
      // shingle, not per occurrence), then distinct again after — a
      // 31-bit collision can merge two distinct strings
      .withColumn(ShCol, array_distinct(transform(
        array_distinct(
          when(size(toks) >= shingleN,
            transform(sequence(lit(0), size(toks) - shingleN),
              i => concat_ws(" ", slice(toks, i + 1, lit(shingleN)))))
          .otherwise(array().cast("array<string>"))),
        s => base31(s))))
      .drop("__toks")
    val sigs = NearDup.hashParams(numHashes).map { case (a, b) =>
      array_min(transform(col(ShCol), h => (h * a + b) % NearDup.MinhashPrime))
    }
    withSh
      .withColumn(FpCol, Text.fingerprint(col(textCol)))
      .withColumn(SigCol, array(sigs: _*))
  }

  /** Just the state rows (id + fp/sh/sig) — what gets persisted. */
  def stateOf(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 12): DataFrame =
    withState(docs, idCol, textCol, shingleN, numHashes)
      .select(col(idCol), col(FpCol), col(ShCol), col(SigCol))

  /** (id, band, band_hash) rows from a state-carrying frame — the same
    * band-hash formula as [[NearDup]]'s banded signatures (md5 of the
    * '|'-joined band slice), so any engine derives identical buckets.
    * Shingle-free docs (empty `sh` ⇒ all-NULL `sig`) produce no band
    * rows — they can never be NEAR-dup candidates, matching the
    * exploded-signature path where such docs simply have no rows. */
  private def bandRows(state: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val bandHashes = (0 until bands).map { b =>
      md5(concat_ws("|",
          (b * rows until (b + 1) * rows)
            .map(i => element_at(col(SigCol), i + 1).cast("string")): _*)
        .cast("binary"))
    }
    state.filter(size(col(ShCol)) > 0)
      .select(col(idCol), posexplode(array(bandHashes: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** [[NearDup.dedupeAgainst]] against PERSISTED state instead of corpus
    * text: returns the rows of `batch` that are neither exact nor near
    * duplicates of any state row — WITH their own fp/sh/sig columns
    * retained, so a caller absorbing the batch appends the survivors'
    * state rows without recomputing anything (drop [[StateCols]] if not
    * wanted). The corpus side of every join reads ONLY `state`; the
    * batch's text is scanned once (its own state derivation).
    *
    * Same contract as dedupeAgainst otherwise: batch-internal dups are
    * out of scope (exact-dedup the batch first), only exact-survivors
    * are banded, eager-checkpoint execution semantics. */
  def dedupeAgainstState(state: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, minJaccard: Double = 0.5,
      shingleN: Int = 3, numHashes: Int = 12, bands: Int = 6): DataFrame = {
    val cfp = state.select(col(FpCol)).distinct()
    // persisted: the exact-survivor frame feeds three consumers (band
    // join, candidate sh re-arm, final anti-join)
    val survivors = withState(batch, idCol, textCol, shingleN, numHashes)
      .join(cfp, Seq(FpCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    survivors.count()
    try {
      val cand = bandRows(state, idCol, numHashes, bands)
        .withColumnRenamed(idCol, "__corpus_id")
        .join(bandRows(survivors, idCol, numHashes, bands)
            .withColumnRenamed(idCol, "__batch_id"),
          Seq("band", "band_hash"))
        .select(col("__corpus_id"), col("__batch_id"))
        .distinct()
        .localCheckpoint(true)
      try {
        // candidate-bounded: broadcast the candidate id sets to prune
        // both sh-array reads before the verify join (the state scan
        // stays a pushdown-pruned (id, sh) projection)
        val cArrs = state.join(
            broadcast(cand.select(col("__corpus_id").as(idCol)).distinct()),
            Seq(idCol), "left_semi")
          .select(col(idCol).as("__corpus_id"), col(ShCol).as("__sha"))
        val bArrs = survivors.join(
            broadcast(cand.select(col("__batch_id").as(idCol)).distinct()),
            Seq(idCol), "left_semi")
          .select(col(idCol).as("__batch_id"), col(ShCol).as("__shb"))
        val dupIds = cand
          .join(cArrs, "__corpus_id")
          .join(bArrs, "__batch_id")
          .select(col("__batch_id"),
            size(array_intersect(col("__sha"), col("__shb"))).cast("long").as("__nc"),
            size(col("__sha")).cast("long").as("__na"),
            size(col("__shb")).cast("long").as("__nb"))
          .filter(col("__nc").cast("double") /
            (col("__na") + col("__nb") - col("__nc")) >= minJaccard)
          .select(col("__batch_id").as(idCol))
          .distinct()
        survivors.join(dupIds, Seq(idCol), "left_anti").localCheckpoint(true)
      } finally NearDup.freeCheckpoint(cand)
    } finally survivors.unpersist(false)
  }
}
