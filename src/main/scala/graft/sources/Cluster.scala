package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering for snapshot tables — the layout
  * half of multi-dimensional data skipping. [[Snapshot]]'s per-file
  * min/max sidecars PRUNE; they only prune well when each file covers a
  * narrow slice of the queried column. A linear sort gives that for the
  * leading column only: a 100 TB fact table sorted by (tenant, day) answers
  * tenant probes from few files but day-range probes from ALL of them.
  * Interleaving the bits of both columns (the classic Morton curve; the
  * same layout Delta's OPTIMIZE ZORDER and Iceberg's sort orders expose)
  * makes file boundaries axis-aligned boxes in BOTH dimensions, so a
  * 2-D box predicate prunes on each axis independently.
  *
  * Everything here is driver-light and scale-safe: the per-column
  * domain bounds are ONE bounded 1-row aggregate, the z-value is a pure
  * codegen'd integer expression (shift/mask/or — no UDF), and the write
  * is a single `repartitionByRange` shuffle on the z-value (what any
  * global sort costs). Reads go through [[Snapshot.readPrunedMulti]],
  * which intersects per-file survivor sets across the box's predicates.
  *
  * Reference scope: the reference's physical hints are single-column
  * secondary indexes (`schema_sales_analytics.sql:72-73,93`); this is
  * the lakehouse-native generalization a plain-parquet store needs.
  *
  * Relation to [[Warehouse.writeZOrdered]]: that is the FREESTANDING
  * parquet-dir form (approx-quantile codes for skew robustness, relying
  * on parquet footer min/max at scan time). This module is the
  * SNAPSHOT-TABLE form: exact shift-scaled codes (deterministic at any
  * data distribution — no sketch in the write path), per-file min/max
  * SIDECARS recorded at commit, and manifest-level multi-predicate
  * pruning via [[Snapshot.readPrunedMulti]] — so the skipping survives
  * appends, time travel, and merge-on-read deletes, which a bare
  * parquet dir cannot offer. Heavily skewed domains cluster better
  * under quantile codes; id-like and date-like columns (the common
  * clustering keys) are near-uniform and shift codes keep the write
  * sketch-free.
  */
object Cluster {

  /** Morton z-value of `cols` (all integer-typed), each scaled into
    * `bitsPerDim` bits by a RIGHT SHIFT of its zero-based value — pure
    * integer arithmetic, no doubles, no overflow at any domain size
    * (shift amounts are computed driver-side from the known bounds).
    * Monotone per dimension: v1 <= v2 ⇒ scaled(v1) <= scaled(v2), which
    * is what keeps file min/max boxes faithful to the raw columns. */
  def zValue(cols: Seq[Column], los: Seq[Long], his: Seq[Long],
      bitsPerDim: Int = 16): Column = {
    require(cols.nonEmpty && cols.size == los.size && los.size == his.size,
      "zValue: cols/los/his must align")
    val n = cols.size
    require(n * bitsPerDim <= 62, s"zValue: $n dims x $bitsPerDim bits exceeds a Long")
    val scaled = cols.zip(los.zip(his)).map { case (c, (lo, hi)) =>
      val range = math.max(hi - lo, 0L)
      val rangeBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(range, 1L))
      val shift = math.max(rangeBits - bitsPerDim, 0)
      shiftrightunsigned(c.cast("long") - lit(lo), shift)
    }
    val terms = for {
      (s, d) <- scaled.zipWithIndex
      i <- 0 until bitsPerDim
    } yield shiftleft(shiftrightunsigned(s, i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Commit `df` into `root/table` Z-CLUSTERED on `zCols`: rows are
    * range-partitioned and sorted by their Morton value into `files`
    * files, and per-file min/max sidecars are recorded for every zCol —
    * after which [[Snapshot.readPrunedMulti]] box reads touch
    * O(box volume / file volume) files instead of all of them.
    * `append=true` adds a clustered segment to an existing table
    * (each segment prunes through its own sidecar), else this is a
    * create/replace commit. Returns the committed version. */
  def clusteredCommit(spark: SparkSession, root: String, table: String,
      df: DataFrame, zCols: Seq[String], files: Int,
      bitsPerDim: Int = 16, append: Boolean = false): Long = {
    require(zCols.nonEmpty, "clusteredCommit: need at least one zCol")
    require(files > 0, "clusteredCommit: need files > 0")
    // integral domains only: a non-integral zCol would cast to NULL and
    // silently cluster everything onto one curve point (pruning would
    // stay SOUND — it reads the real column stats — but useless)
    zCols.foreach { c =>
      val t = df.schema(c).dataType.simpleString
      require(Set("tinyint", "smallint", "int", "bigint").contains(t),
        s"clusteredCommit: zCol '$c' has non-integral type $t — derive an " +
          "integer surrogate first (days since epoch, cents, dictionary code)")
    }
    // ONE bounded 1-row aggregate for the domain bounds (O(scan) work,
    // O(zCols) driver bytes — never a collect of data rows)
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__lo_$c"), max(col(c).cast("long")).as(s"__hi_$c")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val los = zCols.indices.map(i => Option(b.get(2 * i)).fold(0L)(_.asInstanceOf[Long]))
    val his = zCols.indices.map(i => Option(b.get(2 * i + 1)).fold(0L)(_.asInstanceOf[Long]))
    val z = zValue(zCols.map(col), los, his, bitsPerDim)
    val clustered = df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    if (append)
      Snapshot.commitAppend(spark, root, appends = Map(table -> clustered),
        statsCols = Map(table -> zCols))
    else
      Snapshot.commit(spark, root, Map(table -> clustered),
        statsCols = Map(table -> zCols))
  }
}
