package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomBridge

/** The runtime-filter join pattern made explicit: build a Bloom filter
  * over the dimension side's join keys, drop fact rows that cannot match
  * BEFORE they reach the join's shuffle, then let an exact join remove
  * the false positives. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the (often <1%) slice
  * that can possibly join — the same plan AQE's InjectRuntimeFilter
  * produces when its thresholds line up; this operator is for when they
  * don't (filtering dim side too large to broadcast-DPP, semi-join
  * pipelines, or a pre-computed dim you reuse across queries).
  */
object Bloom {

  /** Exact semi-join (`fact` rows whose `factKey` exists among `dim`'s
    * `dimKey`s) with a Bloom pre-filter. Result is EXACTLY the plain
    * semi-join — the Bloom filter only prunes, false positives are
    * removed by the real join; NULL keys never match, per SQL semantics
    * (`might_contain(NULL)` is NULL, so the filter drops them).
    *
    * Keys of any type are hashed to LONG with xxhash64 first, so the
    * filter works for strings/composites too. The built filter is
    * materialized on the driver and shipped as a plan literal — the same
    * mechanics as Spark's own runtime-filter subquery (the sketch is
    * `numBits/8` bytes — size it for the DIM side, which is the small
    * side by construction). `fpp` trades sketch size against how many
    * false-positive fact rows still reach the exact join. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val numBits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val bloomBytes = dim
      .agg(BloomBridge.bloomAgg(xxhash64(col(dimKey)), expectedItems, numBits).as("__bf"))
      .head.getAs[Array[Byte]]("__bf")
    // Empty dim (or all-NULL keys) ⇒ NULL sketch ⇒ nothing can match.
    if (bloomBytes == null) fact.filter(lit(false))
    else fact
      .filter(BloomBridge.mightContain(bloomBytes, xxhash64(col(factKey))))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_semi")
  }
}
