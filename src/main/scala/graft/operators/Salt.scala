package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join splitting handles
  * sort-merge joins at runtime; explicit salting is the plan-level tool
  * for the cases AQE cannot rewrite (aggregate-after-join pipelines,
  * broadcast-ineligible dimension sides, deterministic partitioning
  * requirements). The result is row-identical to the unsalted join.
  */
object Salt {

  /** Inner equi-join with the big (skewed) side salted into `factor`
    * sub-keys and the small side replicated `factor`×. A hot key's rows
    * spread over `factor` reducer partitions instead of one straggler
    * task; the cost is `factor` copies of the small side's matching rows
    * in the shuffle (choose factor ≈ skew ratio, small side must be the
    * dimension side).
    *
    * The salt is derived from the big side's whole row (hash of all
    * columns mod factor): deterministic — reruns produce identical
    * partitioning — while distinct rows of a hot key still fan out. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(factor)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }
}
