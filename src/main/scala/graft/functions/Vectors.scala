package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns, built
  * from Spark's codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDFs, so the expressions inline into whole-stage
  * codegen and survive column pruning/pushdown around them.
  *
  * All arithmetic is promoted to double; `aggregate` folds sequentially
  * left-to-right, so results are deterministic for a given array order.
  */
object Vectors {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with zero-vector guard (NULL when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val denom = norm(a) * norm(b)
    when(denom > 0, d / denom)
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH signature: `planes` is a driver-side
    * deterministic matrix (nPlanes × dim); each bit is sign(v·hⱼ).
    * Returns an integer bucket id in [0, 2^nPlanes). The planes are tiny
    * (nPlanes·dim doubles) and ship as literals — no broadcast needed. */
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (fixed seed → reproducible
    * buckets across runs and engines). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
