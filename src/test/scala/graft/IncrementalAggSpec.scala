package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import sqlImplicits._

  private val keys = Seq("grp")
  private val measures = Seq("amt")

  private def facts(rows: (String, Double)*): DataFrame =
    rows.toDF("grp", "amt")

  private def sortedRows(df: DataFrame) =
    df.orderBy("grp").collect().map(r =>
      (r.getString(0), r.getAs[Long]("n_rows"), r.getAs[Long]("amt_cents"))).toSeq

  test("merge of batch states equals single-pass state (monoid law)") {
    val a = facts(("x", 1.10), ("x", 2.05), ("y", 3.33))
    val b = facts(("x", 0.85), ("z", 7.00))
    val whole = IncrementalAgg.state(a.unionByName(b), keys, measures)
    val merged = IncrementalAgg.merge(keys, measures)(
      IncrementalAgg.state(a, keys, measures),
      IncrementalAgg.state(b, keys, measures))
    assert(sortedRows(merged) == sortedRows(whole))
    // three-way split, different batching — same state
    val threeWay = IncrementalAgg.merge(keys, measures)(
      IncrementalAgg.state(a.limit(1), keys, measures),
      IncrementalAgg.state(a.exceptAll(a.limit(1)), keys, measures),
      IncrementalAgg.state(b, keys, measures))
    assert(sortedRows(threeWay) == sortedRows(whole))
  }

  test("empty delta is the identity; finish renders exact dollars") {
    val base = IncrementalAgg.state(facts(("x", 1.10), ("y", 0.02)), keys, measures)
    val emptyDelta = IncrementalAgg.state(facts().limit(0), keys, measures)
    val merged = IncrementalAgg.merge(keys, measures)(base, emptyDelta)
    assert(sortedRows(merged) == sortedRows(base))
    val out = IncrementalAgg.finish(merged, keys, measures).orderBy("grp").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n_rows"),
      r.getAs[Double]("amt_sum"))).toSeq == Seq(("x", 1L, 1.10), ("y", 1L, 0.02)))
  }

  test("null measures count toward n_rows but not the sum") {
    val st = IncrementalAgg.state(
      Seq(("x", Some(2.50)), ("x", None)).toDF("grp", "amt"), keys, measures)
    assert(sortedRows(st) == Seq(("x", 2L, 250L)))
  }
}
