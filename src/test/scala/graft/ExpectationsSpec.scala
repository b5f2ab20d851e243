package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations

class ExpectationsSpec extends SparkSpec {
  import sqlImplicits._

  test("rowChecks: all checks fold into one scan, empty table passes") {
    val df = Seq(
      (Option(1L), 5.0), (Option(2L), -1.0), (None, 3.0), (Option(4L), -2.0)
    ).toDF("id", "amt")
    val rep = Expectations.rowChecks(df, "t", Seq(
      "id_not_null" -> col("id").isNull,
      "amt_non_negative" -> (col("amt") < 0))).orderBy("check_name").collect()
    assert(rep.map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq(("amt_non_negative", 2L, 4L, 0L), ("id_not_null", 1L, 4L, 0L)))
    // empty input: zero violations (sum-over-nothing coalesced), pass=1
    val empty = Expectations.rowChecks(df.limit(0), "t",
      Seq("id_not_null" -> col("id").isNull)).collect().head
    assert(empty.getLong(2) == 0L && empty.getLong(3) == 0L && empty.getLong(4) == 1L)
  }

  test("uniqueCheck counts rows beyond the first per duplicate key") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val r = Expectations.uniqueCheck(df, "t", Seq("k"), "k_unique").collect().head
    assert(r.getLong(2) == 2L && r.getLong(3) == 4L && r.getLong(4) == 0L)
    val ok = Expectations.uniqueCheck(df.dropDuplicates("k"), "t", Seq("k"), "k_unique")
      .collect().head
    assert(ok.getLong(2) == 0L && ok.getLong(4) == 1L)
  }

  test("fkCheck: NULL fact keys are not violations; orphans are") {
    val dim = Seq(1L, 2L).toDF("did")
    val fact = Seq(Option(1L), Option(2L), Option(3L), None).toDF("fk")
    val r = Expectations.fkCheck(fact, "f", "fk", dim, "did", "fk_cov").collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 4L && r.getLong(4) == 0L)
  }

  test("report unions frames in a stable order") {
    val df = Seq((1L, 1.0)).toDF("id", "amt")
    val rep = Expectations.report(Seq(
      Expectations.rowChecks(df, "b", Seq("x" -> lit(false))),
      Expectations.uniqueCheck(df, "a", Seq("id"), "u"))).collect()
    assert(rep.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rep.forall(_.getLong(4) == 1L))
  }
}
