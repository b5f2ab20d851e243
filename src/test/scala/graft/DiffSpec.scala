package graft

import graft.operators.Diff

/** Diff.tableDiff classification semantics, including the NULL contract:
  * NULL → NULL is unchanged, NULL → value (and back) is updated. */
class DiffSpec extends SparkSpec {
  import sqlImplicits._

  private val oldT = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), Some(20)),
    (3L, None: Option[String], Some(30)),
    (4L, Some("d"), None: Option[Int]),
    (5L, Some("e"), Some(50)))
    .toDF("k", "s", "v")

  private val newT = Seq(
    (1L, Some("a"), Some(10)),    // unchanged
    (2L, Some("B"), Some(20)),    // updated (value change)
    (3L, None: Option[String], Some(30)), // unchanged (NULL == NULL)
    (4L, Some("d"), Some(40)),    // updated (NULL -> value)
    (6L, Some("f"), Some(60)))    // inserted; 5 deleted
    .toDF("k", "s", "v")

  test("classifies inserted/deleted/updated/unchanged with NULL-safe compare") {
    val m = Diff.tableDiff(oldT, newT, Seq("k"), includeUnchanged = true)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(m == Map(1L -> "unchanged", 2L -> "updated", 3L -> "unchanged",
      4L -> "updated", 5L -> "deleted", 6L -> "inserted"))
  }

  test("default output is the delta only") {
    val keys = Diff.tableDiff(oldT, newT, Seq("k"))
      .collect().map(_.getAs[Long]("k")).toSet
    assert(keys == Set(2L, 4L, 5L, 6L))
  }

  test("identical tables diff to an empty delta") {
    assert(Diff.tableDiff(oldT, oldT, Seq("k")).count() == 0)
    assert(Diff.tableDiff(oldT, oldT, Seq("k"), includeUnchanged = true)
      .filter($"change_type" =!= "unchanged").count() == 0)
  }

  test("composite keys and column-set mismatch guard") {
    val a = Seq((1L, 1L, "x")).toDF("k1", "k2", "v")
    val b = Seq((1L, 2L, "x")).toDF("k1", "k2", "v")
    val m = Diff.tableDiff(a, b, Seq("k1", "k2"), includeUnchanged = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[String]("change_type")).toMap
    assert(m == Map((1L, 1L) -> "deleted", (1L, 2L) -> "inserted"))
    intercept[IllegalArgumentException] {
      Diff.tableDiff(a, b.withColumnRenamed("v", "w"), Seq("k1"))
    }
  }
}
