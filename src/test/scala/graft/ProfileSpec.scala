package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import sqlImplicits._

  private val df = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", null),
    (4L, null, 5.0), (5L, "c", 20.0), (null, "a", 30.0))
    .toDF("k", "s", "m")

  test("profile: exact counts, null handling, native-type min/max") {
    val out = Profile.profile(df, Seq("k", "s", "m")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("k", "s", "m"))
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") == 6))

    val k = out("k")
    assert(k.getAs[Long]("n_nonnull") == 5 && k.getAs[Long]("n_distinct") == 5)
    assert(k.getAs[String]("min_value") == "1" && k.getAs[String]("max_value") == "5")

    val s = out("s")
    assert(s.getAs[Long]("n_nonnull") == 5 && s.getAs[Long]("n_distinct") == 3)
    assert(s.getAs[String]("min_value") == "a" && s.getAs[String]("max_value") == "c")

    // numeric min/max compare as numbers, not text ("5.0" < "10.0")
    val m = out("m")
    assert(m.getAs[Long]("n_nonnull") == 5 && m.getAs[Long]("n_distinct") == 4)
    assert(m.getAs[String]("min_value") == "5.0" && m.getAs[String]("max_value") == "30.0")

    intercept[IllegalArgumentException](Profile.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.profile(df, Seq.empty))
  }
}
