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

  test("profileSketched: exact below k, ~6% above, partition-independent") {
    import sqlImplicits._
    val df = (1L to 5000L).map(i => (i, i % 37, s"v${i % 5}")).toDF("id", "m", "s")
    def byCol(d: org.apache.spark.sql.DataFrame) =
      Profile.profileSketched(d, Seq("id", "m", "s"), k = 256)
        .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val out = byCol(df)
    // below k=256 the sketch saw every hash → exact
    assert(out("m").getAs[Long]("est_distinct") == 37)
    assert(out("s").getAs[Long]("est_distinct") == 5)
    // above k: KMV error ~1/sqrt(256) ≈ 6%; allow 4 sigma
    val est = out("id").getAs[Long]("est_distinct")
    assert(math.abs(est - 5000) < 1250, s"estimate $est too far from 5000")
    // shared columns of the exact profile agree
    val exact = Profile.profile(df, Seq("m")).collect().head
    assert(out("m").getAs[Long]("n_rows") == exact.getAs[Long]("n_rows"))
    assert(out("m").getAs[Long]("n_nonnull") == exact.getAs[Long]("n_nonnull"))
    assert(out("m").getAs[String]("min_value") == exact.getAs[String]("min_value"))
    assert(out("m").getAs[String]("max_value") == exact.getAs[String]("max_value"))
    // deterministic under repartitioning
    val again = byCol(df.repartition(13))
    assert(again("id").getAs[Long]("est_distinct") == est)
    intercept[IllegalArgumentException](Profile.profileSketched(df, Seq("id"), k = 1))
  }
}
