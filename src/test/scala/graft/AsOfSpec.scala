package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 09:00:00"), 100.0),
    (1L, ts("2024-01-01 10:00:00"), 110.0),
    (1L, ts("2024-01-01 11:00:00"), 105.0),
    (2L, ts("2024-01-01 09:30:00"), 50.0)
  ).toDF("key", "qts", "price")

  private val trades = Seq(
    (10L, 1L, ts("2024-01-01 08:59:00")), // before any quote → NULL
    (11L, 1L, ts("2024-01-01 10:00:00")), // exact tie → matches 10:00
    (12L, 1L, ts("2024-01-01 10:30:00")), // between → 10:00
    (13L, 2L, ts("2024-01-01 12:00:00")), // other key → 09:30
    (14L, 3L, ts("2024-01-01 12:00:00"))  // key with no quotes → NULL
  ).toDF("trade_id", "key", "tts")

  test("asofJoin attaches the latest right row at or before each left ts") {
    val out = AsOf.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[Timestamp]("asof_ts")), Option(r.getAs[Any]("price")))).toMap
    assert(out(10L) == (None, None))
    assert(out(11L) == (Some(ts("2024-01-01 10:00:00")), Some(110.0)))
    assert(out(12L) == (Some(ts("2024-01-01 10:00:00")), Some(110.0)))
    assert(out(13L) == (Some(ts("2024-01-01 09:30:00")), Some(50.0)))
    assert(out(14L) == (None, None))
    assert(out.size == 5)
  }

  test("a NULL inside a matched payload does not leak an older value") {
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option(1.0)),
      (1L, ts("2024-01-01 10:00:00"), Option.empty[Double])
    ).toDF("key", "qts", "price")
    val left = Seq((20L, 1L, ts("2024-01-01 10:30:00"))).toDF("trade_id", "key", "tts")
    val row = AsOf.asofJoin(left, right, Seq("key"), "tts", "qts", Seq("price"))
      .collect().head
    assert(row.getAs[Timestamp]("asof_ts") == ts("2024-01-01 10:00:00"))
    assert(row.isNullAt(row.fieldIndex("price")), "matched row's own NULL must win")
  }

  test("NULL keys and NULL timestamps never match, as in SQL ASOF JOIN") {
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), 100.0),
      (Option(1L), Option.empty[Timestamp], 666.0),  // NULL ts: matches nothing
      (Option.empty[Long], Option(ts("2024-01-01 09:00:00")), 777.0) // NULL key
    ).toDF("key", "qts", "price")
    val left = Seq(
      (30L, Option(1L), Option(ts("2024-01-01 10:00:00"))), // → 09:00 quote
      (31L, Option(1L), Option.empty[Timestamp]),           // NULL left ts → NULL
      (32L, Option.empty[Long], Option(ts("2024-01-01 10:00:00"))) // NULL key → NULL
    ).toDF("trade_id", "key", "tts")
    val out = AsOf.asofJoin(left, right, Seq("key"), "tts", "qts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("price"))).toMap
    assert(out(30L) == Some(100.0), "the NULL-ts right row must not shadow the real quote")
    assert(out(31L).isEmpty)
    assert(out(32L).isEmpty)
    assert(out.size == 3)
  }

  test("reserved column names and empty payload are rejected") {
    intercept[IllegalArgumentException](
      AsOf.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq.empty))
    intercept[IllegalArgumentException](
      AsOf.asofJoin(trades.withColumnRenamed("trade_id", "__side"), quotes,
        Seq("key"), "tts", "qts", Seq("price")))
  }
}
