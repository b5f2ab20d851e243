package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bench harness isolation: the r12 driver sf1 rerun showed one query's
  * SparkException (executor OOM stops the whole local context) cascading
  * into IllegalStateException on the next three queries. These tests
  * force that failure shape — a query that stops the SparkContext and
  * then fails — and assert the harness records the error, hands every
  * subsequent sample a fresh live session, and re-runs the warmup on it. */
class BenchSpec extends AnyFunSuite {

  private def newSession(): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bench-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // The forced failure: stop the context (what an executor OOM does in
  // local mode), then return a frame whose count() throws on the corpse.
  private val killer: (SparkSession, String) => DataFrame =
    (s, _) => { s.sparkContext.stop(); s.range(5).toDF() }
  private val healthy: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF()

  test("a context-killing query is recorded, the next query still runs") {
    var warms = 0
    val samples = Bench.runSamples(
      Seq("a_kill" -> killer, "b_ok" -> healthy),
      sfDir = "", runsFor = _ => 1, trace = false,
      newSession = () => newSession(), warm = _ => warms += 1)
    assert(samples.map(_.name) == Seq("a_kill", "b_ok"))
    assert(samples.head.err.isDefined, "the killer must surface its error")
    assert(samples(1).err.isEmpty,
      s"the query after the kill must succeed, got ${samples(1).err}")
    // initial session + one replacement, each warmed exactly once
    assert(warms == 2)
    // don't leave a live local[2] context for the shared SparkSpec.session
    // to getOrCreate-reuse — stop it and let the guard rebuild local[4]
    SparkSession.getActiveSession.foreach(_.stop())
    assert(!SparkSpec.session.sparkContext.isStopped)
  }

  test("repeated kills across passes re-isolate every time") {
    val samples = Bench.runSamples(
      Seq("a_kill" -> killer, "b_ok" -> healthy),
      sfDir = "", runsFor = _ => 2, trace = false,
      newSession = () => newSession())
    val byPass = samples.groupBy(_.pass)
    (1 to 2).foreach { p =>
      val Seq(k, ok) = byPass(p).sortBy(_.name)
      assert(k.err.isDefined, s"pass $p killer error missing")
      assert(ok.err.isEmpty, s"pass $p healthy query poisoned: ${ok.err}")
    }
    SparkSession.getActiveSession.foreach(_.stop())
    assert(!SparkSpec.session.sparkContext.isStopped)
  }
}
