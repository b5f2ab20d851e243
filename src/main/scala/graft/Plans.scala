package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture tool (optimization-round deliverable): writes
  * `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt`. With SPARK_GRAFT_PLANS_EXEC=1 the query
  * is executed first (noop count) so AdaptiveSparkPlan prints its FINAL
  * plan — join strategies and AQE reads as actually chosen, not the
  * static guess.
  *
  * Usage: Plans <outDir> <tag> <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PLANS_EXEC. */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plans <outDir> <tag> <query> [query...]")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val exec = sys.env.get("SPARK_GRAFT_PLANS_EXEC").contains("1")
    Files.createDirectories(outDir)
    val spark = Bench.buildSession(cpus)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      if (exec) df.count()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"), plan.getBytes(UTF_8))
      graft.operators.Curate.release(df)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.err.println(s"[plans] wrote ${name}_$tag.txt")
    }
    spark.stop()
  }
}
