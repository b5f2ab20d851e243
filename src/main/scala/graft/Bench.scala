package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Absorb one-time costs (janino/codegen init, parquet footer reader,
    // shuffle service, localCheckpoint block-manager setup) before timing
    // — the first measured query otherwise carries ~5 s of JVM warmup
    // that is not its own. Touch every table family: the query list is
    // timed in sorted order, so whichever name sorts first would absorb
    // the warmup of its whole input family (measured ~3 s on the first
    // doc_* query).
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      SparkEntry.entry(spark).count()
      graft.model.Tables.documents(spark, sfDir).count()
      graft.model.Tables.embeddings(spark, sfDir).count()
      graft.model.Tables.events(spark, sfDir).count()
      spark.range(10).localCheckpoint(true).count()
    } catch { case _: Throwable => () }
    // A failing query must be VISIBLE: it is timed, but its error lands
    // in an "errors" map instead of silently reporting a fast run.
    // Sorted-key order: hash-map order changes as the query map grows,
    // which confounds round-over-round per-query deltas with warmup /
    // cache position. Sorted order is stable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
