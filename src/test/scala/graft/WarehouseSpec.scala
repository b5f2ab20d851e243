package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.Warehouse

class WarehouseSpec extends SparkSpec {
  import sqlImplicits._

  test("bucketed tables join with no shuffle exchange") {
    val base = Files.createTempDirectory("graft-bkt").toString
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey")
    Warehouse.writeBucketed(l, "graft_bkt_l", s"$base/l", Seq("l_orderkey"), 4)
    Warehouse.writeBucketed(o, "graft_bkt_o", s"$base/o", Seq("o_orderkey"), 4)
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcastKey)
    try {
      spark.conf.set(bcastKey, "-1") // force the sort-merge path
      val joined = spark.table("graft_bkt_l")
        .join(spark.table("graft_bkt_o"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == l.count())
    } finally {
      spark.conf.set(bcastKey, prev)
      Warehouse.dropTable(spark, "graft_bkt_l")
      Warehouse.dropTable(spark, "graft_bkt_o")
    }
  }

  test("ensureTable registers an external parquet table, idempotently") {
    val path = Files.createTempDirectory("graft-wh").toString + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(path)
    val schema = spark.read.parquet(path).schema
    Warehouse.ensureTable(spark, "graft_wh_t", path, schema)
    assert(spark.table("graft_wh_t").count() == 2L)
    // second create is a no-op, as in the reference's object-id probe
    Warehouse.ensureTable(spark, "graft_wh_t", path, schema)
    assert(Warehouse.tableCounts(spark, Seq("graft_wh_t")) == Map("graft_wh_t" -> 2L))
    // drop removes only metadata; the parquet files survive
    Warehouse.dropTable(spark, "graft_wh_t")
    assert(spark.catalog.tableExists("graft_wh_t") == false)
    assert(spark.read.parquet(path).count() == 2L)
    Warehouse.dropTable(spark, "graft_wh_t") // idempotent
  }
}
