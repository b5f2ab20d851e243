package graft

import java.nio.file.Files

import graft.sources.Warehouse

class WarehouseSpec extends SparkSpec {
  import sqlImplicits._

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
