package graft

import graft.operators.{Curate, Graph}

class GraphSpec extends SparkSpec {
  import sqlImplicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Curate.release(df)
    m
  }

  test("pageRank: hand-computed rounds on a 4-node graph (dangling + isolated nodes)") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    // round 1: inflow 0←2:1000000, 1←0:500000, 2←0,1:1500000
    assert(ranksOf(Graph.pageRank(edges, nodes, "id", "src", "dst", 1)) ==
      Map(0L -> 1000000L, 1L -> 575000L, 2L -> 1425000L, 3L -> 150000L))
    // round 2: inflow 0←2:1425000, 1←0:500000, 2←0:500000 + 1:575000
    assert(ranksOf(Graph.pageRank(edges, nodes, "id", "src", "dst", 2)) ==
      Map(0L -> 1361250L, 1L -> 575000L, 2L -> 1063750L, 3L -> 150000L))
    // zero rounds = the uniform init
    assert(ranksOf(Graph.pageRank(edges, nodes, "id", "src", "dst", 0)) ==
      Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: parallel edges carry multiplicity through outdeg and inflow") {
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L)).toDF("src", "dst")
    // outdeg(0)=3 → share 333333; node 1 gets it twice
    assert(ranksOf(Graph.pageRank(edges, nodes, "id", "src", "dst", 1)) ==
      Map(0L -> 150000L, 1L -> 716666L, 2L -> 433333L))
  }

  test("pageRank: empty edge set leaves every node at pure teleport mass") {
    val nodes = Seq(7L, 8L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ranksOf(Graph.pageRank(edges, nodes, "id", "src", "dst", 3)) ==
      Map(7L -> 150000L, 8L -> 150000L))
  }
}
