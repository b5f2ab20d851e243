package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DocQueries, EtlQueries, EventQueries, OlapQueries, SalesQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 inventory plus
  * the large-scale pipeline operators) to a DataFrame builder over a
  * testdata scale-factor dir; `oracleSql` carries the DuckDB-equivalent
  * ANSI SQL for the hash-compare gate. Column names/aliases match between
  * the two by construction.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SalesQueries.q03SalesByDay(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline surface (docs, embeddings, events). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SalesQueries.all ++ EtlQueries.all ++ OlapQueries.all ++
      DocQueries.all ++ VectorQueries.all ++ EventQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    SalesQueries.oracle ++ EtlQueries.oracle ++ OlapQueries.oracle ++
      DocQueries.oracle ++ VectorQueries.oracle ++ EventQueries.oracle
}
