package graft.model

import org.apache.spark.sql.types._

/** Declared ingest schemas for the sales entities — the reference pins
  * exact column allowlists at load time (etl_sales_analytics.py:312-319)
  * and the DDL fixes the at-rest types (schema_sales_analytics.sql:30-90).
  *
  * In-flight we use DECIMAL(18,2) for money (stricter than the reference's
  * float64-in-flight, matching its DDL — SURVEY.md §7.5) and TimestampType
  * for DATETIME2.
  */
object Schemas {
  val customer: StructType = StructType(Seq(
    StructField("CustomerID", IntegerType),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("Email", StringType),
    StructField("Phone", StringType),
    StructField("City", StringType),
    StructField("Country", StringType)))

  val product: StructType = StructType(Seq(
    StructField("ProductID", IntegerType),
    StructField("ProductName", StringType),
    StructField("Category", StringType),
    StructField("Price", DecimalType(18, 2)),
    StructField("Stock", IntegerType)))

  val orders: StructType = StructType(Seq(
    StructField("OrderID", IntegerType),
    StructField("CustomerID", IntegerType),
    StructField("OrderDate", TimestampType),
    StructField("Status", StringType)))

  val orderDetail: StructType = StructType(Seq(
    StructField("OrderID", IntegerType),
    StructField("ProductID", IntegerType),
    StructField("Quantity", IntegerType),
    StructField("TotalPrice", DecimalType(18, 2))))

  /** Primary keys per entity (schema_sales_analytics.sql:38,51,65,84). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "customer" -> Seq("CustomerID"),
    "product" -> Seq("ProductID"),
    "orders" -> Seq("OrderID"),
    "order_details" -> Seq("OrderID", "ProductID"))
}
