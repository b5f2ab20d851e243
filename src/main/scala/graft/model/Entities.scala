package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed views of the sales entities — SURVEY.md §1.4's Dataset[T]
  * convenience layer over the DataFrame surface. Every field is Option
  * because the reference's in-flight types are all nullable (pandas
  * Int64/string/datetime64 with coerce-to-NULL); money is Double here
  * for ergonomic typed code — the DataFrame pipeline remains the
  * DECIMAL(18,2)-exact path of record.
  */
object Entities {

  case class Customer(CustomerID: Option[Int], FirstName: Option[String],
      LastName: Option[String], Email: Option[String], Phone: Option[String],
      City: Option[String], Country: Option[String])

  case class Product(ProductID: Option[Int], ProductName: Option[String],
      Category: Option[String], Price: Option[Double], Stock: Option[Int])

  case class Order(OrderID: Option[Int], CustomerID: Option[Int],
      OrderDate: Option[java.sql.Timestamp], Status: Option[String])

  case class OrderDetail(OrderID: Option[Int], ProductID: Option[Int],
      Quantity: Option[Int], TotalPrice: Option[Double])

  /** DataFrame → typed Dataset (decimal money relaxed to double for the
    * case-class encoder; column set must match the entity schema). */
  def customers(df: DataFrame): Dataset[Customer] = {
    val spark = df.sparkSession; import spark.implicits._
    df.as[Customer]
  }
  def products(df: DataFrame): Dataset[Product] = {
    val spark = df.sparkSession; import spark.implicits._
    df.withColumn("Price", df("Price").cast("double")).as[Product]
  }
  def orders(df: DataFrame): Dataset[Order] = {
    val spark = df.sparkSession; import spark.implicits._
    df.as[Order]
  }
  def orderDetails(df: DataFrame): Dataset[OrderDetail] = {
    val spark = df.sparkSession; import spark.implicits._
    df.withColumn("TotalPrice", df("TotalPrice").cast("double")).as[OrderDetail]
  }

  /** Typed loaders straight from the reference-layout CSV directory. */
  def loadCustomers(spark: SparkSession, dataDir: String): Dataset[Customer] =
    customers(graft.sources.CsvExtract.loadCsvExact(
      spark, s"$dataDir/customers.csv", Schemas.customer))
  def loadOrders(spark: SparkSession, dataDir: String): Dataset[Order] =
    orders(graft.sources.CsvExtract.loadCsvExact(
      spark, s"$dataDir/orders.csv", Schemas.orders))
}
