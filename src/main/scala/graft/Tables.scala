package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst handles column pruning and
  * predicate pushdown, so every query in the catalog reads only the columns
  * and row groups it needs. The one wrinkle is `events.ts`, written as
  * parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * outright; we read it as a long (legacy conf) and truncate to microsecond
  * precision, which is also what DuckDB does on its side of the oracle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(path(dir, name))
    }
  }

  /** events.ts is TIMESTAMP(NANOS); Spark has no nanosecond timestamp type,
    * so read it as nanos-since-epoch long and floor-divide to microseconds
    * (matching DuckDB's ns→us truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
