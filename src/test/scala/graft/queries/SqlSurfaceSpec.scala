package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SQL front-end is part of the declared API surface (`spark.sql(...)`,
  * SURVEY §2.B): a user writing ANSI SQL over registered views must get the
  * DataFrame catalog's answers, and the engine's native expressions must be
  * callable from SQL by name. Pinned here: a windowed top-k, a decimal-
  * exact aggregate, and the codegen'd `vec_dot` kernel — each compared
  * row-for-row against its DataFrame twin in the same session.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("SQL windowed top-k equals the DataFrame form") {
    spark.read.parquet(s"$sf001/orders.parquet").createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey, row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders_v) WHERE rn <= 3""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = spark.read.parquet(s"$sf001/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sql == df)
  }

  test("SQL decimal aggregate equals the DataFrame form") {
    spark.read.parquet(s"$sf001/lineitem.parquet").createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS q
         FROM lineitem_v GROUP BY 1 ORDER BY 1""").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val df = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("q"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(sql == df)
  }

  test("the native vec_dot expression is callable from SQL") {
    spark.read.parquet(s"$sf001/embeddings.parquet").createOrReplaceTempView("emb_v")
    val sql = spark.sql(
      """SELECT vec_id, round(vec_dot(embedding, embedding), 4) AS d
         FROM emb_v ORDER BY vec_id LIMIT 20""").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"),
        round(aggregate(col("embedding"),
          lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("d"))
      .orderBy("vec_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == df)
  }
}
