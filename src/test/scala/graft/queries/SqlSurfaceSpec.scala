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

  test("correlated EXISTS decorrelates to a semi join and matches the DataFrame form") {
    spark.read.parquet(s"$sf001/customer.parquet").createOrReplaceTempView("customer_v")
    spark.read.parquet(s"$sf001/orders.parquet").createOrReplaceTempView("orders_sq")
    val q = spark.sql(
      """SELECT c_custkey FROM customer_v c
         WHERE EXISTS (SELECT 1 FROM orders_sq o
                       WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""")
    assert(q.queryExecution.executedPlan.toString.contains("LeftSemi"),
      q.queryExecution.executedPlan.toString)
    val sqlKeys = q.collect().map(_.getLong(0)).toSet
    val dfKeys = spark.read.parquet(s"$sf001/customer.parquet")
      .join(
        spark.read.parquet(s"$sf001/orders.parquet")
          .filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(sqlKeys == dfKeys && sqlKeys.nonEmpty)
  }

  test("correlated NOT EXISTS decorrelates to an anti join and matches the DataFrame form") {
    spark.read.parquet(s"$sf001/customer.parquet").createOrReplaceTempView("customer_v")
    spark.read.parquet(s"$sf001/orders.parquet").createOrReplaceTempView("orders_sq")
    val q = spark.sql(
      """SELECT c_custkey FROM customer_v c
         WHERE NOT EXISTS (SELECT 1 FROM orders_sq o WHERE o.o_custkey = c.c_custkey)""")
    assert(q.queryExecution.executedPlan.toString.contains("LeftAnti"),
      q.queryExecution.executedPlan.toString)
    val sqlKeys = q.collect().map(_.getLong(0)).toSet
    val dfKeys = spark.read.parquet(s"$sf001/customer.parquet")
      .join(spark.read.parquet(s"$sf001/orders.parquet"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .collect().map(_.getAs[Long]("c_custkey")).toSet
    assert(sqlKeys == dfKeys)
  }

  test("scalar subquery in a predicate matches the DataFrame form") {
    spark.read.parquet(s"$sf001/orders.parquet").createOrReplaceTempView("orders_sq")
    val sqlKeys = spark.sql(
      """SELECT o_orderkey FROM orders_sq
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_sq)""")
      .collect().map(_.getLong(0)).toSet
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val mean = o.agg(avg("o_totalprice")).head.getDouble(0)
    val dfKeys = o.filter(col("o_totalprice") > mean)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    assert(sqlKeys == dfKeys && sqlKeys.nonEmpty)
  }

  test("LATERAL VIEW explode matches the DataFrame generator form") {
    spark.read.parquet(s"$sf001/documents.parquet").createOrReplaceTempView("docs_v")
    val sqlRows = spark.sql(
      """SELECT doc_id, tok FROM docs_v
         LATERAL VIEW explode(split(lower(trim(text)), '\\s+')) t AS tok
         WHERE doc_id < 5""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val dfRows = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(sqlRows == dfRows && sqlRows.nonEmpty)
  }

  test("LATERAL correlated derived tables match the window form") {
    spark.read.parquet(s"$sf001/orders.parquet").createOrReplaceTempView("orders_sq")
    // per customer: their single most expensive order, via JOIN LATERAL
    val sqlRows = spark.sql(
      """SELECT c.o_custkey, t.o_orderkey FROM
           (SELECT DISTINCT o_custkey FROM orders_sq) c,
           LATERAL (SELECT o_orderkey FROM orders_sq o
                    WHERE o.o_custkey = c.o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val dfRows = spark.read.parquet(s"$sf001/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"))).toSet
    assert(sqlRows == dfRows && sqlRows.nonEmpty)
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

  test("the native signature kernels are callable from SQL and match the DataFrame forms") {
    import graft.functions.TextFunctions
    import graft.functions.VectorFunctions
    spark.read.parquet(s"$sf001/documents.parquet").createOrReplaceTempView("docs_v")
    spark.read.parquet(s"$sf001/embeddings.parquet").createOrReplaceTempView("emb_v")
    val sqlSim = spark.sql(
      "SELECT doc_id, simhash_sig(text, 16) AS s FROM docs_v ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dfSim = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFunctions.simhashFast(col("text"), 16).as("s"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlSim == dfSim && sqlSim.nonEmpty)
    val sqlMin = spark.sql(
      "SELECT doc_id, minhash_sig(text, 3, 4) AS m FROM docs_v ORDER BY doc_id LIMIT 50")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    val dfMin = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFunctions.minhashSigFast(col("text"), 3, 4).as("m"))
      .orderBy("doc_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    assert(sqlMin == dfMin)
    val sqlLsh = spark.sql(
      "SELECT vec_id, hyperplane_sigs(embedding, 4, 8) AS h FROM emb_v ORDER BY vec_id LIMIT 50")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val dfLsh = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id"),
        VectorFunctions.lshSignatures(col("embedding"), bits = 4, tables = 8).as("h"))
      .orderBy("vec_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(sqlLsh == dfLsh)
    // kernel parameters are plan-time constants, not per-row values
    val e = intercept[Exception](
      spark.sql("SELECT simhash_sig(text, CAST(n_chars AS INT)) FROM docs_v").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("literal"))))
  }
}
