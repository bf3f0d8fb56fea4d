package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TokenPrefix]] must be value-identical to the staged Column pipeline
  * it replaces in q_dedup_jaccard — explode → broadcast df join →
  * row_number/count windows → prefix filter — token for token on the real
  * corpus (the MinHashSig/HyperplaneSigs escalation contract: a native
  * kernel earns its place only with bit-for-bit parity against the HOF
  * form).
  */
class TokenPrefixSpec extends SparkSpec {

  private val t = 0.6

  private def docs = {
    graft.Tables.documents(spark, sf001).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
      .localCheckpoint()
  }

  test("kernel prefix == window-form prefix, token for token, on the real corpus") {
    val d = docs
    val dfsMap = d.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap

    // the window form the kernel replaces (TextQueries pre-round-7 shape)
    val te = d.select(col("doc_id"), explode(col("toks")).as("token"))
    val dfs = te.groupBy("token").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id")
    val windowForm = te.join(broadcast(dfs), "token")
      .withColumn("pos", row_number().over(wDoc.orderBy("df", "token")))
      .withColumn("sz", count(lit(1)).over(wDoc))
      .filter(col("pos") <= col("sz") - ceil(col("sz") * t) + 1)
      .orderBy("doc_id", "pos")
      .select("doc_id", "token").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq).toMap

    val kernelForm = d.select(col("doc_id"),
        tokenPrefix(col("toks"), dfsMap, t).as("pfx"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    assert(kernelForm.keySet == windowForm.keySet)
    assert(windowForm.nonEmpty)
    windowForm.foreach { case (doc, pfxTokens) =>
      // the kernel emits the prefix already in (df, token) order — the
      // exact order the window's row_number saw
      assert(kernelForm(doc) == pfxTokens,
        s"doc $doc: kernel ${kernelForm(doc)} != window $pfxTokens")
    }
  }

  test("null element nulls the row; unknown tokens sort last; empty array allowed") {
    import spark.implicits._
    val dfs = Map("rare" -> 1L, "mid" -> 5L, "hot" -> 100L)
    val rows = Seq(
      (1L, Seq("hot", "rare", "mid")),        // prefix len 3-2+1=2 → rare, mid
      (2L, Seq("zzz", "rare")),               // unknown zzz sorts last → rare (len 1... 2-2+1=1)
      (3L, Seq.empty[String]))
      .toDF("id", "toks")
      .select(col("id"), tokenPrefix(col("toks"), dfs, 0.6).as("pfx"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(rows(1L).get == Seq("rare", "mid"))
    assert(rows(2L).get == Seq("rare"))
    assert(rows(3L).get == Seq.empty)

    val withNull = Seq((1L, Seq[String]("a", null)))
      .toDF("id", "toks")
      .select(tokenPrefix(col("toks"), dfs, 0.6).as("pfx"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("SQL-reachable: token_prefix(toks, map literal, threshold)") {
    GraftExpressions.register(spark)
    val out = spark.sql(
      """SELECT token_prefix(array('hot', 'rare'),
        |  map('rare', 1, 'hot', 100), 0.6) AS pfx""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(out == Seq("rare"))
  }
}
