package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the text/vector primitives used by the LLM-pipeline
  * queries (SURVEY.md §2.B-LLM).
  */
class TextVectorSpec extends SparkSpec {

  private def evalOn[T](text: String, c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("tokens lowercases and splits on whitespace runs") {
    assert(evalOn[scala.collection.Seq[String]]("  Hello   WORLD\tfoo ",
      TextFunctions.tokens(col("text"))) == Seq("hello", "world", "foo"))
  }

  test("shingles produce n-grams; short docs collapse to one shingle") {
    val sh = TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)
    assert(evalOn[scala.collection.Seq[String]]("a b c d", sh) == Seq("a b c", "b c d"))
    assert(evalOn[scala.collection.Seq[String]]("a b", sh) == Seq("a b"))
  }

  test("minhash signature is deterministic and order-insensitive across docs") {
    val sh = TextFunctions.shingles(TextFunctions.tokens(col("text")), 2)
    val sig = TextFunctions.minhashSignature(sh, 4)
    val a = evalOn[String]("x y z w", sig)
    val b = evalOn[String]("x y z w", sig)
    assert(a == b)
    assert(a.split("\\|").length == 4)
  }

  test("langId picks the stopword-richest language, und when none hit") {
    val lid = TextFunctions.langId(TextFunctions.tokens(col("text")))
    assert(evalOn[String]("the table of data and the", lid) == "en")
    assert(evalOn[String]("zzz qqq www", lid) == "und")
  }

  test("cosine similarity: identical=1, orthogonal=0, zero-norm=0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val got = df.select(round(VectorFunctions.cosineSimilarity(col("a"), col("b")), 6).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0, 0.0))
  }

  test("hamming distance counts differing simhash bits") {
    import spark.implicits._
    val got = Seq((5L, 6L)).toDF("a", "b")
      .select(TextFunctions.hammingDistance(col("a"), col("b")).as("h"))
      .collect()(0).getAs[Number]("h").intValue()
    assert(got == 2) // 101 vs 110
  }

  test("IVF k-means: k cells, every vector assigned, centroids are real means") {
    import spark.implicits._
    // 3 obvious clusters on the axes of R^3
    val vecs = (0 until 30).map { i =>
      val base = Array(0f, 0f, 0f)
      base(i % 3) = 10f + (i / 3).toFloat * 0.1f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val centroids = graft.functions.VectorIndex.kmeansCentroids(spark, vecs, k = 3, iters = 3)
    assert(centroids.count() == 3)
    val cells = graft.functions.VectorIndex.assignCells(vecs, centroids)
    assert(cells.count() == 30)
    // cosine clustering on axis-aligned vectors must recover the 3 axes:
    // every cell has exactly 10 members
    val sizes = cells.groupBy("cell").count().collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq == Seq(10L, 10L, 10L))
    // deterministic: same inputs → same assignment
    val again = graft.functions.VectorIndex.assignCells(vecs,
      graft.functions.VectorIndex.kmeansCentroids(spark, vecs, k = 3, iters = 3))
    assert(cells.select("vec_id", "cell").except(again.select("vec_id", "cell")).count() == 0)
  }

  test("multimodal decode stub is deterministic with real partition plumbing") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val docs = Seq((1L, "hello"), (2L, "a longer document body")).toDF("doc_id", "text")
    val metas = Multimodal.decodeMeta(docs).collect().sortBy(_.doc_id)
    assert(metas(0).n_bytes == 5)
    assert(metas(0).width == 325 && metas(0).height == 245)
    assert(metas(0).format == "webp") // 5 % 3 == 2
    assert(Multimodal.sampleFrames(metas(0), 2).nonEmpty)
  }
}
