package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinHashSig (native kernel) vs the staged HOF pipeline: bit-identical
  * signatures on the real corpus — the property that keeps the dedup
  * oracles green after the swap.
  */
class MinHashSigSpec extends SparkSpec {
  import TextFunctions._

  test("native signature equals the HOF pipeline on every document") {
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        minhashSigFast(col("text"), 5, 8).as("fast"),
        array((0 until 8).map(
          minhash(shingles(tokens(col("text")), 5), _)): _*).as("hof"))
    assert(d.filter(col("fast") =!= col("hof")).isEmpty)
    assert(d.count() == 500)
  }

  test("edge cases: empty-ish and short docs match the HOF form") {
    import spark.implicits._
    val d = Seq("", "   ", "one", "one two three", "a  b\tc\nd e f g")
      .toDF("text")
      .select(
        minhashSigFast(col("text"), 5, 8).as("fast"),
        array((0 until 8).map(
          minhash(shingles(tokens(col("text")), 5), _)): _*).as("hof"))
    assert(d.filter(col("fast") =!= col("hof")).isEmpty)
  }

  test("null text yields null signature") {
    import spark.implicits._
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(minhashSigFast(col("text"), 5, 8).as("fast"))
      .head()
    assert(r.isNullAt(0))
  }
}
