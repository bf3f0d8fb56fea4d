package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SimHashSig (native kernel) vs the HOF pipeline: bit-identical packed
  * signatures on the real corpus — the property that keeps the simhash
  * oracles green after the swap.
  */
class SimHashSigSpec extends SparkSpec {
  import TextFunctions._

  test("native 16- and 32-bit signatures equal the HOF form on every document") {
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        simhashFast(col("text"), 16).as("f16"),
        simhash(tokens(col("text")), 16).as("h16"),
        simhashFast(col("text"), 32).as("f32"),
        simhash(tokens(col("text")), 32).as("h32"))
    assert(d.filter(col("f16") =!= col("h16") || col("f32") =!= col("h32")).isEmpty)
    assert(d.count() == 500)
  }

  test("edge cases: empty-ish, single-token, and whitespace-heavy text match") {
    import spark.implicits._
    val d = Seq("", "   ", "one", "a  b\tc\nd e f g", "x x x y")
      .toDF("text")
      .select(
        simhashFast(col("text"), 63).as("fast"),
        simhash(tokens(col("text")), 63).as("hof"))
    assert(d.filter(col("fast") =!= col("hof")).isEmpty)
  }

  test("null text yields null signature") {
    import spark.implicits._
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(simhashFast(col("text"), 16).as("fast"))
      .head()
    assert(r.isNullAt(0))
  }
}
