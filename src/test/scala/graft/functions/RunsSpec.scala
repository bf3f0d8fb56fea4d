package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge contracts of the shared [[TextFunctions.runs]] run-length helper
  * (ADVICE r18): empty and null inputs short-circuit to null instead of
  * crashing on sequence(1, 0) / element_at(_, 0); a null element forms its
  * own run instead of silently merging into its neighbor's count; and the
  * guarded form is value-identical to the explode → groupBy histogram on
  * ordinary sorted token arrays.
  */
class RunsSpec extends SparkSpec {
  import spark.implicits._

  private def runsOf(arr: Seq[String]): Seq[(String, Long)] = {
    val df = Seq(Tuple1(arr)).toDF("raw")
      .select(array_sort(col("raw")).as("srt"))
      .select(explode(TextFunctions.runs(col("srt"))).as("r"))
      .select(col("r.v"), col("r.n"))
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("ordinary arrays: run lengths equal the exploded histogram") {
    assert(runsOf(Seq("b", "a", "b", "c", "a", "b")) ==
      Seq(("a", 2L), ("b", 3L), ("c", 1L)))
    assert(runsOf(Seq("x")) == Seq(("x", 1L)))
  }

  test("empty array yields null (explode consumers skip the row), not an error") {
    val out = Seq(Tuple1(Seq.empty[String])).toDF("srt")
      .select(TextFunctions.runs(col("srt")).as("r"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(0))
    // and under explode the row simply vanishes — the old explode→groupBy
    // behavior for a document with no tokens
    val exploded = Seq(Tuple1(Seq.empty[String])).toDF("srt")
      .select(explode(TextFunctions.runs(col("srt"))).as("r"))
    assert(exploded.count() == 0)
  }

  test("null array yields null, not an error") {
    val out = Seq(Tuple1(null: Seq[String])).toDF("srt")
      .select(TextFunctions.runs(col("srt")).as("r"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(0))
  }

  test("a null element is its own run, not merged into a neighbor") {
    // sorted order puts nulls last in array_sort; build the array directly
    // (already 'sorted' by the helper's precondition) with a trailing null
    val df = Seq(Tuple1(Seq("a", "a", null))).toDF("srt")
      .select(explode(TextFunctions.runs(col("srt"))).as("r"))
      .select(col("r.v"), col("r.n"))
    val rows = df.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(rows.contains((Some("a"), 2L)))
    assert(rows.contains((None, 1L)))
  }
}
