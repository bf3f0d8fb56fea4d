package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on the lake layout: a corpus written over months grows
  * columns, and readers must see one merged schema with nulls where old
  * files predate a column — Spark's parquet mergeSchema contract. At 100 TB
  * rewriting history for every added column is a non-starter; this pins the
  * read-side behavior the engine depends on instead.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions generations; old files read new columns as null") {
    val dir = java.nio.file.Files.createTempDirectory("evo_docs").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir)))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    // generation 1: the original schema
    docs.filter(col("doc_id") < 250)
      .select("doc_id", "text", "lang")
      .write.parquet(s"$dir/gen=1")
    // generation 2: a quality column added later
    docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text"), col("lang"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "quality", "gen"))
    assert(merged.count() == docs.count())
    // old generation: the added column is null, not an error
    assert(merged.filter(col("gen") === 1 && col("quality").isNotNull).count() == 0)
    assert(merged.filter(col("gen") === 2 && col("quality").isNull).count() == 0)
    // and aggregation over the merged frame skips the nulls (SQL semantics)
    val avgQ = merged.agg(avg("quality")).head.getDouble(0)
    val expected = docs.filter(col("doc_id") >= 250)
      .agg(avg(graft.functions.TextFunctions.qualityScore(col("text"))))
      .head.getDouble(0)
    assert(math.abs(avgQ - expected) < 1e-12)
  }
}
