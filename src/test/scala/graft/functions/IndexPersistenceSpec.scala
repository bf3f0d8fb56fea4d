package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build-once / serve-many for the vector indexes: at 100 TB the quantizer
  * is TRAINED in one job, PERSISTED as tables (codebooks: m·k rows; codes:
  * m small ints per vector), and every query thereafter reads the compact
  * artifacts — nothing retrains on the query path. q_sim_topk_pq builds
  * inline because catalog queries are self-contained; this spec pins the
  * production split: the persisted artifacts round-trip exactly, and ADC
  * scores computed from the LOADED tables equal scores from the freshly
  * trained ones bit-for-bit (training is deterministic, so the persisted
  * index IS the index).
  */
class IndexPersistenceSpec extends SparkSpec {

  private val m = 8; private val kcb = 16; private val dim = 64

  /** ADC estimate per (q_id, vec_id) from codes + codebooks + query subvecs. */
  private def adc(codes: DataFrame, books: DataFrame, qsv: DataFrame): Set[(Long, Long, Long)] = {
    val lut = qsv.join(broadcast(books), "sub")
      .select(col("q_id"), col("sub"), col("cell"),
        aggregate(zip_with(col("subvec"), col("centroid"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("pdot"))
    codes.as("c").join(broadcast(lut.as("l")),
        col("c.sub") === col("l.sub") && col("c.code") === col("l.cell"))
      .groupBy("q_id", "vec_id")
      .agg(round(sum(col("pdot")) * 1e6).cast("long").as("e6"))
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("e6")))
      .toSet
  }

  test("persisted PQ codebooks and codes serve identically to the trained ones") {
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir)))
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding")
    val sv = VectorIndex.subvectors(e, m, dim).localCheckpoint()
    val books = VectorIndex.pqCodebooks(spark, sv, m, kcb, iters = 2)
    val codes = VectorIndex.pqEncode(sv, books)
    // persist the index artifacts — the only thing a serving job needs
    books.write.parquet(s"$dir/books")
    codes.write.parquet(s"$dir/codes")
    val loadedBooks = spark.read.parquet(s"$dir/books")
    val loadedCodes = spark.read.parquet(s"$dir/codes")
    // artifacts round-trip exactly
    assert(loadedBooks.count() == m * kcb)
    assert(loadedCodes.count() == e.count() * m)
    val codeSet = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val loadedSet = loadedCodes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(codeSet == loadedSet)
    // and the serve path from the loaded tables scores identically
    val qsv = sv.filter(col("vec_id") < 5).withColumnRenamed("vec_id", "q_id")
    assert(adc(loadedCodes, loadedBooks, qsv) == adc(codes, books, qsv))
  }
}
