package graft.pipeline

import graft.queries.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Epoch-committed tenant → allowlist registry — the provisioning state
  * behind [[WalkServe.startTenantsDynamic]]. Each committed epoch is one
  * FULL snapshot of the fleet's (tenant, vec_id) allowlist pairs under
  * the engine's standard [[EpochStore]] dir-commit discipline (data dir
  * first, marker last; orphans above the committed epoch roll back on
  * the next verb), so a reader — the serving loop — picks up a
  * provision/revoke with ONE listing per batch and can never observe a
  * half-written registry. Full snapshots, not deltas: a registry is
  * allowlist-sized (thousands-to-millions of scalar pairs, not corpus
  * rows) and provisioning events are rare beside query batches, so the
  * snapshot write is the cheap, replay-trivial shape — the same call the
  * reference's config reload makes (one authoritative state, swapped
  * atomically), expressed as a store.
  *
  * SINGLE WRITER per registry dir (the engine-wide store contract): two
  * concurrent provisions would race the same next epoch dir.
  */
object TenantRegistry {

  import EpochStore.{CommitMarker, clearDirsAbove, dirEpoch, fsOf}

  private def epDir(dir: String, e: Int) = s"$dir/e$e"

  /** Committed registry epoch; −1 before the first commit (a never-
    * provisioned registry is a valid empty fleet, not an error — the
    * serving loop fails closed on it).
    */
  def epochOf(spark: SparkSession, dir: String): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(root)) -1
    else {
      val es = fs.listStatus(root).map(_.getPath)
        .filter(p =>
          fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)))
        .flatMap(p => dirEpoch(p.getName))
      if (es.isEmpty) -1 else es.max
    }
  }

  /** The committed snapshot's (tenant, vec_id) pairs. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val e = epochOf(spark, dir)
    require(e >= 0, s"no committed tenant registry under $dir")
    spark.read.parquet(epDir(dir, e))
  }

  /** Commit a full registry snapshot as the next epoch. `registry` maps
    * tenant → allowlist frame (a `vec_id` column; duplicates deduped).
    * Returns the committed epoch.
    */
  def commit(spark: SparkSession, dir: String,
      registry: Map[String, DataFrame]): Int = {
    val frame =
      if (registry.isEmpty) emptyReg(spark)
      else registry.toSeq.sortBy(_._1).map { case (t, ids) =>
          ids.select(col("vec_id").cast("long")).distinct()
            .withColumn("tenant", lit(t))
        }.reduce(_ unionByName _).select("tenant", "vec_id")
    writeEpoch(spark, dir, frame)
  }

  /** Add or replace ONE tenant's allowlist — the next snapshot is the
    * current one with that tenant's rows swapped. Returns the epoch.
    */
  def provision(spark: SparkSession, dir: String, tenant: String,
      allowlist: DataFrame): Int = {
    val base =
      if (epochOf(spark, dir) < 0) emptyReg(spark)
      else read(spark, dir).filter(col("tenant") =!= lit(tenant))
    writeEpoch(spark, dir, base.unionByName(
      allowlist.select(col("vec_id").cast("long")).distinct()
        .withColumn("tenant", lit(tenant)).select("tenant", "vec_id")))
  }

  /** Drop ONE tenant — its queries fail closed from the next batch
    * boundary that observes the committed epoch. Returns the epoch.
    */
  def revoke(spark: SparkSession, dir: String, tenant: String): Int =
    writeEpoch(spark, dir,
      read(spark, dir).filter(col("tenant") =!= lit(tenant)))

  /** Drop snapshots below the committed epoch (provision/rotate churn
    * otherwise accumulates one allowlist-sized dir per event). Returns
    * dirs removed.
    */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val e = epochOf(spark, dir)
    if (e <= 0) return 0
    val fs = fsOf(spark, dir)
    (0 until e).map(i => new org.apache.hadoop.fs.Path(epDir(dir, i)))
      .count(p => fs.exists(p) && {
        require(fs.delete(p, true), s"could not vacuum $p"); true
      })
  }

  private def emptyReg(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("tenant", StringType),
        StructField("vec_id", LongType))))
  }

  /** Write + commit the next epoch (orphans above the committed one are
    * rolled back first — the shared crash discipline). The write READS
    * the current epoch's dir while writing the next; disjoint paths, and
    * the marker lands only after the data did.
    */
  private def writeEpoch(spark: SparkSession, dir: String,
      frame: DataFrame): Int = {
    val cur = epochOf(spark, dir)
    clearDirsAbove(spark, dir, cur)
    val next = cur + 1
    val p = epDir(dir, next)
    // registries are allowlist-sized — one file keeps the per-batch
    // reload a single-file read
    frame.coalesce(1).write.mode("overwrite").parquet(p)
    fsOf(spark, p).create(
      new org.apache.hadoop.fs.Path(p, CommitMarker), true).close()
    next
  }
}
