package graft.pipeline

import graft.SparkSpec
import graft.queries.{GraphServing, KnnGraphBuild}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming QUERY side of graph-walk serving: micro-batches of
  * query vectors answer through one warm pack handle, results land
  * epoch-idempotent with a FOLD + VACUUM lifecycle bounding the
  * per-trigger dirs, a maintainer refresh is picked up at the next
  * batch boundary, filtered (tenant-scoped) queries route through the
  * walk's allowlist overload, and a real checkpoint replay rewrites its
  * own committed dir without duplicating served rows.
  */
class WalkServeSpec extends SparkSpec {

  private val kk = 5

  private def emb = graft.Tables.embeddings(spark, sf001)
    .select("vec_id", "embedding")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  /** One built graph + pack shared by the suite's read-only streams. */
  private lazy val packDir: String = {
    val gd = tmp("wserve_graph")
    val pd = tmp("wserve_pack")
    KnnGraphBuild.build(spark, emb, gd, k = kk)
    GraphServing.build(spark, gd, emb, pd)
    pd
  }

  private def qRows(n: Int): Seq[(Long, Seq[Float])] =
    emb.filter(col("vec_id") < n)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

  test("a query stream serves through one warm handle, epoch-tagged and idempotent; a pack refresh is picked up at the next batch; stop() releases the handle") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val gd = tmp("wserve_graph1")
    val pd = tmp("wserve_pack1")
    val outDir = tmp("wserve_out1")
    val ckpt = tmp("wserve_ckpt1")
    KnnGraphBuild.build(spark, emb, gd, k = kk)
    GraphServing.build(spark, gd, emb, pd)

    val src = MemoryStream[(Long, Seq[Float])]
    val queries = src.toDS().toDF("q_id", "q_emb")
    val reopens0 = Metrics.global.value("graft_walkserve_reopens_total")
    var rddsLive = -1
    val serving = WalkServe.start(queries, pd, outDir, ckpt, k = kk)
    try {
      // ---- batch 1: served rows ≡ a direct warm-handle call ----
      val qFrame = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      src.addData(qFrame.collect().toSeq
        .map(r => (r.getLong(0), r.getSeq[Float](1))): _*)
      serving.query.processAllAvailable()
      val directH = GraphServing.open(spark, pd)
      val direct = directH.topK(qFrame, kk)
      assert(canon(WalkServe.results(spark, outDir).drop("batch")) ==
        canon(direct),
        "streamed batch diverged from the direct warm-handle answer")
      directH.close()

      // ---- the maintainer refreshes the pack underneath the stream:
      // a NEW direction (sign-flip half the dims ⇒ unique self-cos 1.0)
      // lands via graph delta + pack refresh; the NEXT batch must answer
      // with it at rank 1 — only possible if the loop reopened onto the
      // refreshed epoch ----
      val zId = 7700001L
      val zVec = emb.filter(col("vec_id") === 11L).head.getSeq[Float](1)
        .zipWithIndex.map { case (v, i) => if (i % 2 == 0) v else -v }
      val zRow = Seq((zId, zVec)).toDF("vec_id", "embedding")
        .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
        .localCheckpoint()
      KnnGraphBuild.delta(spark, zRow, gd)
      GraphServing.refresh(spark, gd, emb.unionByName(zRow), pd)
      assert(GraphServing.readMeta(spark, pd).epoch == 1)
      src.addData((-1L, zVec.toSeq))
      serving.query.processAllAvailable()
      val served = WalkServe.results(spark, outDir)
        .filter(col("q_id") === -1L).collect()
      assert(served.exists(r => r.getLong(2) == zId && r.getInt(1) == 1),
        s"post-refresh batch must answer with the fresh vector, got " +
          served.map(_.getLong(2)).mkString(","))
      assert(Metrics.global.value("graft_walkserve_reopens_total") ==
        reopens0 + 1, "exactly one handle reopen for one pack advance")

      // ---- output is one committed dir per stream epoch
      // (overwrite-idempotent: a replay rewrites its own dir) ----
      val dirs = new java.io.File(outDir).list().filter(_.startsWith("b"))
      assert(dirs.length == 2, s"one result dir per epoch, got ${dirs.toSeq}")
      rddsLive = spark.sparkContext.getPersistentRDDs.size
    } finally serving.stop()
    // stop() closed the warm handle — its pinned seed checkpoint
    // released eagerly. The close may land on the termination-listener
    // thread when that wins the hand-off race, so poll briefly — the
    // point is EAGER release (well under the cleaner's GC cadence), not
    // same-microsecond release
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.size >= rddsLive &&
      System.nanoTime < deadline) Thread.sleep(100)
    assert(spark.sparkContext.getPersistentRDDs.size < rddsLive,
      "stop() must release the handle's pinned blocks")
  }

  test("FILTERED queries serve through the stream: parity with the direct filtered call, every row in the allowlist, sparse-recall floor held") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val outDir = tmp("wserve_out2")
    val ckpt = tmp("wserve_ckpt2")
    // f ≈ 1/15 — the sparse operating point where the handle's
    // auto-widen earns the floor (GraphFilteredWalkSpec's measurement);
    // through the STREAM it must behave identically, with the
    // selectivity measured once per handle (memoized), not per trigger
    val allowed = emb.filter(col("vec_id") % 15 === 1)
      .select("vec_id").localCheckpoint()
    val qFrame = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()

    val src = MemoryStream[(Long, Seq[Float])]
    val serving = WalkServe.start(src.toDS().toDF("q_id", "q_emb"),
      packDir, outDir, ckpt, k = kk, allowedIds = allowed)
    try {
      src.addData(qRows(20): _*)
      serving.query.processAllAvailable()
    } finally serving.stop()
    val streamed = WalkServe.results(spark, outDir).drop("batch")
    val rows = streamed.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) % 15 == 1),
      "a streamed result escaped the allowlist")
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == kk),
      "sparse allowlist under-filled k through the stream")
    val directH = GraphServing.open(spark, packDir)
    assert(canon(streamed) == canon(directH.topK(qFrame, kk, allowed)),
      "streamed filtered answers diverged from the direct filtered call")
    directH.close()
    // the ≥ 0.8 floor vs the filtered brute oracle, through the stream
    val e = emb.filter(col("vec_id") % 15 === 1).withColumn("nrm",
      graft.functions.VectorFunctions.l2Norm(col("embedding")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("cos_r").desc, col("vec_id").asc)
    val truth = broadcast(qFrame.withColumn("q_n",
        graft.functions.VectorFunctions.l2Norm(col("q_emb"))))
      .join(e, col("q_id") =!= col("vec_id"))
      .withColumn("cos_r",
        round(graft.functions.VectorFunctions.cosineWithNorms(
          col("q_emb"), col("embedding"), col("q_n"), col("nrm")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val gotBy = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val per = truth.map { case (q, t) =>
      gotBy.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val rec = per.sum / per.size
    info(f"streamed sparse filtered recall@$kk = $rec%.3f")
    assert(rec >= 0.8, f"streamed filtered recall $rec%.3f < 0.8")
  }

  test("MULTI-TENANT serving: each tenant answers within ITS OWN allowlist (parity with direct filtered calls), unknown tenants fail CLOSED") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val outDir = tmp("wserve_out6")
    val ckpt = tmp("wserve_ckpt6")
    // tenant a: a dense allowlist; tenant b: the sparse f ≈ 1/15 one
    // (its queries must ride the auto-widened walk THROUGH the stream)
    val allowA = emb.filter(col("vec_id") % 3 === 0)
      .select("vec_id").localCheckpoint()
    val allowB = emb.filter(col("vec_id") % 15 === 1)
      .select("vec_id").localCheckpoint()
    val vecs = emb.filter(col("vec_id") < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val unknown0 = Metrics.global
      .value("graft_walkserve_unknown_tenant_total")
    val src = MemoryStream[(Long, Seq[Float], String)]
    val serving = WalkServe.startTenants(
      src.toDS().toDF("q_id", "q_emb", "tenant"), packDir, outDir, ckpt,
      allowlists = Map("a" -> allowA, "b" -> allowB), k = kk)
    try {
      // one batch: 10 queries per tenant (same vectors, disjoint q_ids)
      // plus two rows for an unprovisioned tenant — those must VANISH
      src.addData(
        vecs.map { case (id, v) => (id, v, "a") } ++
          vecs.map { case (id, v) => (id + 1000L, v, "b") } ++
          vecs.take(2).map { case (id, v) => (id + 2000L, v, "z") }: _*)
      serving.query.processAllAvailable()
    } finally serving.stop()
    val rows = WalkServe.results(spark, outDir).collect()
    val byTenant = rows.groupBy(_.getString(4))
    assert(byTenant.keySet == Set("a", "b"),
      s"unknown tenant leaked into results: ${byTenant.keySet}")
    assert(byTenant("a").forall(_.getLong(2) % 3 == 0),
      "a result escaped tenant a's allowlist")
    assert(byTenant("b").forall(_.getLong(2) % 15 == 1),
      "a result escaped tenant b's allowlist")
    assert(byTenant("b").groupBy(_.getLong(0)).forall(_._2.length == kk),
      "the sparse tenant under-filled k — the auto-widen must ride the stream")
    assert(Metrics.global.value("graft_walkserve_unknown_tenant_total") ==
      unknown0 + 2, "dropped unknown-tenant rows must be surfaced")
    // parity per tenant with the DIRECT filtered call under the same
    // allowlist frames (the widen memo keys on frame identity)
    val directH = GraphServing.open(spark, packDir)
    val qA = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    assert(canon(WalkServe.results(spark, outDir)
        .filter(col("tenant") === "a")
        .drop("tenant", "batch")) ==
      canon(directH.topK(qA, kk, allowA)),
      "tenant a diverged from the direct filtered call")
    val qB = qA.withColumn("q_id", col("q_id") + 1000L)
    assert(canon(WalkServe.results(spark, outDir)
        .filter(col("tenant") === "b")
        .drop("tenant", "batch")) ==
      canon(directH.topK(qB, kk, allowB)),
      "tenant b diverged from the direct filtered call")
    directH.close()
  }

  test("fold + vacuum give the result dirs a lifecycle: row-identical across the fold, superseded dirs dropped, a below-watermark replay cannot re-enter results()") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val outDir = tmp("wserve_out3")
    val ckpt = tmp("wserve_ckpt3")
    val src = MemoryStream[(Long, Seq[Float])]
    val serving = WalkServe.start(src.toDS().toDF("q_id", "q_emb"),
      packDir, outDir, ckpt, k = kk)
    try {
      // three separate stream epochs
      qRows(3).foreach { q =>
        src.addData(q); serving.query.processAllAvailable()
      }
    } finally serving.stop()
    val before = canon(WalkServe.results(spark, outDir))
    assert(before.nonEmpty)
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) == 3)

    // FOLD consolidates the three dirs into one committed store —
    // results row-identical; VACUUM drops the superseded batch dirs
    val fe = WalkServe.fold(spark, outDir)
    assert(fe == 0, s"first fold epoch must be 0, got $fe")
    assert(canon(WalkServe.results(spark, outDir)) == before,
      "results diverged across the fold")
    assert(WalkServe.vacuum(spark, outDir) >= 3)
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) == 0,
      "vacuum must drop batch dirs at or below the fold watermark")
    assert(canon(WalkServe.results(spark, outDir)) == before,
      "results diverged after the vacuum")

    // a REPLAYED epoch below the watermark (crash recovery re-running a
    // folded batch) re-mints its dir — results() must NOT double-serve
    // it: its rows already live in the fold
    import spark.implicits._
    Seq((0L, 1, 999999L, 0.5, 1L))
      .toDF("q_id", "rnk", "vec_id", "cos", "batch")
      .write.mode("overwrite").parquet(s"$outDir/b1")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$outDir/b1",
      "_graft_committed"), true).close()
    assert(canon(WalkServe.results(spark, outDir)) == before,
      "a below-watermark replay dir re-entered results()")
    // an idle fold is a no-op; the next vacuum clears the replay dir
    assert(WalkServe.fold(spark, outDir) == 0)
    assert(WalkServe.vacuum(spark, outDir) >= 1)
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) == 0)
    assert(canon(WalkServe.results(spark, outDir)) == before)
  }

  test("an in-loop fold cadence bounds the live dirs across many batches; describe() reports the lifecycle") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val outDir = tmp("wserve_out4")
    val ckpt = tmp("wserve_ckpt4")
    val src = MemoryStream[(Long, Seq[Float])]
    val folds0 = Metrics.global.value("graft_walkserve_folds_total")
    val serving = WalkServe.start(src.toDS().toDF("q_id", "q_emb"),
      packDir, outDir, ckpt, k = kk, foldEvery = 2)
    try {
      qRows(6).foreach { q =>
        src.addData(q); serving.query.processAllAvailable()
      }
    } finally serving.stop()
    val st = WalkServe.describe(spark, outDir)
    info(s"after 6 batches at foldEvery=2: $st")
    assert(st.foldEpoch >= 1, "the in-loop cadence must have folded")
    assert(st.liveBatchDirs < 2,
      s"live batch dirs must stay under the cadence, got ${st.liveBatchDirs}")
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) < 2,
      "vacuum must run with the in-loop fold")
    assert(Metrics.global.value("graft_walkserve_folds_total") > folds0)
    // every served row still present exactly once: 6 queries × k
    val res = WalkServe.results(spark, outDir)
    assert(res.count() == 6L * kk, s"expected ${6 * kk} rows")
    assert(res.select("q_id", "vec_id").distinct().count() == 6L * kk,
      "a fold or replay duplicated served rows")
  }

  test("a REAL checkpoint replay (commit log truncated) re-executes the committed batch and rewrites its dir with no duplicates in results()") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // a FILE source, not MemoryStream: the source must be able to
    // re-serve a batch the sink already committed (MemoryStream purges
    // on source-commit; a file source's per-batch file list persists in
    // the checkpoint's source log — the real recovery contract)
    val srcDir = tmp("wserve_src5")
    val outDir = tmp("wserve_out5")
    val ckpt = tmp("wserve_ckpt5")
    val qFrame = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    qFrame.coalesce(1).write.mode("overwrite").parquet(srcDir)
    def queries = spark.readStream.schema(qFrame.schema).parquet(srcDir)
    val s1 = WalkServe.start(queries, packDir, outDir, ckpt, k = kk)
    try {
      s1.query.processAllAvailable()
    } finally s1.stop()
    val before = canon(WalkServe.results(spark, outDir))
    assert(before.nonEmpty)
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) == 1)

    // crash window: the output committed (dir + marker) but the stream's
    // commit log didn't — recovery MUST re-execute epoch 0 through
    // foreachBatch. Drop the output dir too: the replay has to actually
    // re-serve the batch, not coast on the leftover
    val commit0 = new java.io.File(s"$ckpt/commits/0")
    assert(commit0.exists, "fixture: expected commit log entry for epoch 0")
    assert(commit0.delete())
    // the local checksum FS keeps a .crc sibling — a leftover one makes
    // the recovery's commit rename throw FileAlreadyExists
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$outDir/b0"))
    assert(canon(WalkServe.results(spark, outDir)).isEmpty)
    val s2 = WalkServe.start(queries, packDir, outDir, ckpt, k = kk)
    try {
      s2.query.processAllAvailable()
    } finally s2.stop()
    assert(canon(WalkServe.results(spark, outDir)) == before,
      "the replayed batch must re-serve its epoch dir, byte-identically")
    assert(new java.io.File(outDir).list().count(_.startsWith("b")) == 1,
      "the replay must rewrite its own dir, not mint a new one")
  }
}
