package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe (VERDICT r5 item 7): time the slowest document/embedding
  * queries at sf0.1 and at a synthesized ×FACTOR corpus, and record each
  * query's empirical scaling exponent log(t_big/t_base)/log(FACTOR) to
  * `BENCH_scale.json` — a superlinear exponent (≳1.2, i.e. worse than
  * n·log n) flags a query that would fall over on a real cluster long
  * before 100 TB.
  *
  * The ×FACTOR corpus is NOT naive replication: identical copies would
  * pair with each other in every dedup query and quadratically inflate the
  * OUTPUT (a data artifact, not an algorithmic cost). Instead each replica
  * r > 0 gets
  *   - documents: a per-replica alphabet substitution (translate with a
  *     seeded shuffle) — token/shingle STRUCTURE identical, shingle SETS
  *     disjoint across replicas, so near-dup mass scales ×FACTOR;
  *   - embeddings: a per-replica deterministic ±1 sign mask — norms and
  *     intra-replica similarities preserved, cross-replica cosines
  *     decorrelated.
  * Other tables are symlinked from sf0.1 (the probed queries don't read
  * them at scale).
  *
  * `runMain graft.ScaleProbe [factor]` — writes BENCH_scale.json in cwd.
  */
object ScaleProbe {

  private val Probed = Seq(
    "q_dedup_jaccard", "q_dedup_minhash_pairs", "q_dedup_simhash_pairs",
    "q_dedup_clusters", "q_corpus_final", "q_pack_chunks", "q_text_tfidf",
    "q_sim_topk_lsh", "q_sim_ivf_kmeans", "q_sim_topk_pq", "q_sim_knn_graph",
    "q_sim_knn_graph_ivf",
    // round 12: the new retrieval rows that read the scaled tables
    // (documents/embeddings). bm25's expected shape is ~linear: the
    // postings/df build is one map-reduce pass over the corpus (the
    // persisted-index row is the serving path that avoids it); the SQ and
    // diversity scans are broadcast-query corpus passes like q_sim_topk.
    "q_rank_bm25", "q_sim_topk_sq", "q_sim_topk_diverse",
    // round 12 late: orders/lineitem now scale too (offset order keys,
    // unchanged dimension keys), so the IVM lifecycle and the z-order
    // clustered write are probed at ×factor. Expected ~linear: matview's
    // cost is the delta partials' map-side-combined shuffles; zorder's is
    // the approxQuantile pass + the range-partitioned sort-write.
    // anomaly stays excluded — replicas reuse the same dimension keys, so
    // its per-key hourly stats DEDUPE back to ~the base-size structure
    // (the probe would measure dedup, not the operator); pagerank gets a
    // DISJOINT-replica probe below instead, for the same reason. events
    // is still symlinked.
    "q_matview_refresh", "q_layout_zorder",
    // round 13: the MMR re-rank (constant 10-query broadcast scan over
    // the ×factor corpus — expected ~linear) and phrase search (term-
    // frequency-sized positional join off one corpus pass — ~linear)
    "q_sim_mmr", "q_text_phrase")

  /** Replica id offset of the synthesized corpus — shared by
    * [[buildScaled]] and the disjoint-replica pagerank probe.
    */
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(5)
    val base = "/root/testdata/sf0.1"
    val scaled = s"/tmp/graft_scale_x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildScaled(spark, base, scaled, factor)

    // warm codegen/JIT on the small sf so neither timed dir pays it
    Probed.foreach(n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").count())

    // interleaved passes, min per (query, dir) — this VM has transient
    // noise windows (see Bench.scala). Three passes since round 15: the
    // sub-second rows' exponents swung ±0.2 between min-of-2 recordings
    // (fixed overhead is a large fraction of their absolute time), and a
    // third interleaved pass pulls the min reliably out of noise spikes.
    val passes = 3
    // the same fixed-computation noise sentinel Bench records, one
    // reading per interleaved pass (plus one after the probes), so a
    // BENCH_scale recording carries its own quiet-window evidence — the
    // r16 verdict's recording gate applies to the scale probe too
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 50000000L, 1L, cpus.toInt)
        .selectExpr("sum(cast(hash(id) as bigint))").collect()
      math.round((System.nanoTime() - t0) / 1e9 * 1000.0) / 1000.0
    }
    (1 to 3).foreach(_ => sentinel()) // JIT to steady state
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    val times = scala.collection.mutable.Map[(String, String), Double]()
    (1 to passes).foreach { _ =>
      sentinels += sentinel()
      Probed.foreach { name =>
        Seq(base, scaled).foreach { dir =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).count()
          val t = (System.nanoTime() - t0) / 1e9
          val k = (name, dir)
          times(k) = math.min(times.getOrElse(k, Double.MaxValue), t)
        }
      }
    }
    val entries = Probed.map { name =>
      val t1 = times((name, base)); val t2 = times((name, scaled))
      val exp = math.log(t2 / t1) / math.log(factor.toDouble)
      f""""$name":{"sec_sf01":${math.rint(t1 * 1000) / 1000},"sec_x$factor":${
        math.rint(t2 * 1000) / 1000},"exponent":${math.rint(exp * 100) / 100}}"""
    }
    // the k-NN graph's floor is recall, not seconds — record it at the
    // scaled corpus so the exponent/recall tradeoff is visible in one
    // artifact (round 8: radius-2 probing holds 0.955 here where radius 1
    // had silently decayed to 0.634)
    // the exact oracle is O(n·q) cross-scoring collected to the driver —
    // above OracleFullCeiling rows, sample ~1000 query vertices
    // deterministically (q_id % mod == 0) so the probe completes at high
    // factors instead of the oracle dwarfing the probed queries
    val OracleFullCeiling = 20000L
    val nScaled = Tables.embeddings(spark, scaled).count()
    val mod =
      if (nScaled <= OracleFullCeiling) 1L else math.max(1L, nScaled / 1000L)
    val exact = Recall.pairs(
      graft.queries.VectorQueries.bruteKnnGraph(spark, scaled, 5, mod)
        .collect(), 5)
    def recallOfRows(rows: Array[org.apache.spark.sql.Row]): Double = {
      val approx = Recall.pairs(rows.filter(_.getLong(0) % mod == 0), 5)
      math.rint(Recall.of(exact, approx) * 1000) / 1000
    }
    // BOTH graph builds' recall at scale, against one shared oracle: this
    // pair is the evidence behind GraphAutoIvfThreshold staying at the bit
    // clamp (LSH holds ~0.95 where the default-knob IVF build sits far
    // below its 0.9 floor on this corpus's diffuse cells — the full
    // measured frontier is in IVF_FRONTIER.json / COVERAGE.md)
    val knnRecallX =
      recallOfRows(SparkEntry.queries("q_sim_knn_graph")(spark, scaled).collect())
    val knnIvfRecallX =
      recallOfRows(SparkEntry.queries("q_sim_knn_graph_ivf")(spark, scaled).collect())
    // the crossover measured IN SITU (VERDICT r9 item 4): force the
    // threshold between the two probed corpora so buildAuto's own routing
    // takes LSH at sf0.1 and IVF at ×factor, and record the switched
    // path's seconds, cross-threshold exponent, and recall THROUGH the
    // auto entry — plus the default-threshold paths for the static story
    val autoJson = {
      def path(n: Long) =
        if (n > graft.queries.VectorQueries.GraphAutoIvfThreshold) "ivf" else "lsh"
      val nBase = Tables.embeddings(spark, base).count()
      def run(dir: String) = {
        val t0 = System.nanoTime()
        val rows = graft.queries.VectorQueries.knnGraphAuto(spark, dir,
          k = 5, thresholdOverride = nBase).collect() // nBase: not > ⇒ lsh
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tBase, _) = run(base)
      val (tScaled, rowsScaled) = run(scaled)
      // in-session CONTROL (VERDICT r10 item 4): the same operating-point
      // IVF build, called directly (no auto wrapper) back-to-back with the
      // in-situ run — isolates the auto entry's own overhead (corpus count
      // + routing) from cross-session drift vs the IVF_FRONTIER sweep
      val tDirect = {
        val t0 = System.nanoTime()
        graft.queries.VectorQueries.knnGraphIvf(spark, scaled, k = 5,
          nprobe = graft.queries.VectorQueries.GraphAutoIvfNprobe).count()
        (System.nanoTime() - t0) / 1e9
      }
      val switchedExp = math.rint(
        math.log(tScaled / tBase) / math.log(factor.toDouble) * 100) / 100
      s""""knn_auto":{"threshold_n":${graft.queries.VectorQueries.GraphAutoIvfThreshold},""" +
        s""""path_base":"${path(nBase)}","path_scaled":"${path(nScaled)}",""" +
        s""""insitu":{"threshold_override":$nBase,"path_base":"lsh",""" +
        s""""path_scaled":"ivf","sec_base":${math.rint(tBase * 1000) / 1000},""" +
        s""""sec_x$factor":${math.rint(tScaled * 1000) / 1000},""" +
        s""""sec_x${factor}_direct":${math.rint(tDirect * 1000) / 1000},""" +
        s""""switched_exponent":$switchedExp,""" +
        s""""switched_recall_x$factor":${recallOfRows(rowsScaled)}}}"""
    }
    // round 13: the newest SERVING paths, priced as serving — the index
    // fixture builds run untimed per dir, only the query path is timed
    // (the catalog rows for these either build inline, hiding the serve
    // cost behind the build's exponent, or are bench=false fixture rows).
    val servingJson = {
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // fixtures (untimed): persisted k-NN graph + its serving pack
      // (bucketed adjacency/vectors, pinned seeds + walk params, warm
      // handle — the GraphServing index-regime path) + inverted index
      val fx = Seq(base, scaled).map { dir =>
        val tag = if (dir == base) "base" else s"x$factor"
        val graphDir = s"/tmp/graft_probe_graph_$tag"
        val packDir = s"/tmp/graft_probe_gpack_$tag"
        val idxDir = s"/tmp/graft_probe_invidx_$tag"
        Seq(graphDir, packDir, idxDir).foreach(p =>
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
        graft.queries.KnnGraphBuild.build(spark,
          Tables.embeddings(spark, dir).select("vec_id", "embedding"),
          graphDir, k = 5)
        graft.queries.GraphServing.build(spark, graphDir,
          Tables.embeddings(spark, dir).select("vec_id", "embedding"),
          packDir, nSeeds = 32)
        graft.queries.InvertedIndex.build(spark,
          Tables.documents(spark, dir).select("doc_id", "text"), idxDir)
        dir -> (graphDir, packDir, idxDir,
          graft.queries.GraphServing.open(spark, packDir))
      }.toMap
      // fixed work per query set: replica-0 ids/texts exist identically in
      // both dirs, so the exponent isolates corpus-size effects. The timed
      // region is the WALK ROUNDS alone — build/open are maintenance state
      // (the r13 form re-derived the adjacency closure + corpus norms per
      // call and measured exponent 0.86; the pack moves that to build time
      // and prunes each round's reads to the frontier's buckets)
      def walkOnce(dir: String): Unit = {
        val (_, _, _, handle) = fx(dir)
        val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
        val q = e.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        handle.topK(q, k = 5).count()
      }
      def bm25Once(dir: String): Unit = {
        val (_, _, idxDir, _) = fx(dir)
        val q = Tables.documents(spark, dir).filter(col("doc_id") < 3)
          .select(col("doc_id").as("q_id"), col("text"))
        graft.queries.InvertedIndex.bm25TopK(spark, idxDir, q, k = 10,
          excludeQueryDoc = true).count()
      }
      // pagerank over DISJOINT replicas: node keys offset per replica, so
      // the ×factor corpus yields ×factor nodes and edges instead of
      // deduping back to the base graph (identity at base: one replica)
      def pagerankOnce(dir: String): Unit =
        graft.queries.GraphQueries.pageRank(spark,
          graft.queries.GraphQueries.fulfillmentEdges(spark, dir,
            replicaStride = Stride)).count()
      val servingProbes: Seq[(String, String => Unit)] = Seq(
        "graph_walk_serve" -> walkOnce,
        "bm25_idx_serve" -> bm25Once,
        "pagerank_disjoint" -> pagerankOnce)
      // warm, then interleaved min-of-passes like the Probed loop
      servingProbes.foreach { case (_, f) => Seq(base, scaled).foreach(f) }
      val t = scala.collection.mutable.Map[(String, String), Double]()
      (1 to passes).foreach { _ =>
        servingProbes.foreach { case (name, f) =>
          Seq(base, scaled).foreach { dir =>
            val k = (name, dir)
            t(k) = math.min(t.getOrElse(k, Double.MaxValue), timed(f(dir)))
          }
        }
      }
      val rows = servingProbes.map { case (name, _) =>
        val (t1, t2) = (t((name, base)), t((name, scaled)))
        val exp = math.log(t2 / t1) / math.log(factor.toDouble)
        f""""$name":{"sec_sf01":${math.rint(t1 * 1000) / 1000},"sec_x$factor":${
          math.rint(t2 * 1000) / 1000},"exponent":${math.rint(exp * 100) / 100}}"""
      }
      // the walk's recall floor ON THE SCALED CORPUS (GraphSearchSpec
      // asserts it at sf0.001 only): beam search over the persisted ×N
      // graph, sampled-oracle query vertices, hard floor — a silent
      // recall collapse at scale must fail the probe, not hide in a
      // timing row. The adaptive (beam, rounds) defaults exist BECAUSE
      // this probe caught the fixed (32, 4) walk at 0.609 recall on the
      // ×2 corpus (the walk-tune sweep in GraphSearch.adaptiveWalkParams'
      // scaladoc); the ceiling is the LSH graph's own edge recall
      // (knn_recall_x5 ≈ 0.955).
      val (_, _, _, handleX) = fx(scaled)
      val eX = Tables.embeddings(spark, scaled).select("vec_id", "embedding")
      val qX = eX.filter(col("vec_id") % mod === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val walkRecallX = recallOfRows(handleX.topK(qX, k = 5).collect())
      require(walkRecallX >= 0.8,
        f"beam-walk recall collapsed at x$factor: $walkRecallX%.3f < 0.8")
      // round 15: PACK MAINTENANCE priced beside pack serving — refresh
      // is now a change-shard append, so the receipt is twofold: the
      // seconds exponent of a FIXED 200-vector churn absorbed at both
      // scales (the remaining corpus terms are scalar-only reads: the
      // edge-list hops, the seed assign pass, the corpus count), and the
      // rows WRITTEN, which must track the churn, not the corpus — the
      // base-rewrite form this replaced wrote base_rows every refresh.
      // Runs LAST: it mutates the fixture graphs the other probes read.
      val refreshRow = {
        // (delta sec, delta shard rows, graph base rows,
        //  refresh sec, pack shard rows, pack base rows)
        // TWO churn rounds per dir (round 17): a single-shot 4-6 s
        // measurement swung the exponent ±0.15 between recording windows.
        // Round 2 applies a SECOND fixed 200-vector churn to the
        // once-refreshed state — the production steady state — and the
        // reported pair picks the faster round BY THE SAME ROUND INDEX at
        // both dirs (round 2 merges one more shard than round 1; mixing
        // indexes across dirs would fold that structural delta into the
        // exponent instead of pure corpus-size scaling). Row receipts
        // come from round 1 (comparable across recordings).
        def probe(dir: String): Seq[(Double, Long, Long, Double, Long, Long)] = {
          val (graphDir, packDir, _, _) = fx(dir)
          val e0 = Tables.embeddings(spark, dir).select("vec_id", "embedding")
          var live = e0
          def round(i: Int): (Double, Long, Long, Double, Long, Long) = {
            // fixed-work churn: replica-0 low ids exist identically in
            // both dirs; the sign mask (seed family far outside every
            // in-use plane family, see replicaEmb) makes the directions
            // novel, and a distinct mask + id range per round keeps the
            // second churn as novel as the first
            val mask = typedLit(graft.functions.VectorFunctions
              .lshPlane(2000000 + i, 64).map(_.toFloat))
            val delta = e0.orderBy("vec_id").limit(200)
              .withColumn("vec_id",
                col("vec_id") + 500000000L + i * 1000000L)
              .withColumn("embedding",
                zip_with(col("embedding"), mask,
                  (x, s) => (x * s).cast("float")))
              .localCheckpoint()
            // the graph's own delta — shard-committed since round 15, so
            // its write is the changed lists, never the full edge list
            val tD0 = System.nanoTime()
            graft.queries.KnnGraphBuild.delta(spark, delta, graphDir)
            val secD = (System.nanoTime() - tD0) / 1e9
            val gEp = graft.queries.KnnGraphBuild.epochOf(spark, graphDir)
            val gShard = spark.read
              .parquet(s"$graphDir/_graft_state/edges/e$gEp").count()
            val gBase = spark.read
              .parquet(s"$graphDir/_graft_state/edges/e0").count()
            live = live.unionByName(delta)
            val t0 = System.nanoTime()
            graft.queries.GraphServing.refresh(spark, graphDir, live, packDir)
            val sec = (System.nanoTime() - t0) / 1e9
            val m = graft.queries.GraphServing.readMeta(spark, packDir)
            (secD, gShard, gBase, sec,
              spark.read.parquet(s"$packDir/adj/e${m.epoch}").count(),
              spark.read.parquet(s"$packDir/adj/e${m.base}").count())
          }
          Seq(round(0), round(1))
        }
        val rB = probe(base)
        val rX = probe(scaled)
        val iD = Seq(0, 1).minBy(i => rB(i)._1 + rX(i)._1) // delta pair
        val iR = Seq(0, 1).minBy(i => rB(i)._4 + rX(i)._4) // refresh pair
        val (tdB, gsB, gbB) = (rB(iD)._1, rB.head._2, rB.head._3)
        val (tdX, gsX, gbX) = (rX(iD)._1, rX.head._2, rX.head._3)
        val (tB, sB, bB) = (rB(iR)._4, rB.head._5, rB.head._6)
        val (tX, sX, bX) = (rX(iR)._4, rX.head._5, rX.head._6)
        val exp = math.log(tX / tB) / math.log(factor.toDouble)
        val expD = math.log(tdX / tdB) / math.log(factor.toDouble)
        s""""graph_delta":{"churn":200,"sec_sf01":${math.rint(tdB * 1000) / 1000},""" +
          s""""sec_x$factor":${math.rint(tdX * 1000) / 1000},""" +
          s""""exponent":${math.rint(expD * 100) / 100},""" +
          s""""shard_rows_sf01":$gsB,"base_rows_sf01":$gbB,""" +
          s""""shard_rows_x$factor":$gsX,"base_rows_x$factor":$gbX},""" +
          s""""pack_refresh":{"churn":200,"sec_sf01":${math.rint(tB * 1000) / 1000},""" +
          s""""sec_x$factor":${math.rint(tX * 1000) / 1000},""" +
          s""""exponent":${math.rint(exp * 100) / 100},""" +
          s""""shard_rows_sf01":$sB,"base_rows_sf01":$bB,""" +
          s""""shard_rows_x$factor":$sX,"base_rows_x$factor":$bX}"""
      }
      (rows :+ refreshRow :+
        s""""graph_walk_recall_x$factor":$walkRecallX""").mkString(",")
    }
    sentinels += sentinel() // one reading after the heavy probes too
    val sentinelSpread = math.round(
      sentinels.max / math.max(sentinels.min, 1e-9) * 100.0) / 100.0
    // the FIRST reading runs on a warm post-JIT quiet heap and is
    // systematically faster than the ones taken under probe GC/cache
    // pressure (Bench.scala's measured drift) — the steady spread
    // (readings 2+) is the comparable quiet-window gate, same as Bench's
    val steadySent =
      if (sentinels.length > 1) sentinels.drop(1) else sentinels.toSeq
    val sentinelSpreadSteady = math.round(
      steadySent.max / math.max(steadySent.min, 1e-9) * 100.0) / 100.0
    val json = s"""{"factor":$factor,"base":"$base","passes":$passes,""" +
      s""""knn_recall_x$factor":$knnRecallX,""" +
      s""""knn_ivf_recall_x$factor":$knnIvfRecallX,$autoJson,$servingJson,""" +
      s""""sentinel_sec":${sentinels.mkString("[", ",", "]")},""" +
      s""""sentinel_spread":$sentinelSpread,""" +
      s""""sentinel_spread_steady":$sentinelSpreadSteady,""" +
      s""""git_sha":"${Bench.gitSha()}",""" +
      s""""stat":"min","queries":{${entries.mkString(",")}}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_scale.json"), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }

  /** Synthesize the ×factor corpus next to symlinks of the other tables.
    * Shared with IvfGraphProbe (the recall/cost frontier sweep).
    */
  private[graft] def buildScaled(
      spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    val dir = java.nio.file.Paths.get(out)
    // guard on the LAST artifact written (embeddings) — a build that died
    // between the writes must be redone, not silently reused. A dir from
    // the era when orders/lineitem were symlinked (round ≤ 12) must also
    // rebuild: probing the fact-table rows against a symlink would time
    // identical data and record a fake exponent of 0.
    if (java.nio.file.Files.isDirectory(dir) &&
        java.nio.file.Files.exists(dir.resolve("embeddings.parquet"))) {
      if (!java.nio.file.Files.isSymbolicLink(dir.resolve("orders.parquet")))
        return
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    java.nio.file.Files.createDirectories(dir)
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "events")
    others.foreach { t =>
      val link = dir.resolve(s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(base, s"$t.parquet"))
    }
    val stride = Stride
    // fact tables scale by replica with OFFSET order keys and UNCHANGED
    // dimension keys (custkey/suppkey/partkey): realistic fact growth —
    // 5× the rows per group/box, same group space. stride ≡ 0 (mod 10)
    // keeps every orderkey-mod predicate meaning the same thing per
    // replica, and the zorder row's floor(max·0.2) bound still selects a
    // constant ~20% of rows (replica 0 in full).
    Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey")).foreach {
      case (t, keyCol) =>
        (0 until factor).map { r =>
          spark.read.parquet(s"$base/$t.parquet")
            .withColumn(keyCol, col(keyCol) + lit(r * stride))
        }.reduce(_ unionAll _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    val abc = "abcdefghijklmnopqrstuvwxyz"
    def replicaDocs(r: Int): DataFrame = {
      val d = Tables.documents(spark, base)
        .withColumn("doc_id", col("doc_id") + lit(r * stride))
      if (r == 0) d
      else {
        val shuffled = new scala.util.Random(1000 + r)
          .shuffle(abc.toList).mkString
        d.withColumn("text", translate(col("text"), abc, shuffled))
      }
    }
    (0 until factor).map(replicaDocs).reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    def replicaEmb(r: Int): DataFrame = {
      val e = Tables.embeddings(spark, base)
        .withColumn("vec_id", col("vec_id") + lit(r * stride))
      if (r == 0) e
      else {
        // seed family far outside every in-use plane family: LSH tables
        // use t*1000+b (0..~16063) and the JL projection uses 5000+j — a
        // mask drawn from one of those planes would CANCEL in the very
        // projection being measured ((x⊙p)·p = Σx) and skew the exponent
        val mask = typedLit(
          graft.functions.VectorFunctions.lshPlane(1000000 + r, 64).map(_.toFloat))
        e.withColumn("embedding",
          zip_with(col("embedding"), mask, (x, s) => (x * s).cast("float")))
      }
    }
    (0 until factor).map(replicaEmb).reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
