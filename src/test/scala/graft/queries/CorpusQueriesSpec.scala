package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus ops: connected-components semantics on hand graphs, and the
  * split/tfidf/cluster catalog queries' structural invariants at sf0.001
  * (value-exactness is the DuckDB oracle's job).
  */
class CorpusQueriesSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("connected components: chain, clique, and isolated pair resolve to min-id labels") {
    // chain 1-2-3-4 (diameter 3: needs >1 round), clique 10-11-12, pair 20-21
    val cc = CorpusQueries.connectedComponents(edges(
      1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 11L -> 12L, 10L -> 12L,
      20L -> 21L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: direction and duplicate edges don't matter") {
    val cc = CorpusQueries.connectedComponents(edges(
      5L -> 3L, 3L -> 5L, 5L -> 3L, 7L -> 5L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("connected components: empty edge set yields empty labels") {
    assert(CorpusQueries.connectedComponents(edges()).isEmpty)
  }

  test("connected components: a self-loop-only node labels itself") {
    val cc = CorpusQueries.connectedComponents(edges(5L -> 5L, 1L -> 2L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("connected components: a 64-node path resolves in O(log n) rounds") {
    // the adversarial case for min-label propagation (diameter rounds =
    // 63); large-star/small-star must land in logarithmic rounds
    val path = (0L until 63L).map(i => i -> (i + 1))
    val (labels, rounds) =
      CorpusQueries.connectedComponentsWithRounds(edges(path: _*))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 64 && got.forall(_._2 == 0L), got.take(5).toSeq)
    assert(rounds <= 12, s"took $rounds rounds on a 64-path")
  }

  test("connected components agree with union-find on random graphs") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 30
      val es = Seq.fill(25)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // truth: plain union-find, components labeled by their min id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val byRoot = (0 until n).groupBy(find)
      val truth = byRoot.values.flatMap { ids =>
        val m = ids.min.toLong
        ids.map(_.toLong -> m)
      }.toMap
      val touched = es.flatMap(e => Seq(e._1, e._2)).toSet
      val got = CorpusQueries.connectedComponents(edges(es: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth.view.filterKeys(touched).toMap, s"edges: $es")
    }
  }

  test("stratified split is deterministic and ~80/10/10") {
    val q = graft.SparkEntry.queries("q_sample_stratified")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.sameElements(b)) // bit-stable across runs
    val frac = a.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length.toDouble / a.length).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08)
    assert(math.abs(frac("val") - 0.1) < 0.05)
    assert(math.abs(frac("test") - 0.1) < 0.05)
  }

  test("blocked prefix sum matches the single-window cumsum and splits a hot language") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 5k docs in TWO languages, one of them 90% of the corpus — the naive
    // PARTITION BY lang window puts that language on ONE task; the blocked
    // form must spread it over many (lang, _blk) window partitions while
    // producing identical exclusive cumsums.
    val docs = (0L until 5000L)
      .map(i => (i, if (i % 10 == 0) "zh" else "en", (i % 37 + 1).toInt))
      .toDF("doc_id", "lang", "n_tokens")
    val blocked =
      CorpusQueries.withTokensBefore(docs, Seq("lang"), blockSize = 256L)
    val naiveW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs.withColumn("tokens_before",
      coalesce(sum("n_tokens").over(naiveW), lit(0L)))
    val got = blocked.select("doc_id", "tokens_before")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naive.select("doc_id", "tokens_before")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // the heavy window really is partitioned by the block, not just lang:
    // the executed plan's Window nodes carry _blk in their partition spec,
    // and the fixture spans many blocks (5000 / 256 = 20)
    val plan = blocked.queryExecution.executedPlan.toString
    assert(plan.contains("_blk"), plan.take(2000))
    assert(docs.select(expr("doc_id DIV 256")).distinct().count() == 20)
  }

  test("blocked prefix sum keeps null-key rows, matching the window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // windows/groupBy treat a null key as its own group — the blocked form
    // must too (a plain equijoin on the key would silently drop these rows)
    val docs = Seq[(Long, String, Int)](
      (0L, "en", 10), (1L, null, 7), (2L, "en", 5), (3L, null, 2), (4L, null, 9))
      .toDF("doc_id", "lang", "n_tokens")
    val blocked =
      CorpusQueries.withTokensBefore(docs, Seq("lang"), blockSize = 2L)
    val naiveW = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs.withColumn("tokens_before",
      coalesce(sum("n_tokens").over(naiveW), lit(0L)))
    val got = blocked.select("doc_id", "tokens_before")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naive.select("doc_id", "tokens_before")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.size == 5) // nothing dropped
  }

  test("cluster keepers: exactly one keeper per cluster, keeper is the min id") {
    val out = graft.SparkEntry.queries("q_dedup_clusters")(spark, sf001)
    val perCluster = out.groupBy("cluster_id").agg(
      sum(when(col("keeper"), 1).otherwise(0)).as("keepers"),
      min("doc_id").as("min_id"),
      first("cluster_id").as("cid"))
    assert(perCluster.filter(col("keepers") =!= 1).isEmpty)
    assert(perCluster.filter(col("min_id") =!= col("cid")).isEmpty)
  }
}
