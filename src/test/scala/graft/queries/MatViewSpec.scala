package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incrementally-maintained aggregate view: every refresh chain must
  * converge to the plain GROUP BY over the equivalent base state (the IVM
  * contract), retraction-to-zero erases a group exactly, the delta log
  * compacts without changing the served view, crashes roll back instead
  * of resurrecting, and history reads honor the compaction floor.
  */
class MatViewSpec extends SparkSpec {

  private def orders = graft.Tables.orders(spark, sf001)
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def tmp(p: String) = {
    val d = java.nio.file.Files.createTempDirectory(p).toString
    sys.addShutdownHook(org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(d)))
    d
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  /** The view a fresh bootstrap over `base` would serve — the recompute
    * oracle every incremental chain is held to.
    */
  private def recompute(base: org.apache.spark.sql.DataFrame): Seq[String] =
    canon(base.groupBy("o_custkey")
      .agg(count(lit(1)).as("mv_cnt"),
        sum(col("o_totalprice").cast("decimal(28,10)"))
          .cast("decimal(28,10)").as("mv_sum_o_totalprice")))

  test("refresh chain (inserts, then retracts) converges to the recompute") {
    val d = tmp("mv_converge")
    MatView.bootstrap(spark, orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_custkey"), Seq("o_totalprice"), d)
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(col("o_orderkey") % 2 === 0)))
    MatView.refresh(spark, d, orders.filter(col("o_orderkey") % 2 === 1),
      orders.limit(0))
    assert(canon(MatView.serve(spark, d)) == recompute(orders))
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 3))
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(!(col("o_orderkey") % 10 === 3))))
  }

  test("a group retracted to zero vanishes exactly; re-inserting revives it") {
    import spark.implicits._
    val d = tmp("mv_zero")
    val base = Seq((1L, 10L, 1.25), (2L, 10L, 2.50), (3L, 20L, 7.75))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    MatView.bootstrap(spark, base, Seq("o_custkey"), Seq("o_totalprice"), d)
    // retract BOTH of custkey 10's rows: the group must disappear, not
    // linger as a zero-count float residue
    MatView.refresh(spark, d, base.limit(0),
      base.filter(col("o_custkey") === 10))
    assert(canon(MatView.serve(spark, d).select("o_custkey", "mv_cnt")) ==
      Seq("20|1"))
    MatView.refresh(spark, d,
      Seq((9L, 10L, 0.50)).toDF("o_orderkey", "o_custkey", "o_totalprice"),
      base.limit(0))
    assert(canon(MatView.serve(spark, d)
      .select(col("o_custkey"), col("mv_cnt"), col("mv_sum_o_totalprice").cast("double")))
      .contains("10|1|0.5"))
  }

  test("updates via applyCdc (retract old + insert new) and op routing") {
    import spark.implicits._
    val d = tmp("mv_cdc")
    val base = Seq((1L, 10L, 1.0), (2L, 20L, 2.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    MatView.bootstrap(spark, base, Seq("o_custkey"), Seq("o_totalprice"), d)
    // order 1 moves from custkey 10 to 30 with a new price: one CDC batch
    val events = Seq(
      ("DELETE", 1L, 10L, 1.0),
      ("INSERT", 1L, 30L, 9.0))
      .toDF("op", "o_orderkey", "o_custkey", "o_totalprice")
    MatView.applyCdc(spark, d, events)
    assert(canon(MatView.serve(spark, d)
      .select(col("o_custkey"), col("mv_cnt"), col("mv_sum_o_totalprice").cast("double")))
      == Seq("20|1|2.0", "30|1|9.0"))
  }

  test("compact consolidates the delta log without changing the view; old epochs drop") {
    val d = tmp("mv_compact")
    MatView.bootstrap(spark, orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_custkey"), Seq("o_totalprice"), d)
    MatView.refresh(spark, d, orders.filter(col("o_orderkey") % 2 === 1),
      orders.limit(0))
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 3))
    val before = canon(MatView.serve(spark, d))
    val (e, kept) = MatView.compact(spark, d)
    assert(e == 3 && kept > 0)
    assert(canon(MatView.serve(spark, d)) == before)
    // consolidated state is ONE delta dir; the originals are gone
    val left = new java.io.File(s"$d/delta").listFiles().map(_.getName).sorted
    assert(left.toSeq == Seq("e3"))
    // and the log keeps absorbing deltas after the floor was raised
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 7))
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(
        !(col("o_orderkey") % 10 === 3) && !(col("o_orderkey") % 10 === 7))))
  }

  test("a crashed refresh rolls back — a later verb cannot resurrect its partials") {
    val d = tmp("mv_crash")
    MatView.bootstrap(spark, orders, Seq("o_custkey"), Seq("o_totalprice"), d)
    val before = canon(MatView.serve(spark, d))
    // real refresh, then delete ONLY its meta commit: the delta dir at
    // epoch 1 exists but was never committed — the abandoned-crash state
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 3))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$d/_view/meta/e1"))
    assert(canon(MatView.serve(spark, d)) == before,
      "uncommitted partials must be invisible")
    // a DIFFERENT delta now takes epoch 1: the orphan must roll back, so
    // the crashed retraction must NOT apply alongside it
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 7))
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(!(col("o_orderkey") % 10 === 7))))
    // crashed compact (consolidated dir, no commit) rolls back the same way
    val (epoch, _, _, _) = MatView.readMeta(spark, d)
    MatView.serve(spark, d).write.mode("overwrite")
      .parquet(s"$d/delta/e${epoch + 1}")
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 9))
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(
        !(col("o_orderkey") % 10 === 7) && !(col("o_orderkey") % 10 === 9))))
  }

  test("compaction preserves pending retractions — out-of-order CDC converges across a compact") {
    import spark.implicits._
    val d = tmp("mv_ooo")
    val base = Seq((10L, 1.25), (20L, 7.75)).toDF("k", "v")
    MatView.bootstrap(spark, base, Seq("k"), Seq("v"), d)
    // the DELETE arrives BEFORE its matching INSERT (out-of-order
    // delivery): key 30 goes count −1 in the log
    MatView.refresh(spark, d, base.limit(0), Seq((30L, 2.0)).toDF("k", "v"))
    // compaction fires between the two halves — it must KEEP the pending
    // negative partial, not serve-filter it away
    MatView.compact(spark, d)
    MatView.refresh(spark, d, Seq((30L, 2.0)).toDF("k", "v"), base.limit(0))
    // net effect: key 30 was never really there — count cancels to zero
    assert(canon(MatView.serve(spark, d).select("k"))
      == Seq("10", "20"),
      "a compact between an early DELETE and its late INSERT must not resurrect the row")
  }

  test("bootstrap into a previously-used dir replaces the old view entirely") {
    import spark.implicits._
    val d = tmp("mv_reboot")
    MatView.bootstrap(spark, Seq((1L, 2.0), (2L, 4.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), d)
    MatView.refresh(spark, d, Seq((3L, 8.0)).toDF("k", "v"),
      Seq.empty[(Long, Double)].toDF("k", "v")) // old view now at epoch 1
    MatView.bootstrap(spark, Seq((9L, 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), d)
    // the fresh bootstrap must serve — not the stale epoch-1 view whose
    // committed meta would otherwise out-rank the new e0
    assert(canon(MatView.serve(spark, d).select("k", "mv_cnt")) == Seq("9|1"))
    assert(MatView.lastStreamEpoch(spark, d) == -1L)
  }

  test("compact sweeps below-floor strays a crashed drop loop left behind") {
    val d = tmp("mv_stray")
    MatView.bootstrap(spark, orders, Seq("o_custkey"), Seq("o_totalprice"), d)
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 3))
    MatView.compact(spark, d) // floor now 2
    val before = canon(MatView.serve(spark, d))
    // simulate the crash window of a PREVIOUS compact: a stale dir below
    // the floor that its drop loop never reached
    MatView.serve(spark, d).limit(1).write.mode("overwrite")
      .parquet(s"$d/delta/e0")
    assert(canon(MatView.serve(spark, d)) == before,
      "the floor already hides the stray from serving")
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 7))
    MatView.compact(spark, d)
    assert(!new java.io.File(s"$d/delta/e0").exists(),
      "compact must sweep below-floor strays, not leak them forever")
    assert(canon(MatView.serve(spark, d)) ==
      recompute(orders.filter(
        !(col("o_orderkey") % 10 === 3) && !(col("o_orderkey") % 10 === 7))))
  }

  test("time travel serves any committed epoch at or above the compaction floor") {
    val d = tmp("mv_travel")
    MatView.bootstrap(spark, orders.filter(col("o_orderkey") % 2 === 0),
      Seq("o_custkey"), Seq("o_totalprice"), d)
    val at0 = canon(MatView.serve(spark, d))
    MatView.refresh(spark, d, orders.filter(col("o_orderkey") % 2 === 1),
      orders.limit(0))
    val at1 = canon(MatView.serve(spark, d))
    MatView.refresh(spark, d, orders.limit(0),
      orders.filter(col("o_orderkey") % 10 === 3))
    assert(canon(MatView.serve(spark, d, Some(0))) == at0)
    assert(canon(MatView.serve(spark, d, Some(1))) == at1)
    // compaction raises the history floor: pre-floor epochs are gone
    MatView.compact(spark, d)
    assert(canon(MatView.serve(spark, d, Some(3))) ==
      canon(MatView.serve(spark, d)))
    intercept[IllegalArgumentException] {
      MatView.serve(spark, d, Some(1)).collect()
    }
  }
}
