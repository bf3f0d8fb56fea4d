package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the scalar transforms (SURVEY.md §5): invariants that
  * must hold for arbitrary generated inputs, not just the curated fixtures.
  * Uses plain ScalaCheck generators driven from fixed seeds (deterministic,
  * no scalatestplus bridge needed in the offline dependency set).
  */
class PropertySpec extends SparkSpec {

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  /** Deterministic sample stream: one value per seed 1..n. */
  private def samples[A](gen: Gen[A], n: Int = 25): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("buildId round-trips: splitting the id recovers its components") {
    import spark.implicits._
    val cases = samples(Gen.zip(ident, ident, ident, ident))
    val df = cases.map { case (ns, group, kind, name) => (ns, s"$group/v1", kind, name) }
      .toDF("ns", "ver", "kind", "name")
      .select(col("ns"), col("name"),
        KubeFunctions.buildId(col("ns"), col("ver"), col("kind"), col("name")).as("id"))
    df.collect().foreach { r =>
      val parts = r.getAs[String]("id").split("/")
      assert(parts.length == 5) // ns / group / v1 / kind / name
      assert(parts(0) == r.getAs[String]("ns") && parts.last == r.getAs[String]("name"))
    }
  }

  test("buildId UDF variant agrees with the Column-expression form") {
    import spark.implicits._
    val cases = samples(Gen.zip(Gen.oneOf(ident, Gen.const("")), ident, ident, ident))
    val rows = cases.toSeq.toDF("ns", "ver", "kind", "name")
      .select(
        KubeFunctions.buildId(col("ns"), col("ver"), col("kind"), col("name")).as("a"),
        KubeFunctions.buildIdUdf(col("ns"), col("ver"), col("kind"), col("name")).as("b"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("filterAnnotations is idempotent: filtering a filtered map is a no-op") {
    import spark.implicits._
    val keyGen = Gen.oneOf(
      ident,
      ident.map(s => s"kubectl.kubernetes.io/$s"),
      ident.map(s => s"helm.sh/$s"),
      ident.map(s => s"kubernetes.io/$s"))
    val mapGen = Gen.nonEmptyMap(Gen.zip(keyGen, ident))
    samples(mapGen).foreach { m =>
      val once = Seq(m).toDF("m")
        .select(KubeFunctions.filterAnnotations(col("m")).as("f"))
      val r1 = once.collect()(0)
      val first = if (r1.isNullAt(0)) null else r1.getAs[Map[String, String]]("f")
      val r2 = once.select(KubeFunctions.filterAnnotations(col("f")).as("f2")).collect()(0)
      val second = if (r2.isNullAt(0)) null else r2.getAs[Map[String, String]]("f2")
      assert(first == second)
      // and no surviving key carries a noise prefix
      if (first != null)
        assert(first.keys.forall(k =>
          !KubeFunctions.skipAnnotationPrefixes.exists(k.startsWith)))
    }
  }

  test("extractApiGroup returns the prefix for grouped versions, '' otherwise") {
    import spark.implicits._
    val cases = samples(Gen.zip(ident, Gen.option(ident)))
    val rows = cases.map { case (ver, group) =>
      (group.map(g => s"$g/$ver").getOrElse(ver), group.getOrElse(""))
    }.toDF("apiVersion", "expected")
      .select(KubeFunctions.extractApiGroup(col("apiVersion")).as("got"), col("expected"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
