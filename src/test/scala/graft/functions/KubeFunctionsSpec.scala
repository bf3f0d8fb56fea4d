package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's unit coverage for the metadata scalar transforms
  * (extract_test.go, filter_test.go — SURVEY.md §5 tier 1).
  */
class KubeFunctionsSpec extends SparkSpec {
  import KubeFunctions._

  private def one[T](c: org.apache.spark.sql.Column): T = {
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")
  }

  test("buildId joins namespace/apiVersion/kind/name") {
    assert(one[String](buildId(lit("default"), lit("apps/v1"), lit("Deployment"), lit("nginx")))
      == "default/apps/v1/Deployment/nginx")
  }

  test("cluster-scoped resources get the _cluster sentinel namespace") {
    assert(one[String](buildId(lit(""), lit("v1"), lit("Namespace"), lit("kube-system")))
      == "_cluster/v1/Namespace/kube-system")
    assert(one[String](namespaceOrCluster(lit(null).cast("string"))) == "_cluster")
  }

  test("buildIdUdf matches the expression form when a segment is null") {
    import spark.implicits._
    val row = Seq(("default", "apps/v1", null: String, "nginx"))
      .toDF("ns", "ver", "kind", "name")
      .select(
        KubeFunctions.buildId(col("ns"), col("ver"), col("kind"), col("name")).as("a"),
        KubeFunctions.buildIdUdf(col("ns"), col("ver"), col("kind"), col("name")).as("b"))
      .collect()(0)
    assert(row.getString(0) == row.getString(1)) // both skip the null segment
    assert(row.getString(0) == "default/apps/v1/nginx")
  }

  test("extractApiGroup splits grouped versions and empties core") {
    assert(one[String](extractApiGroup(lit("apps/v1"))) == "apps")
    assert(one[String](extractApiGroup(lit("v1"))) == "")
    assert(one[String](extractApiGroup(lit("cert-manager.io/v1"))) == "cert-manager.io")
  }

  test("filterAnnotations drops noise prefixes, keeps the rest, nulls empties") {
    val m = map(
      lit("kubectl.kubernetes.io/last-applied-configuration"), lit("x"),
      lit("meta.helm.sh/release-name"), lit("y"),
      lit("description"), lit("Main web server"),
      lit("app.kubernetes.io/managed-by"), lit("Helm"))
    val kept = one[Map[String, String]](filterAnnotations(m))
    assert(kept == Map("description" -> "Main web server",
      "app.kubernetes.io/managed-by" -> "Helm"))
    // fully filtered → NULL, not empty map (extract.go:84-101)
    val allNoise = map(lit("helm.sh/chart"), lit("z"))
    val row = spark.range(1).select(filterAnnotations(allNoise).as("v")).collect()(0)
    assert(row.isNullAt(0))
  }

  test("shouldWatch: non-empty allowlist wins, else blocklist; case-insensitive") {
    def check(kind: String, allow: Seq[String], block: Seq[String]): Boolean =
      spark.range(1).select(shouldWatch(lit(kind), allow, block).as("v"))
        .collect()(0).getBoolean(0)
    assert(check("Pods", Seq("pods"), Seq("pods"))) // allowlist beats blocklist
    assert(!check("secrets", Seq("pods"), Nil))
    assert(!check("Events", Nil, Seq("events")))
    assert(check("widgets", Nil, Seq("events")))
  }

  test("kindToResourceType pluralizes every default-exclude kind correctly") {
    def conv(kind: String): String =
      spark.range(1).select(kindToResourceType(lit(kind)).as("v"))
        .collect()(0).getString(0)
    assert(conv("Lease") == "leases")
    assert(conv("Event") == "events")
    assert(conv("EndpointSlice") == "endpointslices")
    assert(conv("ComponentStatus") == "componentstatuses")
    assert(conv("CustomResourceDefinition") == "customresourcedefinitions")
    assert(conv("Deployment") == "deployments")
    assert(conv("Ingress") == "ingresses")
    // irregular + y-rule built-ins (the real K8s resource strings)
    assert(conv("Endpoints") == "endpoints") // already plural, not endpointses
    assert(conv("NetworkPolicy") == "networkpolicies")
    assert(conv("PodSecurityPolicy") == "podsecuritypolicies")
    assert(conv("Gateway") == "gateways") // vowel+y is a plain s
  }
}
