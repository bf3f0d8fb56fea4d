package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression forms of the reference's metadata scalar transforms.
  *
  * These are pure Catalyst `Column` compositions (whole-stage codegen'd), not
  * UDFs; each cites the reference behavior it reproduces
  * (wiggitywhitney/k8s-vectordb-sync, read-only at /root/reference).
  */
object KubeFunctions {

  /** Cluster-scoped resources get the `_cluster` sentinel namespace
    * (reference: internal/metadata/extract.go:33-35).
    */
  def namespaceOrCluster(ns: Column): Column =
    coalesce(nullif(ns, lit("")), lit("_cluster"))

  /** Primary key `namespace/apiVersion/kind/name`
    * (reference: internal/metadata/extract.go:56-58).
    */
  def buildId(ns: Column, apiVersion: Column, kind: Column, name: Column): Column =
    concat_ws("/", namespaceOrCluster(ns), apiVersion, kind, name)

  /** Scala-UDF variant of buildId — the declared UDF surface (SURVEY.md
    * §2.B). The Column-expression form above is the hot path (codegen'd,
    * optimizer-visible); this exists for API parity and as the pattern for
    * logic that genuinely can't be expressed in Columns.
    */
  val buildIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ns: String, apiVersion: String, kind: String, name: String) =>
      val n = if (ns == null || ns.isEmpty) "_cluster" else ns
      // concat_ws skips null segments — mirror that so both forms always
      // produce the same primary key
      (n +: Seq(apiVersion, kind, name).filter(_ != null)).mkString("/")
    }

  /** `"apps/v1" → "apps"`, `"v1" → ""` — the API group is everything before
    * the first '/' when present (reference: internal/metadata/extract.go:62-68).
    */
  def extractApiGroup(apiVersion: Column): Column =
    when(instr(apiVersion, "/") > 0, split(apiVersion, "/").getItem(0))
      .otherwise(lit(""))

  /** Annotation keys dropped as operational noise
    * (reference: internal/metadata/extract.go:72-79).
    */
  val skipAnnotationPrefixes: Seq[String] = Seq(
    "kubectl.kubernetes.io/",
    "meta.helm.sh/",
    "helm.sh/",
    "deployment.kubernetes.io/",
    "control-plane.alpha.kubernetes.io/",
    "kubernetes.io/")

  /** Drop noise-prefixed annotation keys; a fully-filtered (or empty) map
    * becomes NULL (reference: internal/metadata/extract.go:84-101).
    */
  def filterAnnotations(m: Column): Column = {
    val kept = map_filter(m, (k, _) =>
      !skipAnnotationPrefixes
        .map(p => startswith(k, lit(p)))
        .reduce(_ || _))
    when(m.isNull || size(map_keys(kept)) === 0, lit(null)).otherwise(kept)
  }

  /** Serialize a timestamp the way the payload does: UTC ISO-8601 seconds
    * (reference: internal/metadata/extract.go:50). Session TZ is pinned UTC.
    */
  def k8sTimestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Resource-type allowlist/blocklist: a non-empty allowlist wins, else
    * everything minus the blocklist; case-insensitive
    * (reference: internal/filter/filter.go:43-57,75-84).
    */
  def shouldWatch(kind: Column, allow: Seq[String], block: Seq[String]): Column = {
    val k = lower(kind)
    if (allow.nonEmpty) k.isin(allow.map(_.toLowerCase): _*)
    else !k.isin(block.map(_.toLowerCase): _*)
  }

  /** Kind → resource-type string ("Lease" → "leases"): the A2 filter lists
    * hold plural resource types (config.go:52-53) because the reference
    * filters on the GVR resource it gets from API discovery; event rows
    * carry the singular Kind. English-plural heuristic, in rule order:
    *
    *   - irregular built-ins first: "Endpoints" is ALREADY plural (its
    *     resource is `endpoints`, not `endpointses`);
    *   - consonant+y → ies ("NetworkPolicy" → `networkpolicies`, the rule
    *     K8s's own flect pluralizer applies);
    *   - s/x/z/ch/sh → es ("ComponentStatus" → `componentstatuses`);
    *   - else append s.
    *
    * This covers the built-in types — incl. every default exclude and the
    * *Policy families — without a discovery client; a deployment with
    * exotic CRD kinds supplies explicit lists instead.
    */
  def kindToResourceType(kind: Column): Column = {
    val k = lower(kind)
    when(k === "endpoints", k)
      .when(k.rlike("[^aeiou]y$"), regexp_replace(k, "y$", "ies"))
      .when(k.rlike("(s|x|z|ch|sh)$"), concat(k, lit("es")))
      .otherwise(concat(k, lit("s")))
  }
}
