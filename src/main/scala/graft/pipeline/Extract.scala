package graft.pipeline

import graft.functions.KubeFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-on-read projection of raw K8s-shaped objects into the fixed
  * 9-field instance record (reference: internal/metadata/extract.go:31-52).
  *
  * Input is semi-structured (arbitrary `kind`/`apiVersion` +
  * `metadata.{name,namespace,labels,annotations,creationTimestamp}`); the
  * projection is a pure `select` of Column expressions, so Catalyst prunes
  * every other input column at the scan (the reference's "never read
  * spec/status" rule becomes ColumnPruning for free).
  */
object Extract {

  /** Schema-on-read contract for raw K8s-shaped JSON: only the fields the
    * projection touches; labels/annotations as maps (JSON schema inference
    * would type them as structs of observed keys — wrong for open maps).
    */
  val rawSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "kind STRING, apiVersion STRING, " +
        "metadata STRUCT<name: STRING, namespace: STRING, " +
        "labels: MAP<STRING,STRING>, annotations: MAP<STRING,STRING>, " +
        "creationTimestamp: STRING>")

  /** Raw object DataFrame (e.g. `spark.read.json` of a cluster snapshot)
    * → instance records. Expects columns `kind`, `apiVersion`, and a
    * `metadata` struct; missing/null fields degrade like the reference
    * (empty namespace → `_cluster`, filtered-empty annotations → NULL).
    */
  def instances(raw: DataFrame): DataFrame = {
    val ns = col("metadata.namespace")
    raw.select(
      buildId(ns, col("apiVersion"), col("kind"), col("metadata.name")).as("id"),
      namespaceOrCluster(ns).as("namespace"),
      col("metadata.name").as("name"),
      col("kind"),
      col("apiVersion"),
      extractApiGroup(col("apiVersion")).as("apiGroup"),
      col("metadata.labels").as("labels"),
      filterAnnotations(col("metadata.annotations")).as("annotations"),
      to_timestamp(col("metadata.creationTimestamp")).as("createdAt"))
  }

  /** Batch change detection (reference: watcher.go:315-331 / A10), the
    * resync-path diff: compare a new full snapshot against the previously
    * synced state and emit exactly what must be sent.
    *
    *   - upsert: id absent from prev, or labels/annotations differ
    *   - delete: id present in prev, absent from new
    *
    * Implemented as one full-outer join on the key — a single shuffle on
    * `id`; at 100 TB both sides would be bucketed by id making this
    * shuffle-free. Map equality uses canonical sorted-entry serialization
    * (map key order is undefined in both engines).
    */
  def diff(newSnap: DataFrame, prev: DataFrame): DataFrame = {
    // a null map normalizes to the EMPTY map before serializing, so
    // null-vs-{} transitions read as unchanged — the same contract as the
    // streaming path's metadataUnchanged and the reference's
    // mapsEqual(nil, empty) (watcher.go:315-331); normalization also keeps
    // both concat_ws operands non-null, so the two fields can never
    // collapse into an ambiguous signature
    def sig(labels: org.apache.spark.sql.Column, ann: org.apache.spark.sql.Column) = {
      def norm(m: org.apache.spark.sql.Column) =
        to_json(array_sort(map_entries(
          coalesce(m, typedLit(Map.empty[String, String])))))
      concat_ws("#", norm(labels), norm(ann))
    }
    val n = newSnap.select(
      col("id").as("n_id"),
      sig(col("labels"), col("annotations")).as("n_sig"))
    val p = prev.select(
      col("id").as("p_id"),
      sig(col("labels"), col("annotations")).as("p_sig"))
    n.join(p, col("n_id") === col("p_id"), "full_outer")
      .select(
        coalesce(col("n_id"), col("p_id")).as("id"),
        when(col("p_id").isNull, lit("upsert-new"))
          .when(col("n_id").isNull, lit("delete"))
          .when(col("n_sig") =!= col("p_sig"), lit("upsert-changed"))
          .otherwise(lit("unchanged")).as("action"))
      .filter(col("action") =!= "unchanged")
  }
}
