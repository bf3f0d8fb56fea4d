package graft.queries

import graft.{Canon, Tables}
import graft.functions.KubeFunctions
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.B): string, date/time, math,
  * array, map, JSON, conditional — every one a codegen'd built-in, never a
  * UDF, so each query stays inside one WholeStageCodegen span over the scan.
  * The kube-flavored queries exercise the reference's extract.go scalar
  * semantics (buildID, apiGroup parse, `_cluster` default, annotation
  * filter, payload timestamp format) through the same Column functions the
  * sync pipeline uses.
  */
object ScalarQueries {
  import Canon._

  val qs: Seq[GQuery] = Seq(
    GQuery(
      "q_fn_string",
      (s, dir) => {
        Tables.customer(s, dir)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("up"),
            length(col("c_name")).as("len"),
            substring(col("c_name"), 1, 8).as("sub"),
            instr(col("c_name"), "#").as("pos"),
            element_at(split(col("c_name"), "#"), 2).as("numpart"),
            concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("rex"),
            regexp_replace(col("c_name"), "[0-9]+", "#").as("rep"),
            lpad(col("c_mktsegment"), 12, "_").as("lp"),
            translate(col("c_name"), "0123456789", "abcdefghij").as("tr"),
            levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
            startswith(col("c_name"), lit("Customer")).cast("int").as("sw"),
            trim(lower(col("c_mktsegment"))).as("lowseg"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             upper(c_name) AS up,
             length(c_name) AS len,
             substring(c_name, 1, 8) AS sub,
             strpos(c_name, '#') AS pos,
             string_split(c_name, '#')[2] AS numpart,
             concat_ws('-', c_mktsegment, c_name) AS cw,
             regexp_extract(c_name, '([0-9]+)', 1) AS rex,
             regexp_replace(c_name, '[0-9]+', '#', 'g') AS rep,
             lpad(c_mktsegment, 12, '_') AS lp,
             translate(c_name, '0123456789', 'abcdefghij') AS tr,
             levenshtein(c_mktsegment, 'BUILDING') AS lev,
             CAST(starts_with(c_name, 'Customer') AS INT) AS sw,
             trim(lower(c_mktsegment)) AS lowseg
             FROM customer ORDER BY c_custkey""")),

    GQuery(
      "q_fn_datetime",
      (s, dir) => {
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            quarter(col("o_orderdate")).as("q"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            fmtTs(date_trunc("month", col("o_orderdate"))).as("month_start"),
            datediff(to_date(lit("2000-01-01")), col("o_orderdate").cast("date")).as("days_to_2k"),
            date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"),
            KubeFunctions.k8sTimestamp(col("o_orderdate")).as("k8s_ts"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             date_part('year', o_orderdate) AS y,
             date_part('month', o_orderdate) AS m,
             date_part('day', o_orderdate) AS d,
             date_part('quarter', o_orderdate) AS q,
             strftime(o_orderdate, '%Y-%m') AS ym,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_2k,
             CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
             strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS k8s_ts
             FROM orders ORDER BY o_orderkey""")),

    GQuery(
      "q_fn_math",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 1).as("r1"),
            r4(abs(col("l_discount") - col("l_tax"))).as("ab"),
            ceil(col("l_extendedprice")).as("ce"),
            floor(col("l_extendedprice")).as("fl"),
            pow(col("l_quantity"), 2).as("pw"),
            r4(sqrt(col("l_extendedprice"))).as("sq"),
            r4(exp(col("l_discount"))).as("ex"),
            r4(log(col("l_extendedprice") + 1)).as("ln"),
            least(col("l_extendedprice"), lit(1000.0)).as("lst"),
            greatest(col("l_quantity"), lit(25.0)).as("grt"),
            pmod(col("l_orderkey"), lit(7)).as("md"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice, 1) AS r1,
             round(abs(l_discount - l_tax), 4) AS ab,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             pow(l_quantity, 2) AS pw,
             round(sqrt(l_extendedprice), 4) AS sq,
             round(exp(l_discount), 4) AS ex,
             round(ln(l_extendedprice + 1), 4) AS ln,
             least(l_extendedprice, 1000.0) AS lst,
             greatest(l_quantity, 25.0) AS grt,
             l_orderkey % 7 AS md
             FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    GQuery(
      "q_fn_array",
      (s, dir) => {
        val toks = split(lower(trim(col("text"))), "\\s+")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            size(toks).as("n_toks"),
            array_contains(toks, "spark").cast("int").as("has_spark"),
            aggregate(toks, lit(0), (a, x) => a + length(x)).as("char_sum"),
            size(array_distinct(toks)).as("n_distinct"),
            array_join(slice(sort_array(array_distinct(toks)), 1, 5), ",").as("first5"),
            size(filter(toks, x => length(x) > 4)).as("n_long"),
            element_at(transform(toks, x => concat(x, lit("!"))), 1).as("bang1"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
             SELECT doc_id,
             len(toks) AS n_toks,
             CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS INT) AS char_sum,
             len(list_distinct(toks)) AS n_distinct,
             array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5,
             len(list_filter(toks, x -> length(x) > 4)) AS n_long,
             (list_transform(toks, x -> x || '!'))[1] AS bang1
             FROM d ORDER BY doc_id""")),

    GQuery(
      "q_fn_map",
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("int")
        val m = map(lit("k"), k, lit("u"), col("user_id").cast("int"))
        Tables.events(s, dir)
          .select(
            col("event_id"),
            array_join(sort_array(map_keys(m)), ",").as("keys"),
            element_at(m, "k").as("k_val"),
            size(map_filter(m, (_, v) => v > 50)).as("n_big"),
            element_at(
              map_concat(m, map(lit("z"), lit(0))), "z").as("z_val"),
            size(map_from_entries(
              arrays_zip(map_keys(m), map_values(m)))).as("n_entries"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             'k,u' AS keys,
             CAST(regexp_extract(props, ': *([0-9]+)', 1) AS INT) AS k_val,
             (CASE WHEN CAST(regexp_extract(props, ': *([0-9]+)', 1) AS INT) > 50
                   THEN 1 ELSE 0 END +
              CASE WHEN user_id > 50 THEN 1 ELSE 0 END) AS n_big,
             0 AS z_val,
             2 AS n_entries
             FROM events ORDER BY event_id""")),

    GQuery(
      "q_fn_json",
      (s, dir) => {
        val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
        Tables.events(s, dir)
          .select(
            col("event_type"),
            parsed.getField("k").as("k_struct"),
            get_json_object(col("props"), "$.k").cast("int").as("k_path"))
          .groupBy("event_type")
          .agg(
            sum(col("k_struct")).as("sum_k"),
            sum(col("k_path")).as("sum_k2"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             CAST(SUM(CAST(regexp_extract(props, ': *([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k,
             CAST(SUM(CAST(regexp_extract(props, ': *([0-9]+)', 1) AS INT)) AS BIGINT) AS sum_k2,
             count(*) AS n
             FROM events GROUP BY 1 ORDER BY 1""")),

    GQuery(
      "q_fn_conditional",
      (s, dir) => {
        Tables.customer(s, dir)
          .select(
            col("c_custkey"),
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 1000, "low")
              .otherwise("high").as("cat"),
            coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
            isnull(nullif(col("c_mktsegment"), lit("MACHINERY"))).cast("int").as("is_mach"),
            expr("nvl2(nullif(c_mktsegment, 'AUTOMOBILE'), 'kept', 'auto')").as("nv"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 1000 THEN 'low'
                  ELSE 'high' END AS cat,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
             CAST(nullif(c_mktsegment, 'MACHINERY') IS NULL AS INT) AS is_mach,
             CASE WHEN nullif(c_mktsegment, 'AUTOMOBILE') IS NOT NULL
                  THEN 'kept' ELSE 'auto' END AS nv
             FROM customer ORDER BY c_custkey""")),

    GQuery(
      "q_kube_id",
      (s, dir) => {
        // extract.go scalar semantics (buildID :56-58, _cluster :33-35,
        // apiGroup :62-68) exercised over the documents table shape.
        val ns = when(col("source") === "src0", lit("")).otherwise(col("source"))
        val av = when(col("lang") === "de", lit("apps/v1")).otherwise(lit("v1"))
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            KubeFunctions.buildId(ns, av, lit("Document"), col("doc_id").cast("string")).as("id"),
            KubeFunctions.extractApiGroup(av).as("api_group"),
            KubeFunctions.namespaceOrCluster(ns).as("ns"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id,
               CASE WHEN source = 'src0' THEN '' ELSE source END AS ns,
               CASE WHEN lang = 'de' THEN 'apps/v1' ELSE 'v1' END AS av
             FROM documents)
             SELECT doc_id,
               concat_ws('/', CASE WHEN ns = '' THEN '_cluster' ELSE ns END,
                         av, 'Document', CAST(doc_id AS VARCHAR)) AS id,
               CASE WHEN strpos(av, '/') > 0 THEN string_split(av, '/')[1]
                    ELSE '' END AS api_group,
               CASE WHEN ns = '' THEN '_cluster' ELSE ns END AS ns
             FROM d ORDER BY doc_id""")),

    GQuery(
      "q_kube_annotations",
      (s, dir) => {
        // filterAnnotations semantics (extract.go:84-101): noise-prefixed
        // keys drop; a fully-filtered map becomes NULL.
        val noisy = map(
          lit("kubectl.kubernetes.io/last-applied-configuration"), col("text"),
          lit("helm.sh/chart"), col("lang"))
        val mixed = map_concat(noisy, map(lit("description"), col("source")))
        val anns = when(col("doc_id") % 2 === 0, noisy).otherwise(mixed)
        val kept = KubeFunctions.filterAnnotations(anns)
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            when(kept.isNull, lit("NULL"))
              .otherwise(array_join(sort_array(map_keys(kept)), ",")).as("kept_keys"),
            element_at(kept, "description").as("descr"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'NULL' ELSE 'description' END AS kept_keys,
             CASE WHEN doc_id % 2 = 0 THEN NULL ELSE source END AS descr
             FROM documents ORDER BY doc_id""")),

    GQuery(
      "q_fn_generator",
      (s, dir) => {
        // The generator surface beyond plain explode: posexplode_OUTER
        // null-completes rows whose array is empty (every 7th doc here) —
        // the LEFT JOIN of the generator family, needed whenever the
        // parent row must survive an empty fan-out (docs with no frames,
        // events with no tags). pos is the engine-maintained ordinal.
        import graft.functions.TextFunctions.tokens
        val arr = when(col("doc_id") % 7 === 0, array().cast("array<string>"))
          .otherwise(slice(tokens(col("text")), 1, 3))
        Tables.documents(s, dir)
          .select(col("doc_id"), arr.as("arr"))
          .select(col("doc_id"), posexplode_outer(col("arr")).as(Seq("pos", "tok")))
          .orderBy(col("doc_id"), col("pos").asc_nulls_first)
      },
      Some(s"""WITH d AS (SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
                     ELSE (${TextQueries.duckToks})[1:3] END AS arr
                FROM documents)
              SELECT doc_id, CAST(i - 1 AS INT) AS pos, arr[i] AS tok
              FROM d, UNNEST(range(1, len(arr) + 1)) AS t(i)
              WHERE len(arr) > 0
              UNION ALL
              SELECT doc_id, NULL, NULL FROM d WHERE len(arr) = 0
              ORDER BY doc_id, pos NULLS FIRST""")))
}
