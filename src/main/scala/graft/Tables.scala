package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst handles column pruning and
  * predicate pushdown, so every query in the catalog reads only the columns
  * and row groups it needs. The one wrinkle is `events.ts`, whose physical
  * encoding has drifted across testdata generations (TIMESTAMP(NANOS), then
  * TIMESTAMP(MICROS) without UTC adjustment). The loader adapts to whatever
  * the footer actually declares and always yields a session-TZ (UTC)
  * `timestamp` column at microsecond precision, matching DuckDB's view of
  * the same file on the oracle side.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Inferred parquet schema per path — the metastore a deployment would
    * have (guide §6 caches listings for the same reason). A bare
    * `spark.read.parquet(p)` runs a schema-inference JOB on every call,
    * so each catalog query paid ~25 ms × its table count × every bench
    * pass re-deriving the same immutable fixture schemas. Keyed by path
    * (warmup and target sf dirs differ); holds SCHEMAS only — data is
    * re-scanned from parquet on every action, nothing result-shaped is
    * memoized.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]

  /** Footer ts-is-NANOS decision per events path — same immutable-fixture
    * metadata class as [[schemaCache]].
    */
  private val nanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]

  private def readCached(spark: SparkSession, p: String): DataFrame = {
    val cached = schemaCache.get(p)
    if (cached != null) spark.read.schema(cached).parquet(p)
    else {
      val df = spark.read.parquet(p)
      schemaCache.put(p, df.schema)
      df
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    name match {
      case "events" => events(spark, dir)
      case _        => readCached(spark, path(dir, name))
    }
  }

  /** Schema-adaptive `events` loader. Branches on the type Spark infers for
    * `ts` from the parquet footer:
    *
    *   - `TimestampType` (µs, adjusted-to-UTC): pass through.
    *   - `TimestampNTZType` (µs, wall-clock): cast to `TimestampType` — the
    *     session TZ is pinned UTC in every entry point, so the instant is
    *     preserved bit-for-bit.
    *   - `LongType` / NANOS footer: Spark has no nanosecond timestamp, so
    *     re-read under `spark.sql.legacy.parquet.nanosAsLong` and
    *     floor-divide to microseconds (DuckDB's ns→µs truncation). The
    *     legacy conf is only touched on this branch, and restored after —
    *     loading a table must not mutate session state as a side effect.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    eventsFrom(spark, path(dir, "events"))
  }

  private[graft] def eventsFrom(spark: SparkSession, p: String): DataFrame = {
    import org.apache.spark.sql.types._
    val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

    // A TIMESTAMP(NANOS) footer fails Spark's schema inference outright
    // unless the legacy conf is on, so the branch must be decided BEFORE the
    // first read. Probe the footer directly (one file's metadata, not a
    // scan) rather than string-matching the inference exception — exception
    // text varies across Spark versions and locales; the footer is the
    // ground truth the exception was a proxy for.
    def tsIsNanos: Boolean = {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(conf)
      // RECURSIVE file walk: a Hive-partitioned or otherwise nested events
      // layout keeps its data files a directory level (or more) down — a
      // top-level-only listing would find nothing, silently answer "not
      // nanos", and hand a nanos footer to the plain read, which then
      // fails inference with no recovery path
      def firstDataFile(dir: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
        // visibility matches Spark's partition discovery: every RELATIVE
        // path segment (not just the leaf) must be free of the _/. hidden
        // prefixes — otherwise the probe can pick a file under
        // _spark_metadata or a .staging dir that spark.read itself ignores
        // and branch the nanos decision on the wrong schema
        val rootUri = dir.toUri.getPath.stripSuffix("/")
        def visible(p: org.apache.hadoop.fs.Path): Boolean =
          p.toUri.getPath.stripPrefix(rootUri).split('/')
            .filter(_.nonEmpty)
            .forall(seg => !seg.startsWith("_") && !seg.startsWith("."))
        val it = fs.listFiles(dir, true)
        var found: Option[org.apache.hadoop.fs.Path] = None
        while (found.isEmpty && it.hasNext) {
          val q = it.next().getPath
          if (q.getName.endsWith(".parquet") && visible(q))
            found = Some(q)
        }
        found
      }
      val dataFile =
        if (fs.getFileStatus(root).isFile) Some(root)
        else firstDataFile(root)
      dataFile.exists { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          val schema = r.getFooter.getFileMetaData.getSchema
          schema.containsField("ts") && {
            val t = schema.getType(schema.getFieldIndex("ts"))
            t.isPrimitive && (t.asPrimitiveType().getLogicalTypeAnnotation match {
              case ann: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                ann.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
              case _ => false
            })
          }
        } finally r.close()
      }
    }

    def readNanosAsLong(): DataFrame = Tables.synchronized {
      // the set/restore window mutates SESSION-global conf — serialize it so
      // a concurrent events load on another thread of the same session can't
      // observe (or clobber) the transient value
      val prev = spark.conf.getOption(NanosConf)
      spark.conf.set(NanosConf, "true")
      try {
        val df = spark.read.parquet(p)
        // Force schema resolution while the conf is set; the scan itself
        // re-reads the conf at planning time, so pin it via a fresh read.
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      } finally {
        prev match {
          case Some(v) => spark.conf.set(NanosConf, v)
          case None    => spark.conf.unset(NanosConf)
        }
      }
    }

    // cache the footer decision per path (immutable fixtures; the probe
    // re-opens a footer per events load otherwise)
    val nanos = nanosCache.computeIfAbsent(p, _ => tsIsNanos)
    if (nanos) return readNanosAsLong()
    val raw = readCached(spark, p)

    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other at $p; " +
            "expected TIMESTAMP(NANOS) long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
