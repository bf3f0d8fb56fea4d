package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the engine's JSONL event log — the custom-
  * source rung of the Spark-native ladder (SURVEY §2.B sources; the
  * streaming twin is `SyncPipeline.fileSource` over the same files).
  * `spark.read.format("graft.sources.EventLogSource").load(dir)`.
  *
  * What makes it a real source rather than a json() wrapper:
  *   - **column pruning reaches the parser**: only the columns Catalyst
  *     asks for are materialized per line (a pruned read of a wide event
  *     log parses 2 fields, not 12 — at 100 TB the difference between a
  *     projection and a full decode);
  *   - **predicate pushdown reaches the scan**: EqualTo / In / IsNotNull
  *     on the string columns are evaluated on the parsed line BEFORE row
  *     construction and reported as pushed, so Catalyst plans no residual
  *     Filter for them;
  *   - **planning is per-file**: one InputPartition per log file (the unit
  *     the streaming source also tails), listed through the Hadoop
  *     FileSystem API so any supported filesystem works.
  *
  * Reference analog: the informer list+watch snapshot (A1,
  * watcher.go:110-145) — this is the batch replay of that stream.
  */
class EventLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Registered via META-INF/services so
    * `spark.read.format("graft-events")` resolves without the class name.
    */
  override def shortName(): String = "graft-events"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventLogSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new EventLogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

/** SQL-friendly alias: `CREATE TABLE ... USING graft_events` (an
  * unquoted SQL identifier can't carry the dash of the DataFrame-side
  * short name).
  */
class GraftEventsProvider extends EventLogSource {
  override def shortName(): String = "graft_events"
}

object EventLogSource {
  /** Fixed event-log schema = the pipeline's ResourceEventRow. */
  val schema: StructType = StructType.fromDDL(
    "event_type STRING, event_seq LONG, ts TIMESTAMP, id STRING, " +
      "namespace STRING, name STRING, kind STRING, apiVersion STRING, " +
      "apiGroup STRING, labels MAP<STRING,STRING>, " +
      "annotations MAP<STRING,STRING>, createdAt TIMESTAMP")

  /** Driver's effective Hadoop conf as a serializable dump, and back —
    * tasks must see the session's spark.hadoop.* settings (credentials,
    * filesystem impls), not a default-constructed Configuration that lists
    * fine on the driver and then fails to open the same path in a task.
    */
  private[sources] def confToMap(
      c: org.apache.hadoop.conf.Configuration): Array[(String, String)] =
    c.iterator().asScala.map(e => e.getKey -> e.getValue).toArray

  private[sources] def mapToConf(
      m: Array[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private[sources] def listFiles(
      dir: String, conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .map(_.getPath.toString)
      .sorted
  }
}

private[sources] class EventLogTable(path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft_events($path)"
  override def schema(): StructType = EventLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val mode = options.getOrDefault("mode", "FAILFAST")
    require(Seq("failfast", "permissive").exists(_.equalsIgnoreCase(mode)),
      s"unsupported mode '$mode' — this source supports FAILFAST and PERMISSIVE")
    new EventLogScanBuilder(path, options.getInt("maxFilesPerTrigger", 0),
      "permissive".equalsIgnoreCase(mode))
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // names AND types: a frame with the right names but wrong types
    // (event_seq as int, ts as string) must fail here at plan time with a
    // field-level message, not later as an executor ClassCastException.
    // catalogString comparison ignores container NULLABILITY on purpose —
    // a frame whose map values happen to be non-nullable (e.g. built from
    // map(lit(k), lit(v))) is safely writable and Spark's output resolver
    // inserts no cast for it, so strict DataType equality would reject it
    // with a message printing two visually identical types
    val got = info.schema().fields.map(f => f.name -> f.dataType)
    val want = EventLogSource.schema.fields.map(f => f.name -> f.dataType)
    require(got.map(_._1).toSeq == want.map(_._1).toSeq,
      s"event-log write needs the full event schema, got ${got.map(_._1).toSeq}")
    val badTypes = got.zip(want).collect {
      case ((n, g), (_, w)) if g.catalogString != w.catalogString =>
        s"$n: ${g.catalogString} (need ${w.catalogString})"
    }
    require(badTypes.isEmpty,
      s"event-log write schema has wrong types: ${badTypes.mkString(", ")}")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new EventLogWrite(path)
    }
  }
}

private[sources] class EventLogScanBuilder(
    path: String, maxFilesPerTrigger: Int, permissive: Boolean)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = EventLogSource.schema
  private var pushed: Array[Filter] = Array.empty

  // exact-evaluation subset only: what we accept we fully enforce in the
  // reader, so Catalyst plans no residual Filter for it
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => stringCol(a)
      case In(a, vs) => stringCol(a) && vs.forall(_.isInstanceOf[String])
      case IsNotNull(a) => stringCol(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def stringCol(a: String): Boolean =
    EventLogSource.schema.fields.exists(f =>
      f.name == a && f.dataType == StringType)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new EventLogScan(path, required, pushed, maxFilesPerTrigger, permissive)
}

private[sources] class EventLogScan(
    path: String, required: StructType, val pushed: Array[Filter],
    maxFilesPerTrigger: Int = 0, permissive: Boolean = false)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-events $path, PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    EventLogSource.listFiles(path, conf)
      .map(f => EventFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(required, pushed,
      EventLogSource.confToMap(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration), permissive)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventLogMicroBatchStream(
      path, required, pushed, maxFilesPerTrigger, permissive)
}

/** Streaming form of the same scan: the offset is "how many files of the
  * sorted listing have been consumed" PLUS the name of the last consumed
  * file, so each micro-batch plans exactly the newly-arrived files and a
  * checkpoint restart resumes from the recorded count — the custom-source
  * analog of the built-in file stream's seen-files log (and of the
  * informer's resourceVersion bookmark, watcher.go:110-145). Assumes the
  * event log is append-only with lexically increasing file names (the
  * writer's contract; the production file stream tracks a seen-set
  * instead, at the cost of unbounded state). The recorded name makes that
  * contract ENFORCED rather than assumed: if a new file ever sorts before
  * an already-consumed one (non-zero-padded counters, an external writer
  * with random names), the consumed prefix of the listing no longer ends
  * at the recorded name and the stream fails loudly instead of silently
  * re-reading consumed files and skipping the new one.
  */
private[sources] class EventLogMicroBatchStream(
    path: String, required: StructType, pushed: Array[Filter],
    maxFilesPerTrigger: Int = 0, permissive: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  /** `last` = file NAME at listing position n-1 ("" when n == 0; null on
    * an offset deserialized from a pre-name checkpoint, which skips the
    * prefix check once and is re-anchored at the next offset advance).
    */
  private case class FileCount(n: Int, last: String) extends Offset {
    override def json(): String = {
      val m = new ObjectMapper
      val node = m.createObjectNode()
      node.put("n", n)
      if (last != null) node.put("last", last)
      m.writeValueAsString(node)
    }
  }

  private def conf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  private def name(f: String): String = new Path(f).getName

  private def offsetAt(files: Seq[String], n: Int): FileCount =
    FileCount(n, if (n == 0) "" else name(files(n - 1)))

  /** Fail loudly when the sorted listing's consumed prefix no longer ends
    * at the offset's recorded file — the append-only/lexical contract was
    * violated and a silent slice would duplicate and drop data.
    */
  private def checkPrefix(files: Seq[String], at: FileCount): Unit = {
    if (at.last != null && at.n > 0) {
      val ok = files.size >= at.n && name(files(at.n - 1)) == at.last
      if (!ok) throw new IllegalStateException(
        s"event-log listing violates the append-only/lexical-name contract: " +
          s"offset says file #${at.n} is '${at.last}' but the listing has " +
          (if (files.size < at.n) s"only ${files.size} files"
           else s"'${name(files(at.n - 1))}' at that position") +
          s" — a file was removed or a new file sorted before a consumed one ($path)")
    }
  }

  // Last COMMITTED offset — lets the no-argument latestOffset() (the
  // non-admission-control engine path, which receives no `start`) run the
  // same prefix check as the SupportsAdmissionControl variant instead of
  // silently computing an end offset from a corrupted listing. Anchored
  // only at commit() (not on every offset handed out): a deserialized
  // pre-name checkpoint must still be accepted once without the check
  // (the legacy-offset contract in EventLogSourceSpec), and the committed
  // offset is the one position the engine has durably acknowledged.
  @volatile private var lastCommitted: FileCount = null

  override def initialOffset(): Offset = FileCount(0, "")
  override def latestOffset(): Offset = {
    val files = EventLogSource.listFiles(path, conf)
    val known = lastCommitted
    if (known != null) checkPrefix(files, known)
    offsetAt(files, files.size)
  }
  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val node = new ObjectMapper().readTree(t)
      FileCount(node.get("n").asInt(),
        if (node.has("last")) node.get("last").asText() else null)
    } else FileCount(t.toInt, null) // pre-name checkpoint format
  }

  // rate limiting (A15's BATCH_MAX_SIZE analog at the source): admit at
  // most maxFilesPerTrigger new files per micro-batch when configured
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val files = EventLogSource.listFiles(path, conf)
    val s = start.asInstanceOf[FileCount]
    checkPrefix(files, s)
    limit match {
      case m: ReadMaxFiles =>
        offsetAt(files, math.min(s.n + m.maxFiles(), files.size))
      case _ => offsetAt(files, files.size)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = EventLogSource.listFiles(path, conf)
    val (s, e) = (start.asInstanceOf[FileCount], end.asInstanceOf[FileCount])
    checkPrefix(files, s)
    checkPrefix(files, e)
    files.slice(s.n, e.n)
      .map(f => EventFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(required, pushed,
      EventLogSource.confToMap(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration), permissive)

  override def commit(end: Offset): Unit = end match {
    // advance-only, names preferred: a replayed older commit or a
    // name-less pre-upgrade offset must not downgrade the anchor (the
    // anchor upgrades to a named one when the first post-upgrade batch
    // lands)
    case fc: FileCount =>
      val cur = lastCommitted
      if (cur == null || fc.n > cur.n || (fc.n == cur.n && fc.last != null))
        lastCommitted = fc
    case _ => ()
  }
  override def stop(): Unit = ()
}

private[sources] case class EventFilePartition(file: String) extends InputPartition

private[sources] class EventLogReaderFactory(
    required: StructType, pushed: Array[Filter],
    hadoopConf: Array[(String, String)], permissive: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EventLogReader(
      partition.asInstanceOf[EventFilePartition].file, required, pushed,
      hadoopConf, permissive)
}

/** Line-at-a-time reader: parse JSON, evaluate pushed predicates on the
  * node, materialize only the required columns.
  */
private[sources] class EventLogReader(
    file: String, required: StructType, pushed: Array[Filter],
    hadoopConf: Array[(String, String)], permissive: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper
  private val fs = new Path(file).getFileSystem(
    EventLogSource.mapToConf(hadoopConf))
  private val stream = fs.open(new Path(file))
  private val lines = scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        // PERMISSIVE (option mode=permissive): a malformed line — invalid
        // JSON, a non-object, or a field that fails conversion (bad
        // timestamp text) — is skipped instead of failing the task: a
        // 100 TB log always carries a truncated tail or corrupt record
        // somewhere. Default stays FAILFAST: silent skipping is the wrong
        // default for a sync pipeline's source of record.
        if (permissive) {
          try {
            val node = mapper.readTree(line)
            if (node.isObject && passes(node)) current = toRow(node)
          } catch { case scala.util.control.NonFatal(_) => () }
        } else {
          val node = mapper.readTree(line)
          // a valid-JSON non-object ('42', '[1]') must FAIL here, not
          // fabricate an all-null row — silent fabrication is worse than
          // the silent skipping the mode exists to prevent
          if (!node.isObject)
            throw new java.io.IOException(
              s"event-log line is not a JSON object: $line")
          if (passes(node)) current = toRow(node)
        }
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()

  private def str(node: JsonNode, field: String): String = {
    val v = node.get(field)
    if (v == null || v.isNull) null else v.asText()
  }

  private def passes(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(a, v: String) => str(node, a) == v
    case In(a, vs) => { val s = str(node, a); s != null && vs.contains(s) }
    case IsNotNull(a) => str(node, a) != null
    case _ => true // unreachable: only the accepted subset is ever pushed
  }

  private def toRow(node: JsonNode): InternalRow = {
    val values = required.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case StringType => UTF8String.fromString(v.asText())
        case LongType => v.asLong()
        case TimestampType => parseTsMicros(v.asText())
        case MapType(StringType, StringType, _) =>
          val entries = v.fields().asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(
              entries.map(e => UTF8String.fromString(e.getKey): Any).toArray),
            new GenericArrayData(
              entries.map(e => UTF8String.fromString(e.getValue.asText()): Any).toArray))
        case other => throw new IllegalStateException(s"unhandled type $other")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  /** ISO-8601 (what Spark's json writer emits with session TZ UTC) →
    * epoch micros.
    */
  private def parseTsMicros(s: String): java.lang.Long = {
    val odt =
      try java.time.OffsetDateTime.parse(s)
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            .atOffset(java.time.ZoneOffset.UTC)
      }
    odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L
  }
}

/** Batch write half of the connector: each task serializes its rows to a
  * hidden `.json.tmp` file; the DRIVER commit renames every task file to
  * its visible `.json` name in one pass, and abort deletes the temps. The
  * reader (batch and streaming) lists only `*.json`, so a write is
  * all-or-nothing from any concurrent reader's point of view — the same
  * temp-then-rename protocol the built-in file committers use, expressed
  * through the V2 commit messages. File names are epoch-prefixed so the
  * streaming source's "sorted order = arrival order" contract holds for
  * successive commits.
  */
private[sources] class EventLogWrite(path: String)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // captured on the driver at write-plan time; shipped to every task
  private val hadoopConf = EventLogSource.confToMap(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new EventLogWriterFactory(path, nextEpoch(), hadoopConf)

  /** Batch epochs must be strictly increasing across commits to the same
    * directory or the streaming reader's "sorted file order = commit
    * order" contract breaks: two commits inside one millisecond (or a
    * clock-skewed writer) would share an epoch prefix. Take
    * max(now, max existing epoch + 1) from the directory's current names —
    * monotonic under same-process rapid commits and under modest clock
    * skew between serialized writers.
    */
  private def nextEpoch(): Long = {
    val conf = EventLogSource.mapToConf(hadoopConf)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val maxExisting =
      if (!fs.exists(dir)) -1L
      else fs.listStatus(dir).foldLeft(-1L) { (acc, st) =>
        val n = st.getPath.getName
        // visible and temp names both start with part-<13-digit epoch>-
        if (st.isFile && n.startsWith("part-") && n.length > 18 &&
            n.charAt(18) == '-' && n.substring(5, 18).forall(_.isDigit))
          math.max(acc, n.substring(5, 18).toLong)
        else acc
      }
    math.max(System.currentTimeMillis(), maxExisting + 1L)
  }

  /** Streaming form. VISIBLE file names derive from (epochId, partition)
    * — never the task attempt — while each attempt writes its own
    * attempt-unique temp (speculative/retried attempts of one partition
    * cannot clobber each other's in-flight files). Commit first removes
    * every visible file of the epoch, then renames the new set in: a
    * replayed epoch (checkpoint restart before its commit was recorded)
    * therefore ends up with EXACTLY the replay's file set even when the
    * replay's partitioning differs — no stale file from a partition that
    * vanished on retry. Exactly-once by idempotent naming, the same
    * contract as the pipeline's idempotent REST upserts.
    *
    * Ownership contract (as with Spark's built-in file sink): the output
    * directory belongs to ONE streaming query; mixing batch writes or a
    * second query in the same directory breaks both the epoch-name space
    * and the reader's sorted-order offset assumption. Composition caveat:
    * a count-offset EventLogSource READER tailing this sink's directory
    * sees the replayed epoch's file set swap during the first commit after
    * a sink restart — readers should tail append-only logs (the pipeline's
    * actual topology); chaining reader-on-sink-dir needs a manifest-based
    * sink (Spark's built-in file sink) for a seamless replay window.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      override def createStreamingWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
        // a standalone factory: an anonymous inner class here would drag
        // this non-serializable Write into every task closure
        new EventLogStreamingWriterFactory(path, hadoopConf)
      // only the FIRST commit after (re)start can be an epoch replay —
      // every later epoch id is fresh by construction — so the pre-clean
      // listing runs once per query run, not once per micro-batch
      private var firstCommit = true
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
        if (firstCommit) {
          // remove the replayed epoch's previous visible files so the
          // committed set is exactly this attempt's — not a union with an
          // earlier attempt that may have partitioned differently
          val conf = EventLogSource.mapToConf(hadoopConf)
          val dir = new Path(path)
          val fs = dir.getFileSystem(conf)
          val prefix = f"part-$epochId%013d-"
          if (fs.exists(dir))
            fs.listStatus(dir).foreach { st =>
              val n = st.getPath.getName
              if (st.isFile && n.startsWith(prefix) && n.endsWith(".json"))
                fs.delete(st.getPath, false)
            }
          firstCommit = false
        }
        EventLogWrite.this.commitRenames(messages)
      }
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        EventLogWrite.this.abort(messages)
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    commitRenames(messages)

  /** Rename every task's temp to its visible name. A pre-existing
    * destination makes the rename fail loudly: streaming replays are
    * handled BEFORE this point by the first-commit pre-clean (see
    * toStreaming), and on the batch path a collision is a genuine bug
    * (nextEpoch makes honest concurrent commits impossible to collide).
    */
  private def commitRenames(messages: Array[WriterCommitMessage]): Unit = {
    val conf = EventLogSource.mapToConf(hadoopConf)
    messages.foreach {
      case EventFileCommit(tmp, dst) if tmp.nonEmpty =>
        val t = new Path(tmp)
        val fs = t.getFileSystem(conf)
        val d = new Path(dst)
        // Hadoop rename reports most failures by RETURNING FALSE, not
        // throwing — an unchecked rename would "commit" rows into a .tmp
        // file no reader ever lists (silent data loss)
        if (!fs.rename(t, d))
          throw new java.io.IOException(s"commit rename failed for $tmp")
      case _ => ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = EventLogSource.mapToConf(hadoopConf)
    messages.foreach {
      case EventFileCommit(tmp, _) if tmp.nonEmpty =>
        val t = new Path(tmp)
        t.getFileSystem(conf).delete(t, false)
      case _ => ()
    }
  }
}

private[sources] case class EventFileCommit(tmpPath: String, dstPath: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class EventLogStreamingWriterFactory(
    path: String, hadoopConf: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    // temp carries the ATTEMPT (taskId) so concurrent attempts never share
    // a file; the visible name carries only (epoch, partition) so replays
    // land on identical names
    new EventLogWriter(path,
      tmpName = f"part-$epochId%013d-$partitionId%05d-$taskId.json.tmp",
      dstName = f"part-$epochId%013d-$partitionId%05d.json",
      hadoopConf)
}

private[sources] class EventLogWriterFactory(
    path: String, epoch: Long, hadoopConf: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new EventLogWriter(path,
      tmpName = f"part-$epoch%013d-$partitionId%05d-$taskId.json.tmp",
      dstName = f"part-$epoch%013d-$partitionId%05d-$taskId.json",
      hadoopConf)
}

/** Serializes rows back to the exact line shape the reader parses —
  * Jackson handles escaping, timestamps round-trip through ISO instants.
  * Lines stream straight to the task's temp file (opened at first row) so
  * writer memory is one row, not one partition.
  */
private[sources] class EventLogWriter(
    dir: String, tmpName: String, dstName: String,
    hadoopConf: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage

  private val mapper = new ObjectMapper
  private val schema = EventLogSource.schema
  private val tmp = new Path(dir, tmpName)
  private val dst = new Path(dir, dstName)
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var created = false // file may exist even when a first write threw
  private var rows = 0

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case LongType => node.put(f.name, row.getLong(i))
        case TimestampType =>
          val us = row.getLong(i)
          node.put(f.name, java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L).toString)
        case MapType(StringType, StringType, _) =>
          val m = row.getMap(i)
          val o = node.putObject(f.name)
          (0 until m.numElements()).foreach { j =>
            o.put(
              m.keyArray().getUTF8String(j).toString,
              m.valueArray().getUTF8String(j).toString)
          }
        case other => throw new IllegalStateException(s"unhandled type $other")
      }
    }
    if (out == null) {
      out = tmp.getFileSystem(EventLogSource.mapToConf(hadoopConf))
        .create(tmp, true)
      created = true
    }
    out.write((mapper.writeValueAsString(node) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    close()
    if (rows == 0) EventFileCommit("", "")
    else EventFileCommit(tmp.toString, dst.toString)
  }

  override def abort(): Unit = {
    close()
    // keyed on `created`, not rows: a first-row write that threw after
    // opening the stream must not leave an orphan temp behind
    if (created)
      tmp.getFileSystem(EventLogSource.mapToConf(hadoopConf))
        .delete(tmp, false)
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}
