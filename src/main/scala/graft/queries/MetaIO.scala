package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession

/** Driver-side I/O for the stores' single-row meta parquet dirs.
  *
  * Every store verb reads (and most write) a one-row, one-file parquet
  * under its meta dir. Doing that through `spark.read.parquet(...).head`
  * costs a file-listing plus TWO Spark jobs (schema inference + the head
  * action), and `Seq(...).toDF.coalesce(1).write.parquet` a Spark job plus
  * the Hadoop commit protocol — pure fixed overhead on every verb and on
  * every sync-loop micro-batch (guide §1.2: remove work that isn't the
  * computation). A one-row record needs neither an executor nor a commit
  * protocol (the stores' own marker files are the commit points), so this
  * reads/writes it directly on the driver with parquet-hadoop.
  *
  * FORMAT-COMPATIBLE both ways: [[readHead]] reads any parquet (including
  * meta written by Spark in earlier rounds — the schema-evolution paths
  * keep working), and [[writeRow]] emits standard parquet (3-level LIST
  * lists, UTF8 strings) that `spark.read.parquet` and DuckDB read back
  * unchanged. On-disk layout is identical minus Spark's `_SUCCESS` (the
  * stores never consult it; their commit marker is [[EpochStore.CommitMarker]]).
  */
private[graft] object MetaIO {

  /** Typed array wrappers so [[writeRow]] keeps its element type when the
    * Seq is empty (ZOrder's untrained-quantizer meta writes empty splits).
    */
  final case class Strs(v: Seq[String])
  final case class Dbls(v: Seq[Double])

  /** One meta row. Field access mirrors what the stores used from
    * `Row.getAs` — including `has` for the schema-evolution checks that
    * previously read `df.schema.fieldNames`.
    */
  final class MetaRow private[MetaIO] (g: Group) {
    private val tpe = g.getType
    def has(name: String): Boolean = tpe.containsField(name)
    def getInt(name: String): Int = g.getInteger(name, 0)
    def getLong(name: String): Long =
      tpe.getType(name).asPrimitiveType().getPrimitiveTypeName match {
        case INT32 => g.getInteger(name, 0).toLong
        case _ => g.getLong(name, 0)
      }
    def getString(name: String): String = g.getString(name, 0)
    def getStringSeq(name: String): Seq[String] =
      listElems(name).map(_.getString(0, 0))
    def getDoubleSeq(name: String): Seq[Double] =
      listElems(name).map(_.getDouble(0, 0))
    // 3-level LIST: outer optional group -> repeated group -> element.
    // Index-based access tolerates both Spark's standard names
    // (list/element) and any legacy naming.
    private def listElems(name: String): Seq[Group] = {
      if (g.getFieldRepetitionCount(name) == 0) return Seq.empty // null list
      val lg = g.getGroup(name, 0)
      (0 until lg.getFieldRepetitionCount(0)).map(i => lg.getGroup(0, i))
    }
  }

  /** The single row of the one-file parquet dir at `dir` — no Spark job. */
  def readHead(spark: SparkSession, dir: String): MetaRow = {
    val conf = spark.sessionState.newHadoopConf()
    val dp = new Path(dir)
    val fs = dp.getFileSystem(conf)
    val files = fs.listStatus(dp).map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getName)
    // one data file by construction (coalesce(1) / writeRow); tolerate a
    // multi-file dir by taking the first file that holds a row
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f)
        .withConf(conf).build()
      try {
        val g = reader.read()
        if (g != null) return new MetaRow(g)
      } finally reader.close()
    }
    throw new IllegalStateException(s"no meta row under $dir")
  }

  private def schemaOf(fields: Seq[(String, Any)]): MessageType = {
    val b = Types.buildMessage()
    fields.foreach { case (n, v) =>
      v match {
        case _: Int => b.addField(Types.required(INT32).named(n))
        case _: Long => b.addField(Types.required(INT64).named(n))
        case _: Double => b.addField(Types.required(DOUBLE).named(n))
        case _: Boolean => b.addField(Types.required(BOOLEAN).named(n))
        case _: String => b.addField(Types.required(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(n))
        case _: Strs => b.addField(listField(n,
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
            .named("element")))
        case _: Dbls => b.addField(listField(n,
          Types.optional(DOUBLE).named("element")))
        case x => throw new IllegalArgumentException(
          s"unsupported meta field type for $n: ${x.getClass}")
      }
    }
    b.named("spark_schema")
  }

  private def listField(n: String,
      elem: org.apache.parquet.schema.Type): org.apache.parquet.schema.Type =
    Types.optionalGroup().as(LogicalTypeAnnotation.listType())
      .addField(Types.repeatedGroup().addField(elem).named("list"))
      .named(n)

  /** Overwrite `dir` with a single-row parquet of `fields` — no Spark job,
    * no Hadoop commit ceremony (callers' marker files are the commit
    * point, exactly as before).
    */
  def writeRow(spark: SparkSession, dir: String,
      fields: (String, Any)*): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dp = new Path(dir)
    val fs = dp.getFileSystem(conf)
    if (fs.exists(dp))
      require(fs.delete(dp, true), s"could not overwrite $dir")
    val mt = schemaOf(fields)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new Path(dp, "part-00000.parquet"), conf))
      .withConf(conf).withType(mt)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      val g = new SimpleGroupFactory(mt).newGroup()
      fields.foreach { case (n, v) =>
        v match {
          case i: Int => g.append(n, i)
          case l: Long => g.append(n, l)
          case d: Double => g.append(n, d)
          case z: Boolean => g.append(n, z)
          case s: String => g.append(n, s)
          case Strs(xs) =>
            val lg = g.addGroup(n)
            xs.foreach(x => lg.addGroup("list").append("element", x))
          case Dbls(xs) =>
            val lg = g.addGroup(n)
            xs.foreach(x => lg.addGroup("list").append("element", x))
          case _ => // unreachable: schemaOf already rejected it
        }
      }
      writer.write(g)
    } finally writer.close()
  }
}
