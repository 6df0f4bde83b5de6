package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink on the PUBLIC Avro Java API (the
  * `avro` + `avro-mapred` jars Spark itself ships) — closes the
  * interchange-format matrix (parquet, CSV, JSON-lines, ORC, JDBC, zip,
  * now Avro: the row-major format every Kafka/ingest estate emits).
  *
  * Read side is a DataSourceV2 connector, the [[ZipEntriesSource]]
  * pattern:
  *   - **Schema inference from the container header** — Avro files are
  *     self-describing; the driver opens ONE file's header (no row
  *     reads) and maps the record schema to a StructType.
  *   - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     pruned StructType becomes the Avro READER schema, so the
  *     decoder skips non-projected fields instead of materializing
  *     them — the Avro-native projection mechanism.
  *   - No filter pushdown: an Avro block carries no min/max stats, so
  *     there is nothing sound to prune with — row filters stay
  *     Spark-side (honest, not an omission).
  *   - One input partition per file (container blocks are splittable
  *     in principle via sync markers; per-file parallelism matches the
  *     writer's one-file-per-task layout, so nothing is lost here —
  *     the 100 TB fix is the same as zip: more, smaller files).
  *
  * Write side ([[AvroFiles.writeAvro]]) is a distributed sink: each
  * task serializes its partition into its own container file with
  * deflate compression — no driver-side collect at any scale.
  *
  * Supported field types: the flat primitives the engine's interchange
  * tables use (long, int, double, float, boolean, string, binary),
  * nullable as `union {null, T}` — nested shapes stay with JSON/parquet.
  */
class AvroFilesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "AvroFilesSource needs exactly one load(path)")
    AvroFiles.inferStructType(path)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "AvroFilesSource needs exactly one load(path)")
    new AvroFilesTable(path, schema)
  }
  override def supportsExternalMetadata(): Boolean = true
}

object AvroFiles {

  // ---- schema bridges ------------------------------------------------

  private[sources] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroFiles supports flat primitives only, got $other for ${f.name}")
      }
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft.sources", false,
      java.util.List.of(fields: _*))
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private[sources] def toStructType(avro: Schema): StructType =
    StructType(avro.getFields.asScala.map { f =>
      val nullable = f.schema().getType == Schema.Type.UNION &&
        f.schema().getTypes.asScala.exists(_.getType == Schema.Type.NULL)
      val dt = nonNullBranch(f.schema()).getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported Avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    }.toSeq)

  /** Driver-side schema inference: ONE container header, zero rows. */
  private[sources] def inferStructType(path: String): StructType = {
    val first = listAvro(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = new org.apache.avro.mapred.FsInput(
      new HPath(first), new org.apache.hadoop.conf.Configuration())
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try toStructType(r.getSchema) finally r.close()
  }

  private[sources] def listAvro(path: String): Seq[String] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val glob = if (fs.getFileStatus(p).isDirectory) new HPath(p, "*.avro") else p
    Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
  }

  // ---- distributed writer --------------------------------------------

  /** Write `df` as one deflate-compressed Avro container file per
    * partition under `out` (local/shared FS). Executor-side work rides
    * the plan's own InternalRow iterator — no Row conversion, no
    * collect; the schema travels as its JSON (Avro Schema objects are
    * not serializable pre-1.9-style across closures).
    *
    * Overwrite semantics match every sibling format writer
    * (`SaveMode.Overwrite`): stale `*.avro` containers are cleared
    * first, so a rewrite with fewer partitions — or a crashed partial
    * write — can never leave extra part files for [[listAvro]]'s glob
    * to serve on top of fresh rows. Each task writes to an
    * attempt-unique temp name and ATOMIC_MOVEs onto the final part
    * name, so a speculative second attempt of the same partition can
    * only replace a byte-complete container with an identical one,
    * never interleave with it. */
  def writeAvro(df: DataFrame, out: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st, "GraftRecord").toString
    val outDir = new java.io.File(out)
    outDir.mkdirs()
    Option(outDir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.endsWith(".avro") || f.getName.contains(".avro_tmp"))
      .foreach(f => f.delete())
    val fields = st.fields.map(f => (f.name, f.dataType)).toIndexedSeq
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId).getOrElse(0L)
      val f = new java.io.File(out, f"part-$pid%05d.avro_tmp$attempt")
      w.create(schema, f)
      var n = 0L
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          val (name, dt) = fields(i)
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else dt match {
              case LongType => java.lang.Long.valueOf(row.getLong(i))
              case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
              case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
              case FloatType => java.lang.Float.valueOf(row.getFloat(i))
              case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
              case StringType => row.getUTF8String(i).toString
              case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
              case other => throw new IllegalArgumentException(other.toString)
            }
          rec.put(name, v)
          i += 1
        }
        w.append(rec); n += 1
      } finally w.close()
      java.nio.file.Files.move(f.toPath,
        new java.io.File(out, f"part-$pid%05d.avro").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Iterator.single(n)
    }.count() // force the distributed write
    ()
  }
}

class AvroFilesTable(path: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"avrofiles(`$path`)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, schema0)
}

class AvroScanBuilder(path: String, full: StructType) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required)
}

class AvroScan(path: String, requiredSchema: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = {
    val bytes =
      try {
        val p = new HPath(path)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        AvroFiles.listAvro(path)
          .map(f => fs.getFileStatus(new HPath(f)).getLen).sum
      } catch { case _: Exception => Long.MaxValue }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def description(): String =
    s"AvroFilesScan path=$path, ReadSchema=${requiredSchema.fieldNames.mkString("[", ",", "]")}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroFiles.listAvro(path).map(AvroFilePartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(requiredSchema)
}

case class AvroFilePartition(file: String) extends InputPartition

class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroFileReader(partition.asInstanceOf[AvroFilePartition].file, required)
}

/** Per-file reader: the pruned StructType becomes the Avro READER
  * schema, so the decoder itself skips non-projected fields. */
class AvroFileReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private var reader: DataFileReader[GenericRecord] = null
  private var current: InternalRow = null
  private val names = required.fieldNames
  private val types = required.fields.map(_.dataType)

  private def ensureOpen(): Unit = if (reader == null) {
    val in = new org.apache.avro.mapred.FsInput(
      new HPath(file), new org.apache.hadoop.conf.Configuration())
    val datum = new GenericDatumReader[GenericRecord]()
    reader = new DataFileReader[GenericRecord](in, datum)
    if (required.fields.nonEmpty) {
      // reader-schema projection: keep only the projected fields (the
      // writer schema's field definitions, so resolution is by name)
      val writer = reader.getSchema
      val keep = names.toSet
      val fields = writer.getFields.asScala.filter(f => keep(f.name))
        .map(f => new Schema.Field(f.name, f.schema, null, null))
      datum.setExpected(Schema.createRecord(
        writer.getName, null, writer.getNamespace, false,
        java.util.List.of(fields.toSeq: _*)))
    }
  }

  override def next(): Boolean = {
    ensureOpen()
    if (!reader.hasNext) return false
    val rec = reader.next()
    val values = new Array[Any](names.length)
    var i = 0
    while (i < names.length) {
      val raw = rec.get(names(i))
      values(i) =
        if (raw == null) null
        else types(i) match {
          case StringType => UTF8String.fromString(raw.toString)
          case BinaryType =>
            val bb = raw.asInstanceOf[java.nio.ByteBuffer]
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case _ => raw // long/int/double/float/boolean box straight through
        }
      i += 1
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
