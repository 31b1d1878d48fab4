package graft.sources.udbf

import java.nio.ByteBuffer
import java.nio.ByteOrder
import java.util.{Map => JMap, Set => JSet}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S1 — `spark.read.format("udbf")`: DataSource V2 reader for Gantner
  * UDBF `.dat` logger files (SURVEY.md §2.1 S1).
  *
  * Spark-first design notes:
  *   - schema comes from the file header once on the driver
  *     (channel names normalized `-`→`_` as the reference does on read,
  *     DataConverterUDBF.py:104; units kept as column METADATA);
  *   - column 0 is surfaced as a real `ts TIMESTAMP` (the vendor library
  *     emits OLE-day doubles, DataConverterUDBF.py:129-140 — we convert
  *     at decode time so Catalyst sees a native timestamp);
  *   - one input partition per file: UDBF files are bounded 10-minute
  *     measurement windows (~450 KB, DataConverterUDBF.py:51), so the
  *     100 TB axis is file COUNT — parallelism comes from many files,
  *     and a whole file per task preserves the chunk-concat stop rule;
  *   - [[SupportsPushDownRequiredColumns]] prunes decode work: an
  *     unprojected channel is never decoded (the reference decodes all
  *     channels always — we do better);
  *   - chunked monotonic admission (D5): frames are accepted chunk by
  *     chunk while the chunk's first timestamp advances, mirroring
  *     read_gins_dat (PyQStationConnectWin.py:390-413). Chunk size is
  *     the vendor default 100 000 frames (`chunkFrames` option for tests).
  */
class UdbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "udbf"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = UdbfDataSource.resolveFiles(options)
    require(files.nonEmpty, "udbf: no .dat files found under the given path")
    UdbfDataSource.schemaOf(files.head)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new UdbfTable(schema, new CaseInsensitiveStringMap(properties))
}

object UdbfDataSource {
  val TimestampColumn = "ts"
  val DefaultChunkFrames = 100000

  /** Expand the `path`/`paths` options to concrete `.dat` files (glob +
    * one-level directory listing), driver-side. */
  def resolveFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val raw: Seq[String] = Option(options.get("paths")) match {
      case Some(json) => "\"((?:[^\"\\\\]|\\\\.)*)\"".r
        .findAllMatchIn(json).map(_.group(1)).toSeq
      case None => Option(options.get("path")).toSeq
    }
    raw.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val matched: Seq[FileStatus] = Option(fs.globStatus(hp)) match {
        case Some(arr) if arr.nonEmpty => arr.toSeq
        case _ => Seq(fs.getFileStatus(hp)) // throws FileNotFound — correct
      }
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".dat"))
        else Seq(st)
      }
    }.map(_.getPath.toString).distinct.sorted
  }

  /** Schema = ts TIMESTAMP + one DOUBLE per channel, unit/sample-rate as
    * field metadata (SURVEY.md §1.1: StructType metadata carries what the
    * reference keeps in parallel lists). */
  def schemaOf(file: String): StructType = {
    val header = UdbfFormat.parseHeader(readBytes(file, new Configuration()))
    val tsMeta = new MetadataBuilder()
      .putDouble("sample_rate", header.sampleRate)
      .putString("vendor", header.vendor)
      .build()
    val tsField = StructField(TimestampColumn, TimestampType, nullable = false, tsMeta)
    val channelFields = header.variables.map { v =>
      val meta = new MetadataBuilder()
        .putString("unit", v.unit)
        .putDouble("sample_rate", header.sampleRate)
        .build()
      StructField(normalizeName(v.name), DoubleType, nullable = false, meta)
    }
    StructType(tsField +: channelFields)
  }

  /** P5 — channel-name normalization, as applied by the reference
    * immediately after header read (DataConverterUDBF.py:104). */
  def normalizeName(name: String): String = name.replace('-', '_')

  private[udbf] def readBytes(file: String, conf: Configuration): Array[Byte] = {
    val hp = new HPath(file)
    val fs = hp.getFileSystem(conf)
    val len = fs.getFileStatus(hp).getLen
    require(len <= Int.MaxValue, s"udbf file too large: $len bytes")
    val in = fs.open(hp)
    try {
      val out = new Array[Byte](len.toInt)
      in.readFully(0, out)
      out
    } finally in.close()
  }
}

final class UdbfTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "udbf:" + options.getOrDefault("path", "")
  override def schema(): StructType = tableSchema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // merge table-creation options with read options (read options win)
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new UdbfScanBuilder(tableSchema, new CaseInsensitiveStringMap(merged))
  }
}

final class UdbfScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new UdbfScan(
    UdbfDataSource.resolveFiles(options),
    required,
    options.getInt("chunkFrames", UdbfDataSource.DefaultChunkFrames))
}

final case class UdbfInputPartition(file: String) extends InputPartition

final class UdbfScan(files: Seq[String], required: StructType, chunkFrames: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(UdbfInputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new UdbfReaderFactory(required.fieldNames, chunkFrames)
  override def description(): String =
    s"udbf [${files.size} files, columns: ${required.fieldNames.mkString(",")}]"
}

final class UdbfReaderFactory(requiredCols: Array[String], chunkFrames: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new UdbfPartitionReader(
      partition.asInstanceOf[UdbfInputPartition].file, requiredCols, chunkFrames)
}

/** Decodes one `.dat` file. Only the projected channels are decoded;
  * other fields are skipped by byte offset. */
final class UdbfPartitionReader(
    file: String, requiredCols: Array[String], chunkFrames: Int)
    extends PartitionReader[InternalRow] {
  import UdbfFormat._

  private val bytes = UdbfDataSource.readBytes(file, new Configuration())
  private val header = parseHeader(bytes)
  private val buf = ByteBuffer.wrap(bytes).order(
    if (header.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)

  private val timeFieldBytes =
    if (header.actTimeDataType != 0) typeSize(header.actTimeDataType) else 0
  // byte offset of each channel inside a record
  private val channelOffsets: Array[Int] = {
    val sizes = header.variables.map(v => typeSize(v.dataType))
    sizes.scanLeft(timeFieldBytes)(_ + _).init.toArray
  }
  private val channelNames = header.variables.map(v => UdbfDataSource.normalizeName(v.name))

  // projection plan: for each required column, either the ts marker (-1)
  // or the channel index
  private val projection: Array[Int] = requiredCols.map {
    case UdbfDataSource.TimestampColumn => -1
    case name =>
      val idx = channelNames.indexOf(name)
      require(idx >= 0, s"udbf: column '$name' not present in $file " +
        s"(channels: ${channelNames.mkString(", ")})")
      idx
  }

  private val availableFrames: Long = {
    val dataBytes = bytes.length.toLong - header.dataOffset
    math.max(0L, dataBytes / header.recordBytes)
  }

  private var frame: Long = -1
  private var lastMicros: Long = Long.MinValue
  private var current: InternalRow = _

  private def microsAt(i: Long, base: Int): Long =
    if (header.actTimeDataType != 0) {
      buf.position(base)
      header.recordMicros(i, readTicks(buf, header.actTimeDataType))
    } else header.recordMicros(i, 0L)

  override def next(): Boolean = {
    frame += 1
    if (frame >= availableFrames) return false
    val base = header.dataOffset + (frame * header.recordBytes).toInt
    val micros = microsAt(frame, base)
    // D5 — chunk-concat gate: a chunk whose first timestamp does not
    // advance past everything read so far ends the file
    // (PyQStationConnectWin.py:400-411)
    if (frame > 0 && frame % chunkFrames == 0 && micros <= lastMicros) return false
    lastMicros = micros
    val values = new Array[Any](projection.length)
    var k = 0
    while (k < projection.length) {
      val p = projection(k)
      if (p == -1) values(k) = micros
      else {
        buf.position(base + channelOffsets(p))
        values(k) = readValue(buf, header.variables(p).dataType)
      }
      k += 1
    }
    current = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
