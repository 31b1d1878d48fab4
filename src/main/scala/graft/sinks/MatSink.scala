package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** K2 — MATLAB Level-5 MAT-file writer, pure JVM, from the PUBLIC
  * MAT-File format specification (the reference calls scipy.io.savemat,
  * DataConverterUDBF.py:181-211; the flow is utility-only — not invoked
  * by the live pipeline — so this sink mirrors that standing).
  *
  * Level-5 layout: 128-byte header (116 text + 8 subsys + version
  * 0x0100 + endian indicator "IM"), then a sequence of data elements,
  * each an 8-byte tag (u32 type, u32 byte count) + 8-byte-aligned data.
  * A matrix (miMATRIX=14) nests: array flags (miUINT32), dimensions
  * (miINT32), name (miINT8), and payload (miDOUBLE / miUINT16 for
  * char / nested matrices for structs).
  *
  * Supported value kinds cover exactly what save_as_mat emits: column
  * double matrices, char row matrices (string lists), and one-level
  * structs of those. */
object MatSink {

  sealed trait MatValue
  final case class DoubleCol(values: Array[Double]) extends MatValue
  final case class CharRows(rows: Seq[String]) extends MatValue
  final case class Struct(fields: Seq[(String, MatValue)]) extends MatValue

  // element data types (public spec)
  private val MiInt8 = 1
  private val MiInt32 = 5
  private val MiUInt32 = 6
  private val MiUInt16 = 4
  private val MiDouble = 9
  private val MiMatrix = 14
  // array classes
  private val MxStruct = 2
  private val MxChar = 4
  private val MxDouble = 6

  private def pad8(n: Int): Int = (n + 7) & ~7

  private def element(dataType: Int, data: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + pad8(data.length))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(dataType).putInt(data.length).put(data)
    buf.array()
  }

  private def int32s(xs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(xs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    xs.foreach(b.putInt)
    b.array()
  }

  private def arrayFlags(mxClass: Int): Array[Byte] =
    element(MiUInt32, int32s(mxClass, 0))

  private def nameElement(name: String): Array[Byte] =
    element(MiInt8, name.getBytes(StandardCharsets.US_ASCII))

  private def matrixElement(name: String, v: MatValue): Array[Byte] = {
    val body: Array[Byte] = v match {
      case DoubleCol(values) =>
        val data = ByteBuffer.allocate(values.length * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        values.foreach(data.putDouble)
        arrayFlags(MxDouble) ++
          element(MiInt32, int32s(values.length, 1)) ++ // n x 1 column
          nameElement(name) ++
          element(MiDouble, data.array())
      case CharRows(rows) =>
        // rows x maxLen char matrix, column-major UTF-16 code units
        val h = rows.length
        val w = if (rows.isEmpty) 0 else rows.map(_.length).max
        val data = ByteBuffer.allocate(h * w * 2).order(ByteOrder.LITTLE_ENDIAN)
        for (cIdx <- 0 until w; r <- rows)
          data.putShort(if (cIdx < r.length) r.charAt(cIdx).toShort else ' '.toShort)
        arrayFlags(MxChar) ++
          element(MiInt32, int32s(h, w)) ++
          nameElement(name) ++
          element(MiUInt16, data.array())
      case Struct(fields) =>
        val fieldNameLen = 32
        val namesBytes = fields.flatMap { case (fn, _) =>
          require(fn.length < fieldNameLen, s"struct field name too long: $fn")
          fn.getBytes(StandardCharsets.US_ASCII).padTo(fieldNameLen, 0.toByte)
        }.toArray
        arrayFlags(MxStruct) ++
          element(MiInt32, int32s(1, 1)) ++
          nameElement(name) ++
          element(MiInt32, int32s(fieldNameLen)) ++
          element(MiInt8, namesBytes) ++
          fields.flatMap { case (_, fv) => matrixElement("", fv) }
    }
    element(MiMatrix, body)
  }

  /** Write variables to a .mat file. Iteration order = file order. */
  def write(path: Path, variables: Seq[(String, MatValue)]): Unit = {
    val header = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val text = ("MATLAB 5.0 MAT-file, created by graft" + " " * 116).take(116)
    header.put(text.getBytes(StandardCharsets.US_ASCII))
    header.putLong(0L) // subsystem offset
    header.putShort(0x0100.toShort) // version
    header.put('I'.toByte).put('M'.toByte) // little-endian indicator
    val body = variables.toArray.flatMap { case (n, v) => matrixElement(n, v) }
    Files.createDirectories(path.getParent)
    Files.write(path, header.array() ++ body)
  }
}
