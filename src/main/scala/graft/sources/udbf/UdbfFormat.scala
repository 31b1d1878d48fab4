package graft.sources.udbf

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Gantner UDBF ("Universal Data Bin File") v1.07 binary layout — a
  * pure-JVM reimplementation from the PUBLIC format documentation. The
  * reference hides the format behind a vendor shared library
  * (conv/patch/PyQStationConnectWin.py:20-50 loads libGInsUtility,
  * :390-413 drives the chunked decode; orchestration
  * conv/gantner_operations/DataConverterUDBF.py:84-127).
  *
  * Layout (the first byte selects the byte order of everything after it):
  * {{{
  *   u8  isBigEndian            0 = little, 1 = big
  *   u16 version                x100, e.g. 107 = v1.07
  *   u16 typeVendorLen          length incl. trailing NUL
  *   ..  typeVendor bytes
  *   u8  withCheckSum           1 = trailing checksum present
  *   u16 moduleAdditionalDataLen (skipped if present)
  *   f64 startTimeToDayFactor   startTime units → days (usually 1.0)
  *   u16 actTimeDataType        type of the per-record time field; 0 = none
  *   f64 actTimeToSecondFactor  time-field ticks → seconds
  *   f64 startTime              OLE days since 1899-12-30 (x dayFactor)
  *   f64 sampleRate             Hz
  *   u16 variableCount
  *   per variable:
  *     u16 nameLen + bytes (incl. NUL)
  *     u16 dataDirection        (0 input, 1 output, ...)
  *     u16 dataType             (see [[typeSize]])
  *     u16 fieldLen
  *     u16 precision
  *     u16 unitLen + bytes (incl. NUL)
  *     u16 additionalDataLen + bytes (skipped)
  *   separator padding: data begins at the next 16-byte boundary at
  *     least 8 bytes after the last header byte
  *   records, each:
  *     [actTime field of actTimeDataType]  (when actTimeDataType != 0)
  *     one value per variable, encoded per its dataType
  * }}}
  *
  * Record timestamp (OLE days, as the vendor library surfaces in matrix
  * column 0): `startTime * startTimeToDayFactor + ticks *
  * actTimeToSecondFactor / 86400`; without a time field the frame index
  * over sampleRate is used.
  */
object UdbfFormat {

  /** UDBF data-type ids → byte widths (public GIns type enumeration). */
  def typeSize(dataType: Int): Int = dataType match {
    case 1 | 2 | 3 | 9 => 1 // boolean, s8, u8, bitset8
    case 4 | 5 | 10    => 2 // s16, u16, bitset16
    case 6 | 7 | 8 | 11 => 4 // s32, u32, float32, bitset32
    case 12 | 13 | 14 | 15 => 8 // double, s64, u64, bitset64
    case other => throw new IllegalArgumentException(s"unsupported UDBF data type $other")
  }

  final case class Variable(
      name: String,
      direction: Int,
      dataType: Int,
      fieldLen: Int,
      precision: Int,
      unit: String)

  final case class Header(
      bigEndian: Boolean,
      version: Int,
      vendor: String,
      withCheckSum: Boolean,
      startTimeToDayFactor: Double,
      actTimeDataType: Int,
      actTimeToSecondFactor: Double,
      startTime: Double,
      sampleRate: Double,
      variables: Seq[Variable],
      dataOffset: Int) {

    /** Bytes per record: optional time field + each variable's width. */
    val recordBytes: Int =
      (if (actTimeDataType != 0) typeSize(actTimeDataType) else 0) +
        variables.map(v => typeSize(v.dataType)).sum

    /** OLE start in days (already multiplied by the day factor). */
    def startOleDays: Double = startTime * startTimeToDayFactor

    /** Microseconds since epoch of the record at `ticks` (or frame index
      * when the file has no time field). OLE day 25569 = 1970-01-01. */
    def recordMicros(frameIndex: Long, ticks: Long): Long = {
      val baseMicros = (startOleDays - 25569.0) * 86400e6
      val seconds =
        if (actTimeDataType != 0) ticks * actTimeToSecondFactor
        else frameIndex / sampleRate
      Math.round(baseMicros + seconds * 1e6)
    }
  }

  /** Unit decode with the reference's latin-1/°C/µm-per-m fallback
    * (conv/patch/PyQStationConnectWin.py:244-265): UTF-8 first, then
    * latin-1 (which maps 0xB0 → '°' and 0xB5 → 'µ' exactly as the
    * special cases require). */
  private def decodeString(bytes: Array[Byte]): String = {
    val upToNul = bytes.indexOf(0.toByte) match {
      case -1 => bytes
      case i  => bytes.take(i)
    }
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
      dec.decode(ByteBuffer.wrap(upToNul)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(upToNul, StandardCharsets.ISO_8859_1)
    }
  }

  /** Parse the header from the first bytes of a file. */
  def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= 40, s"file too short for a UDBF header: ${bytes.length} bytes")
    val bigEndian = bytes(0) == 1.toByte
    val buf = ByteBuffer.wrap(bytes)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.position(1)

    def u8(): Int = buf.get() & 0xff
    def u16(): Int = buf.getShort() & 0xffff
    def f64(): Double = buf.getDouble()
    def str(len: Int): String = {
      val arr = new Array[Byte](len)
      buf.get(arr)
      decodeString(arr)
    }

    val version = u16()
    val vendor = str(u16())
    val withCheckSum = u8() == 1
    val moduleLen = u16()
    if (moduleLen > 0) buf.position(buf.position() + moduleLen)
    val dayFactor = f64()
    val actTimeType = u16()
    val secondFactor = f64()
    val startTime = f64()
    val sampleRate = f64()
    val varCount = u16()
    val variables = (0 until varCount).map { _ =>
      val name = str(u16())
      val direction = u16()
      val dataType = u16()
      val fieldLen = u16()
      val precision = u16()
      val unit = str(u16())
      val addLen = u16()
      if (addLen > 0) buf.position(buf.position() + addLen)
      Variable(name, direction, dataType, fieldLen, precision, unit)
    }
    // data starts at the first 16-byte boundary >= headerEnd + 8
    val headerEnd = buf.position()
    val dataOffset = ((headerEnd + 8 + 15) / 16) * 16
    Header(bigEndian, version, vendor, withCheckSum, dayFactor, actTimeType,
      secondFactor, startTime, sampleRate, variables, dataOffset)
  }

  /** Read one value of `dataType` at the buffer's position as Double —
    * the vendor API's contract (ReadBufferToDoubleArray,
    * PyQStationConnectWin.py:327-345) surfaces every channel as double. */
  def readValue(buf: ByteBuffer, dataType: Int): Double = dataType match {
    case 1 | 3 | 9 => (buf.get() & 0xff).toDouble
    case 2         => buf.get().toDouble
    case 4         => buf.getShort().toDouble
    case 5 | 10    => (buf.getShort() & 0xffff).toDouble
    case 6         => buf.getInt().toDouble
    case 7 | 11    => (buf.getInt() & 0xffffffffL).toDouble
    case 8         => buf.getFloat().toDouble
    case 12        => buf.getDouble()
    case 13        => buf.getLong().toDouble
    case 14 | 15   => buf.getLong().toDouble // u64 beyond 2^63 not produced by loggers
    case other => throw new IllegalArgumentException(s"unsupported UDBF data type $other")
  }

  /** Absolute-offset variant of [[readValue]]: no position mutation, so
    * the hot decode loops (one call per projected value per frame) skip
    * the ByteBuffer's position/limit bookkeeping entirely. */
  def readValueAt(buf: ByteBuffer, dataType: Int, off: Int): Double = dataType match {
    case 1 | 3 | 9 => (buf.get(off) & 0xff).toDouble
    case 2         => buf.get(off).toDouble
    case 4         => buf.getShort(off).toDouble
    case 5 | 10    => (buf.getShort(off) & 0xffff).toDouble
    case 6         => buf.getInt(off).toDouble
    case 7 | 11    => (buf.getInt(off) & 0xffffffffL).toDouble
    case 8         => buf.getFloat(off).toDouble
    case 12        => buf.getDouble(off)
    case 13        => buf.getLong(off).toDouble
    case 14 | 15   => buf.getLong(off).toDouble // u64 beyond 2^63 not produced by loggers
    case other => throw new IllegalArgumentException(s"unsupported UDBF data type $other")
  }

  /** Absolute-offset variant of [[readTicks]]. */
  def readTicksAt(buf: ByteBuffer, dataType: Int, off: Int): Long = dataType match {
    case 1 | 3 | 9 => (buf.get(off) & 0xff).toLong
    case 2         => buf.get(off).toLong
    case 4         => buf.getShort(off).toLong
    case 5 | 10    => (buf.getShort(off) & 0xffff).toLong
    case 6         => buf.getInt(off).toLong
    case 7 | 11    => buf.getInt(off) & 0xffffffffL
    case 8         => buf.getFloat(off).toLong
    case 12        => buf.getDouble(off).toLong
    case 13 | 14 | 15 => buf.getLong(off)
    case other => throw new IllegalArgumentException(s"unsupported UDBF data type $other")
  }

  /** Read the per-record time field as raw ticks (Long). */
  def readTicks(buf: ByteBuffer, dataType: Int): Long = dataType match {
    case 1 | 3 | 9 => (buf.get() & 0xff).toLong
    case 2         => buf.get().toLong
    case 4         => buf.getShort().toLong
    case 5 | 10    => (buf.getShort() & 0xffff).toLong
    case 6         => buf.getInt().toLong
    case 7 | 11    => buf.getInt() & 0xffffffffL
    case 8         => buf.getFloat().toLong
    case 12        => buf.getDouble().toLong
    case 13 | 14 | 15 => buf.getLong()
    case other => throw new IllegalArgumentException(s"unsupported UDBF data type $other")
  }
}

/** Deterministic UDBF file writer — used to build golden fixtures for the
  * reader tests and the u01/u02 correctness queries (the environment has
  * no real logger output; format per [[UdbfFormat]]). Also serves as the
  * inverse codec proving the layout is self-consistent. */
object UdbfWriter {
  import UdbfFormat._

  final case class ChannelSpec(name: String, unit: String, dataType: Int = 12)

  /** Write `frames x channels` values with u64 millisecond ticks
    * (actTimeToSecondFactor = 0.001) starting at `startEpochMicros`.
    * `timeField = false` writes no per-record time (actTimeDataType = 0)
    * — record times then derive from the frame index over sampleRate,
    * the format's other documented mode. */
  def write(
      path: java.nio.file.Path,
      channels: Seq[ChannelSpec],
      frames: Int,
      valueAt: (Int, Int) => Double, // (frameIdx, channelIdx) => value
      startEpochMicros: Long,
      sampleRate: Double,
      bigEndian: Boolean = false,
      ticksAt: Int => Long = null,
      timeField: Boolean = true,
      vendor: String = "graft-udbf"): Unit = {
    val tickOf: Int => Long =
      if (ticksAt != null) ticksAt
      else i => Math.round(i * 1000.0 / sampleRate) // ms ticks

    val startOle = startEpochMicros / 86400e6 + 25569.0

    val vendorBytes = vendor.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
    def varBytes(v: ChannelSpec): Int = {
      val n = v.name.getBytes(StandardCharsets.UTF_8).length + 1
      val u = v.unit.getBytes(StandardCharsets.ISO_8859_1).length + 1
      2 + n + 2 + 2 + 2 + 2 + 2 + u + 2
    }
    val headerLen = 1 + 2 + 2 + vendorBytes.length + 1 + 2 +
      8 + 2 + 8 + 8 + 8 + 2 + channels.map(varBytes).sum
    val dataOffset = ((headerLen + 8 + 15) / 16) * 16
    val timeBytes = if (timeField) 8 else 0
    val recordBytes = timeBytes + channels.map(c => typeSize(c.dataType)).sum
    val total = dataOffset + frames * recordBytes

    val buf = ByteBuffer.allocate(total)
      .order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    buf.put(if (bigEndian) 1.toByte else 0.toByte)
    buf.putShort(107.toShort)
    buf.putShort(vendorBytes.length.toShort)
    buf.put(vendorBytes)
    buf.put(0.toByte) // no checksum
    buf.putShort(0.toShort) // no module additional data
    buf.putDouble(1.0) // startTimeToDayFactor
    buf.putShort(if (timeField) 14.toShort else 0.toShort) // actTimeDataType
    buf.putDouble(0.001) // ms ticks → seconds
    buf.putDouble(startOle)
    buf.putDouble(sampleRate)
    buf.putShort(channels.size.toShort)
    channels.foreach { c =>
      val nameBytes = c.name.getBytes(StandardCharsets.UTF_8) :+ 0.toByte
      val unitBytes = c.unit.getBytes(StandardCharsets.ISO_8859_1) :+ 0.toByte
      buf.putShort(nameBytes.length.toShort)
      buf.put(nameBytes)
      buf.putShort(1.toShort) // direction: input
      buf.putShort(c.dataType.toShort)
      buf.putShort(typeSize(c.dataType).toShort)
      buf.putShort(3.toShort) // precision
      buf.putShort(unitBytes.length.toShort)
      buf.put(unitBytes)
      buf.putShort(0.toShort) // no additional data
    }
    while (buf.position() < dataOffset) buf.put(0x20.toByte) // separators

    (0 until frames).foreach { i =>
      if (timeField) buf.putLong(tickOf(i))
      channels.zipWithIndex.foreach { case (c, j) =>
        val v = valueAt(i, j)
        c.dataType match {
          case 8  => buf.putFloat(v.toFloat)
          case 12 => buf.putDouble(v)
          case 4  => buf.putShort(v.toShort)
          case 6  => buf.putInt(v.toInt)
          case 13 | 14 => buf.putLong(v.toLong)
          case other =>
            throw new IllegalArgumentException(s"writer does not support data type $other")
        }
      }
    }
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, buf.array())
  }
}
