package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.SparkSpec
import MatSink._

/** K2 — MAT v5 writer: header constants from the public spec, 8-byte
  * element alignment, and a full round-trip through an independent
  * minimal parser (no MAT library exists in this environment, so the
  * parser below re-derives structure from the spec rather than from the
  * writer's code paths). */
class MatSinkSpec extends SparkSpec {

  // --- minimal spec-following parser (tags + nested matrix elements) ---
  private def parseElements(buf: ByteBuffer): Seq[(Int, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    while (buf.remaining() >= 8) {
      val t = buf.getInt(); val n = buf.getInt()
      val data = new Array[Byte](n); buf.get(data)
      val padding = ((n + 7) & ~7) - n
      buf.position(buf.position() + padding)
      out += ((t, data))
    }
    out.toSeq
  }
  private def le(bytes: Array[Byte]) =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  test("header: 116-char text, version 0x0100, endian indicator IM") {
    val p = Files.createTempDirectory("mat").resolve("h.mat")
    MatSink.write(p, Seq("x" -> DoubleCol(Array(1.0))))
    val bytes = Files.readAllBytes(p)
    assert(new String(bytes.take(10)) == "MATLAB 5.0")
    val hdr = le(bytes).position(124).asInstanceOf[ByteBuffer]
    assert(hdr.getShort() == 0x0100.toShort)
    assert(bytes(126) == 'I'.toByte && bytes(127) == 'M'.toByte)
  }

  test("round-trip: double column matrix") {
    val p = Files.createTempDirectory("mat").resolve("d.mat")
    val values = Array(1.5, -2.25, 3.125, 0.0)
    MatSink.write(p, Seq("strain_NW" -> DoubleCol(values)))
    val body = le(java.util.Arrays.copyOfRange(Files.readAllBytes(p), 128, Files.readAllBytes(p).length))
    val Seq((14, matrix)) = parseElements(body)
    val sub = parseElements(le(matrix))
    assert(le(sub(0)._2).getInt() == 6) // mxDOUBLE_CLASS
    assert(le(sub(1)._2).getInt() == 4 && le(sub(1)._2).getInt(4) == 1) // dims 4x1
    assert(new String(sub(2)._2) == "strain_NW")
    val pr = le(sub(3)._2)
    assert(values.forall(v => pr.getDouble() == v))
  }

  test("round-trip: char rows matrix is column-major uint16") {
    val p = Files.createTempDirectory("mat").resolve("c.mat")
    MatSink.write(p, Seq("date" -> CharRows(Seq("2024-03-15", "2024-03-16"))))
    val all = Files.readAllBytes(p)
    val Seq((14, matrix)) = parseElements(le(java.util.Arrays.copyOfRange(all, 128, all.length)))
    val sub = parseElements(le(matrix))
    assert(le(sub(0)._2).getInt() == 4) // mxCHAR_CLASS
    assert(le(sub(1)._2).getInt() == 2 && le(sub(1)._2).getInt(4) == 10)
    val chars = le(sub(3)._2)
    // column-major: first column is row0[0], row1[0]
    assert(chars.getShort() == '2'.toShort && chars.getShort() == '2'.toShort)
  }

  test("round-trip: struct with the reference's time-channel shape") {
    // DataConverterUDBF.py:195-205: channel 0 becomes a struct of
    // relative_time/absolut_time/date/time/millisecond
    val p = Files.createTempDirectory("mat").resolve("s.mat")
    MatSink.write(p, Seq(
      "Datetime" -> Struct(Seq(
        "relative_time" -> DoubleCol(Array(0.0, 0.01)),
        "absolut_time" -> DoubleCol(Array(45366.5, 45366.5000001)),
        "date" -> CharRows(Seq("2024-03-15", "2024-03-15")),
        "time" -> CharRows(Seq("12:00:00", "12:00:00")),
        "millisecond" -> DoubleCol(Array(0.0, 10.0)))),
      "ch_a" -> DoubleCol(Array(1.0, 2.0))))
    val all = Files.readAllBytes(p)
    val elems = parseElements(le(java.util.Arrays.copyOfRange(all, 128, all.length)))
    assert(elems.length == 2 && elems.forall(_._1 == 14))
    val structSub = parseElements(le(elems.head._2))
    assert(le(structSub(0)._2).getInt() == 2) // mxSTRUCT_CLASS
    assert(new String(structSub(2)._2) == "Datetime")
    assert(le(structSub(3)._2).getInt() == 32) // field name length
    val names = structSub(4)._2.grouped(32)
      .map(g => new String(g.takeWhile(_ != 0))).toSeq
    assert(names == Seq("relative_time", "absolut_time", "date", "time", "millisecond"))
    // five nested field matrices follow
    assert(structSub.drop(5).count(_._1 == 14) == 5)
  }

  test("all elements are 8-byte aligned") {
    val p = Files.createTempDirectory("mat").resolve("a.mat")
    MatSink.write(p, Seq(
      "a" -> DoubleCol(Array(1.0, 2.0, 3.0)),
      "b" -> CharRows(Seq("xyz")),
      "c" -> DoubleCol(Array(9.0))))
    val bytes = Files.readAllBytes(p)
    assert(bytes.length % 8 == 0)
    // walking top-level tags must land exactly on the file end
    val buf = le(java.util.Arrays.copyOfRange(bytes, 128, bytes.length))
    assert(parseElements(buf).length == 3 && buf.remaining() == 0)
  }
}
