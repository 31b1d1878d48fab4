package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.ReferenceFunctions._

/** Per-operator unit tables for the scalar expression library
  * (SURVEY.md §5.1): P1 OLE golden pairs, F2/F3/F4 predicate tables,
  * P12 DST edges, F7 routing precedence, F1/F9 gates. */
class FunctionsSpec extends SparkSpec {
  import testImplicits._

  test("P1: OLE golden pairs (known date anchors)") {
    // 25569.0 = 1970-01-01T00:00Z; 45366.5 = 2024-03-15T12:00Z;
    // 2.0 = 1900-01-01; fractional day = 6 h steps
    val df = Seq(25569.0, 45366.5, 25569.25).toDF("ole")
    val out = df.select(oleToTimestamp(col("ole")).cast("string")).collect().map(_.getString(0))
    assert(out.sameElements(Array(
      "1970-01-01 00:00:00", "2024-03-15 12:00:00", "1970-01-01 06:00:00")))
  }

  test("P1: round-trips with timestampToOle") {
    val df = Seq(45366.5, 40000.125, 25569.0).toDF("ole")
    val out = df.select(abs(timestampToOle(oleToTimestamp(col("ole"))) - col("ole")))
      .collect().map(_.getDouble(0))
    assert(out.forall(_ < 1e-9))
  }

  test("F2: 10-minute alignment truth table") {
    val df = Seq(
      ("2024-01-01 10:00:00", true), ("2024-01-01 10:10:00", true),
      ("2024-01-01 10:05:00", false), ("2024-01-01 10:10:30", false),
      ("2024-01-01 10:50:00", true), ("2024-01-01 10:11:00", false))
      .toDF("s", "expected")
    val out = df.select(isTenMinuteAligned(to_timestamp(col("s"))) === col("expected"))
      .collect().map(_.getBoolean(0))
    assert(out.forall(identity))
  }

  test("F3: size band is inclusive at exactly ±10%") {
    val df = Seq(
      (447200.0 * 0.9, 1), (447200.0 * 1.1, 1), (447200.0, 1),
      (447200.0 * 0.89, 0), (447200.0 * 1.11, 0)).toDF("size", "expected")
    val out = df.select(sizeBandHealthy(col("size"), lit(447200.0)) === col("expected"))
      .collect().map(_.getBoolean(0))
    assert(out.forall(identity))
  }

  test("F4: warm-up boundary keeps exactly rel_time >= 10") {
    val df = Seq(9.99, 10.0, 10.01).toDF("rel")
    val out = df.filter(afterWarmup(col("rel"))).collect().map(_.getDouble(0))
    assert(out.sameElements(Array(10.0, 10.01)))
  }

  test("P12: Berlin window-end crosses winter/summer offsets and DST spring-forward") {
    val df = Seq(
      "2024-01-15 10:05:00", // CET +1 → 11:15
      "2024-07-15 10:05:00", // CEST +2 → 12:15
      "2024-03-31 00:55:00"  // +10min = 01:05 UTC = 03:05 CEST (02:00 skipped)
    ).toDF("s")
    val out = df.select(allsatName(to_timestamp(col("s")))).collect().map(_.getString(0))
    assert(out.sameElements(Array(
      "FHEB_2024_01_15_11_15_00.csv",
      "FHEB_2024_07_15_12_15_00.csv",
      "FHEB_2024_03_31_03_05_00.csv")))
  }

  test("F7: 100hz routing wins before the 1hz substring; neither → null") {
    val df = Seq("a_100HZ_b.dat", "a_1hz_b.dat", "a_10hz_b.dat", "plain.dat").toDF("f")
    val out = df.select(healthKeyForRate(col("f"))).collect().map(_.getString(0))
    assert(out(0) == "health:lpi_100hz_file_size")
    assert(out(1) == "health:lpi_1hz_file_size")
    assert(out(2) == null) // '10hz' contains neither '100hz' nor '1hz' as a substring
    assert(out(3) == null)
  }

  test("F8: alarm needs both the suffix and max == 1") {
    val df = Seq(
      ("s_GAL", 1.0, true), ("s_RAL", 1.0, true), ("s_VAL", 1.0, false),
      ("s_GAL", 0.0, false), ("s_GAL", 2.0, false)).toDF("name", "mx", "expected")
    val out = df.select(isAlarmChannel(col("name"), col("mx")) === col("expected"))
      .collect().map(_.getBoolean(0))
    assert(out.forall(identity))
  }

  test("F9: URL gate accepts http/https any case, rejects other schemes") {
    val df = Seq("https://x", "HTTP://x", "hTtPs://x", "ftp://x", "x https://y")
      .toDF("u")
    val out = df.select(isValidMetadataUrl(col("u"))).collect().map(_.getBoolean(0))
    assert(out.sameElements(Array(true, true, true, false, false)))
  }

  test("F1: suffix gate is case-insensitive and rejects dotless names") {
    val df = Seq("a.dat", "b.DAT", "c.Parquet", "d.csv", "e.txt", "noext", "w.tar.csv")
      .toDF("f")
    val out = df.filter(hasSupportedSuffix(col("f"), Seq(".dat", ".csv", ".parquet")))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("a.dat", "b.DAT", "c.Parquet", "d.csv", "w.tar.csv")))
  }

  test("P2: date2num is fractional days since the 1970 epoch") {
    val df = Seq("1970-01-01 00:00:00", "1970-01-02 12:00:00", "2024-03-15 12:00:00")
      .toDF("s")
    val out = df.select(date2num(to_timestamp(col("s")))).collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) == 1.5)
    assert(out(2) == 45366.5 - 25569.0) // OLE anchor minus epoch offset
  }

  test("P8: decimal comma parses, garbage nulls (coerce semantics)") {
    val df = Seq("1,23", "4.56", "-0,5", "abc").toDF("s")
    val out = df.select(decimalComma(col("s"))).collect()
    assert(out(0).getDouble(0) == 1.23)
    assert(out(1).getDouble(0) == 4.56)
    assert(out(2).getDouble(0) == -0.5)
    assert(out(3).isNullAt(0))
  }

  test("P13: event id is 16 hex chars and deterministic") {
    val df = Seq("""{"a":1,"b":2}""").toDF("j")
    val a = df.select(eventId(col("j"))).head.getString(0)
    val b = df.select(eventId(col("j"))).head.getString(0)
    assert(a == b && a.length == 16 && a.matches("[0-9a-f]{16}"))
  }
}
