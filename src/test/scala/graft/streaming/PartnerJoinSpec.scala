package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** J2 — watermarked stream-stream partner join over real file-arrival
  * streams: partners sharing a window key join; a late partner joins on
  * arrival (T4 late-data buffering); keyless files never join. */
class PartnerJoinSpec extends SparkSpec {

  private def touch(dir: Path, name: String): Unit =
    Files.write(dir.resolve(name), Array[Byte](1))

  test("partner files sharing a window key join; late partner joins on arrival") {
    val oneHz = Files.createTempDirectory("pj_1hz")
    val hundredHz = Files.createTempDirectory("pj_100hz")
    val ckpt = Files.createTempDirectory("pj_ckpt")

    touch(oneHz, "alarm_1hz_2024-03-15_12-00-00.dat")
    touch(hundredHz, "fhe_100hz_2024-03-15_12-00-00.dat")
    touch(oneHz, "lonely_1hz_2024-03-15_12-10-00.dat") // no partner yet
    touch(oneHz, "junk-no-key.dat") // unparsable: must never join

    val joined = PartnerJoin.joinPartners(
      PartnerJoin.fileEvents(spark, oneHz.toString),
      PartnerJoin.fileEvents(spark, hundredHz.toString))

    val query = joined.writeStream
      .format("memory").queryName("pj_out").outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      query.processAllAvailable()
      val round1 = spark.table("pj_out").collect()
      assert(round1.length == 1)
      assert(round1.head.getString(0) == "2024-03-15_12-00-00")
      assert(round1.head.getString(1).contains("alarm_1hz"))
      assert(round1.head.getString(2).contains("fhe_100hz"))

      // the lonely file's partner arrives late → buffered left side matches
      touch(hundredHz, "fhe_100hz_2024-03-15_12-10-00.dat")
      query.processAllAvailable()
      val round2 = spark.table("pj_out").collect()
      assert(round2.length == 2)
      assert(round2.exists(r => r.getString(0) == "2024-03-15_12-10-00"
        && r.getString(1).contains("lonely_1hz")))
    } finally query.stop()
  }
}
