package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EcmPackets._

/** srcECM packet decode: framing, checksum, resync, reset semantics, and
  * the bridge into the ingest pipeline (srcECM.c:120-255). */
class EcmPacketsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val good = encode(seconds = 10, acVoltsX10 = 1200, dcVoltsX10 = 133,
    counters = Seq(1L, 0xFFFFFFFFL + 7, 300L, 400L), // 5-byte counter > 2^32
    aux = Seq(11L, 12L, 13L, 14L, 15L))

  test("encode/decode round-trip of a single packet") {
    val r = decodeBuffer(99L, good) match { case Seq(one) => one }
    assert(r.valid && !r.reset)
    assert(r.seconds == 10 && r.ac_volts_x10 == 1200 && r.dc_volts_x10 == 133)
    assert(r.ac_code == 160) // 1200 - 1040
    assert(Seq(r.ch1a, r.ch2a, r.ch1p, r.ch2p) ==
      Seq(1L, 0xFFFFFFFFL + 7, 300L, 400L))
    assert(Seq(r.aux1, r.aux2, r.aux3, r.aux4, r.aux5) ==
      Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("garbage bytes between packets are skipped by header resync") {
    val noise = Array[Byte](0x00, 0xFE.toByte, 0x12, 0xFE.toByte, 0xFF.toByte)
    val buf = noise ++ good ++ noise ++ good ++ good.take(20) // partial tail
    val rs = decodeBuffer(1L, buf)
    assert(rs.length == 2 && rs.forall(r => r.valid && r.seconds == 10))
  }

  test("checksum corruption yields one invalid reading, then resync") {
    val bad = good.clone(); bad(7) = (bad(7) ^ 0x5A).toByte
    val rs = decodeBuffer(1L, bad ++ good)
    assert(rs.map(_.valid) == Seq(false, true))
    assert(rs.head.ac_code == 0xFF) // invalid marker
  }

  test("a false sync in garbage does not swallow a real packet behind it") {
    val falseSync = Array[Byte](0xFE.toByte, 0xFF.toByte, 0x03, 0, 0, 0, 0, 0, 0, 0)
    val rs = decodeBuffer(1L, falseSync ++ good)
    assert(rs.map(_.valid) == Seq(false, true)) // marker, then the real packet
    assert(rs(1).seconds == 10)
  }

  test("a garbage burst of repeated syncs emits ONE invalid marker") {
    val burst = Array.fill(30)(Array[Byte](0xFE.toByte, 0xFF.toByte, 0x03)).flatten
    val rs = decodeBuffer(1L, burst ++ good)
    assert(rs.map(_.valid) == Seq(false, true)) // not one marker per sync
    assert(rs(1).seconds == 10)
  }

  test("zero AC volts marks a source reset (power cycle)") {
    val cycled = encode(3, 0, 0, Seq(0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L))
    val r = decodeBuffer(1L, cycled) match { case Seq(one) => one }
    assert(r.valid && r.reset && r.ac_code == 0)
  }

  test("decodeStream + toSrcRows feed the ingest pipeline with daemon status codes") {
    import spark.implicits._
    val bad = good.clone(); bad(7) = (bad(7) ^ 0x5A).toByte
    val cycled = encode(3, 0, 0, Seq(0L, 0L, 0L, 0L), Seq(0L, 0L, 0L, 0L, 0L))
    val chunks = Seq((1000000L, good), (2000000L, bad), (3000000L, cycled)).toDS()
    val rows = toSrcRows(decodeStream(chunks), sourceId = 2).collect()
    assert(rows.length == 3 * 11) // 9 counters + 2 gauges per packet
    assert(rows.filter(_.ts_us == 1000000L).forall(_.status == 0))
    assert(rows.filter(_.ts_us == 2000000L).forall(_.status == 1))
    assert(rows.filter(_.ts_us == 3000000L).forall(_.status == 2))
    val ch2a = rows.find(r => r.ts_us == 1000000L && r.channel == "src2_ch2a").get
    assert(ch2a.reading == 0xFFFFFFFFL + 7 && ch2a.counter)
    val volts = rows.find(r => r.ts_us == 1000000L && r.channel == "src2_ac_volts").get
    assert(volts.reading == 160L && !volts.counter)
    // invalid rows zero the payload (the daemon stores the sentinel)
    assert(rows.filter(_.status == 1).forall(_.reading == 0L))
    // applyStatus downstream: status!=0 -> NULL value + valid=false
    val applied = Ingest.applyStatus(rows.toSeq.toDS().toDF())
    assert(applied.filter("NOT valid").count() == 22) // bad + cycled packets
    assert(applied.filter("value IS NULL").count() == 22)
    assert(applied.filter("is_reset").count() == 11)
  }
}
