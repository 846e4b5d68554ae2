package graft.streaming

import org.apache.spark.sql.Dataset

/** The srcECM input plugin (plugins/srcECM.c:120-255) re-expressed as a
  * Spark transform: framing, checksum, and field extraction of Brultech
  * ECM-1240-style 65-byte serial packets arriving as opaque binary
  * buffers (a socket/Kafka device bridge delivers byte chunks; this
  * decodes them into typed readings).
  *
  * Wire format (sync scan + additive checksum, srcECM.c:137-173):
  *   [0..2]   sync 0xFE 0xFF 0x03
  *   [3..4]   AC volts ×10, big-endian (the one big-endian field)
  *   [5..24]  Ch1A, Ch2A, Ch1P, Ch2P — 5-byte little-endian counters
  *   [25..28] serial / flags (opaque here)
  *   [29..30] DC volts ×10, little-endian; [31..39] device info (opaque)
  *   [40..59] Aux1..Aux5 — 4-byte little-endian counters
  *   [60..61] seconds counter, little-endian
  *   [62]     reserved
  *   [63]     (last checksummed byte) reserved
  *   [64]     checksum = sum of bytes [0..63] mod 256
  *
  * Status semantics follow the daemon (srcECM.c:175-199, edd.c:318-331):
  * checksum mismatch → invalid reading (status 1); AC volts == 0 → the
  * meter was power-cycled → source reset (status 2). Garbage between
  * packets is skipped by re-syncing on the header, exactly like the
  * reference's byte-wise header state machine.
  *
  * Decode is per-buffer imperative byte logic (like the `.tsd` block
  * decoder) — a `flatMap` over the binary column is the honest Spark
  * shape; everything downstream (status handling, counter deltas, block
  * commits) is the declarative [[Ingest]] pipeline. */
object EcmPackets {

  val PacketLen = 65
  private val Sync = Array(0xFE.toByte, 0xFF.toByte, 0x03.toByte)

  /** One decoded packet. Counters are raw odometers; `ac_code` is the
    * offset-encoded byte ([[Ingest.acVoltsEncode]] of the raw ×10 value).
    * `valid=false` → checksum failure (fields zeroed); `reset` → power
    * cycle detected. */
  final case class EcmReading(recv_us: Long, seconds: Int, ac_volts_x10: Int,
      ac_code: Int, dc_volts_x10: Int, ch1a: Long, ch2a: Long, ch1p: Long,
      ch2p: Long, aux1: Long, aux2: Long, aux3: Long, aux4: Long, aux5: Long,
      valid: Boolean, reset: Boolean)

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  /** Decode every complete, sync-aligned packet in one buffer. Trailing
    * partial packets are dropped (a stateful reassembly source would carry
    * them into the next chunk; chunk == packet for the common bridge). */
  def decodeBuffer(recvUs: Long, buf: Array[Byte]): Seq[EcmReading] = {
    val out = Seq.newBuilder[EcmReading]
    var i = 0
    var inFailureBurst = false // one invalid marker per garbage burst
    while (i + PacketLen <= buf.length) {
      if (buf(i) == Sync(0) && buf(i + 1) == Sync(1) && buf(i + 2) == Sync(2)) {
        var sum = 0
        var j = 0
        while (j < PacketLen - 1) { sum = (sum + (buf(i + j) & 0xFF)) & 0xFF; j += 1 }
        if (sum == (buf(i + PacketLen - 1) & 0xFF)) {
          inFailureBurst = false
          val acX10 = ((buf(i + 3) & 0xFF) << 8) | (buf(i + 4) & 0xFF) // big-endian
          out += EcmReading(recvUs,
            seconds = le(buf, i + 60, 2).toInt,
            ac_volts_x10 = acX10,
            ac_code = acCode(acX10),
            dc_volts_x10 = le(buf, i + 29, 2).toInt,
            ch1a = le(buf, i + 5, 5), ch2a = le(buf, i + 10, 5),
            ch1p = le(buf, i + 15, 5), ch2p = le(buf, i + 20, 5),
            aux1 = le(buf, i + 40, 4), aux2 = le(buf, i + 44, 4),
            aux3 = le(buf, i + 48, 4), aux4 = le(buf, i + 52, 4),
            aux5 = le(buf, i + 56, 4),
            valid = true, reset = acX10 == 0)
          i += PacketLen
        } else {
          // checksum failure: resync from just past the sync bytes — a
          // false sync inside garbage must not swallow a real packet
          // starting within the failed window (the reference's byte-wise
          // state machine recovers it too). Only the FIRST failure of a
          // burst emits an invalid marker: repeated false syncs in line
          // noise would otherwise flood downstream invalid accounting.
          if (!inFailureBurst)
            out += EcmReading(recvUs, 0, 0, 0xFF, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
              valid = false, reset = false)
          inFailureBurst = true
          i += Sync.length
        }
      } else i += 1 // garbage byte: scan forward for the sync header
    }
    out.result()
  }

  /** AC-voltage offset byte (srcECM.c:45-47,238-253; same coding as
    * [[Ingest.acVoltsEncode]], scalar form for the decoder). */
  def acCode(x10: Int): Int =
    if (x10 == 0) 0
    else if (x10 < Ingest.AcOffset) 1
    else math.min(x10 - Ingest.AcOffset.toInt, 0xFE)

  /** Spark transform: (receive-time µs, raw buffer) chunks → typed
    * readings. Distributed decode; each buffer is self-contained. */
  def decodeStream(chunks: Dataset[(Long, Array[Byte])]): Dataset[EcmReading] = {
    import chunks.sparkSession.implicits._
    chunks.flatMap { case (ts, buf) => decodeBuffer(ts, buf) }
  }

  /** The 15-channel `srcReadChan` view (srcECM.c:219-255) as ingest rows
    * for [[Ingest.unionSources]]: counters keep their odometers, gauges
    * carry instantaneous values, status mirrors the daemon codes. */
  def toSrcRows(readings: Dataset[EcmReading], sourceId: Int): Dataset[SrcRow] = {
    import readings.sparkSession.implicits._
    val chans: Seq[(String, EcmReading => Long, Boolean)] = Seq(
      ("ch1a", _.ch1a, true), ("ch2a", _.ch2a, true),
      ("ch1p", _.ch1p, true), ("ch2p", _.ch2p, true),
      ("aux1", _.aux1, true), ("aux2", _.aux2, true), ("aux3", _.aux3, true),
      ("aux4", _.aux4, true), ("aux5", _.aux5, true),
      ("dc_volts", _.dc_volts_x10.toLong, false),
      ("ac_volts", _.ac_code.toLong, false))
    readings.flatMap { r =>
      val status = if (!r.valid) 1 else if (r.reset) 2 else 0
      chans.map { case (name, get, isCounter) =>
        SrcRow(r.recv_us, sourceId, s"src${sourceId}_$name",
          if (r.valid) get(r) else 0L, status, isCounter)
      }
    }
  }

  /** Build a wire packet (the device/bridge side; test fixture and
    * simulator). Inverse of [[decodeBuffer]] for valid inputs. */
  def encode(seconds: Int, acVoltsX10: Int, dcVoltsX10: Int,
             counters: Seq[Long], aux: Seq[Long]): Array[Byte] = {
    require(counters.size == 4 && aux.size == 5, "4 main + 5 aux counters")
    val b = new Array[Byte](PacketLen)
    Sync.copyToArray(b)
    b(3) = ((acVoltsX10 >> 8) & 0xFF).toByte // big-endian
    b(4) = (acVoltsX10 & 0xFF).toByte
    def putLe(off: Int, v: Long, n: Int): Unit =
      (0 until n).foreach(k => b(off + k) = ((v >> (8 * k)) & 0xFF).toByte)
    counters.zipWithIndex.foreach { case (v, k) => putLe(5 + 5 * k, v, 5) }
    putLe(29, dcVoltsX10.toLong, 2)
    aux.zipWithIndex.foreach { case (v, k) => putLe(40 + 4 * k, v, 4) }
    putLe(60, seconds.toLong, 2)
    b(PacketLen - 1) = (b.take(PacketLen - 1).map(_ & 0xFF).sum & 0xFF).toByte
    b
  }
}
