package graft.codec

import scala.collection.mutable.ArrayBuffer

import graft.model.{EtsdSchema, StreamType}

/** One reading handed to the encoder: `status` 0 = good, 1 = invalid
  * (checksum/timeout), 2 = source reset (edd.c:322-331,
  * plugins/sourceAPI.txt:46-47). `data` is the raw source value — an
  * absolute odometer reading for counter channels, the measurement itself
  * for gauges; signed gauges pass the signed value. */
final case class Reading(data: Long, status: Int = 0)

/** One decoded sample. For counter channels `value` is the stored delta
  * (averaged over missed intervals by the writer); for gauges the absolute
  * (sign-decoded) value; for register rows the absolute 32-bit snapshot.
  * `value = None` = the invalid sentinel (DATA_INVALID). */
final case class Sample(tsEpoch: Long, chan: Int, value: Option[Long], isRegister: Boolean)

/** Stateful block writer with the daemon's per-channel decode state —
  * `LastReading`/`MissedUpdate` (etsd.c:113-121) and the saveChan counter
  * logic (etsdSave.c:339-472): counters store `(reading − last)/(1+missed)`
  * with uint32 wraparound, backfilling up to 255 missed intervals with the
  * averaged delta; register channels snapshot the last absolute reading at
  * each block start (edd.c:371-382).
  */
final class EtsdEncoder(val schema: EtsdSchema,
    xDataFn: Long => Option[Array[Byte]] = _ => None) {
  val layout = new Layout(schema)
  val codec = new BlockCodec(layout)
  private val n = schema.channels.size
  private val Invalid = 0xFFFFFFFFL

  private val last = Array.fill(n)(Invalid)
  private val missed = Array.fill(n)(0)
  private var buf: BlockBuffer = null
  private var interV = 0
  private val out = ArrayBuffer.empty[Array[Byte]]

  def blockFull: Boolean = interV >= schema.blockIntervals

  /** Feed one interval's readings (one per channel). Starts a new block as
    * needed (stamped with this interval's timestamp, registers snapshotted
    * from current state). */
  def feed(tsEpoch: Long, readings: IndexedSeq[Reading]): Unit = {
    require(readings.length == n, s"expected $n readings")
    if (buf == null) {
      buf = codec.newBlock(tsEpoch)
      interV = 0
      var c = 0
      while (c < n) { // interval-0 register snapshot (saveChan interV=0 path)
        val cfg = schema.channels(c)
        if (cfg.register && cfg.streamType != StreamType.DontSave && last(c) != Invalid)
          codec.writeRegister(buf, c, last(c))
        c += 1
      }
    }
    interV += 1
    var c = 0
    while (c < n) {
      saveChan(c, readings(c))
      c += 1
    }
    if (blockFull) commit()
  }

  private def saveChan(c: Int, r: Reading): Unit = {
    val cfg = schema.channels(c)
    if (cfg.streamType == StreamType.DontSave) return
    val bits = cfg.streamType.totalBits
    var wire = Invalid
    var backfill = 0
    if (!cfg.counter || r.status != 0) { // gauge, or any-channel invalid data
      wire =
        if (r.status != 0) Invalid
        else if (cfg.signed) SignedCodec.encode(bits, r.data)
        else r.data & 0xFFFFFFFFL
      if (r.status == 2) { last(c) = Invalid; missed(c) = 0 } // source reset
    } else { // counter with good data
      if (last(c) != Invalid) {
        backfill = math.min(missed(c), interV - 1)
        wire = ((r.data - last(c)) & 0xFFFFFFFFL) / (1 + missed(c))
      } // else: first-ever reading, store invalid, no backfill
    }
    var i = interV - backfill
    while (i <= interV) { codec.writeSample(buf, c, i, wire); i += 1 }
    if (cfg.counter) {
      if (r.status != 0) {
        missed(c) += 1
        if (missed(c) > 255) { last(c) = Invalid; missed(c) = 0 } // give up (etsdSave.c:450-453)
      } else { missed(c) = 0; last(c) = r.data & 0xFFFFFFFFL }
    }
  }

  /** Close the current (possibly short) block. The daemon writes xData
    * once per block just before commit (xdRead → etsdCommit,
    * edd.c:354-368); `xDataFn` is queried with the block's timestamp. */
  def commit(): Unit = if (buf != null) {
    if (schema.xDataSize > 0) xDataFn(buf.timestamp).foreach { b =>
      require(b.length <= schema.xDataSize,
        s"xData ${b.length} B exceeds schema xDataSize ${schema.xDataSize}")
      var i = 0
      while (i < b.length) { codec.writeXData(buf, i, b(i) & 0xFF); i += 1 }
    }
    buf.setData(2, layout.headerEcho | interV) // valid-interval count (etsdSave.c:59)
    out += buf.bytes
    buf = null
    interV = 0
  }

  /** Committed blocks so far (commit any open block first). */
  def blocks(): Seq[Array[Byte]] = { commit(); out.toSeq }

  /** Whole file: header block + data blocks. */
  def toFileBytes(): Array[Byte] =
    (HeaderCodec.encode(schema) +: blocks()).reduce(_ ++ _)
}

object EtsdDecoder {

  /** Stateless single-block decode — register rows (interval 0) then one
    * row per channel per valid interval (readChan dispatch,
    * etsdRead.c:181-287, minus its precedence bugs). Counter rows carry the
    * stored delta; cross-block absolute reconstruction is a separate
    * (distributable) step, anchored at the register rows. Sample k's time
    * is `blockTime + k·intervalTime` (etsdQuery.c:239,311).
    *
    * `keep` skips whole channels without touching their bit regions —
    * the reference's primary query mode reads ONE channel's stream per
    * block (etsdQuery.c:304-371), and a pushed channel predicate makes a
    * C-channel file cost 1/C the decode CPU here too (addressing is
    * precomputed in [[Layout]], so skipping is free). */
  def decodeBlock(schema: EtsdSchema, bytes: Array[Byte],
                  keep: Int => Boolean = _ => true): Seq[Sample] =
    decodeBlock(new BlockCodec(new Layout(schema)), bytes, keep)

  /** [[decodeBlock]] with the per-schema addressing hoisted out: `codec`
    * (and its layout) is pure schema-derived state, so a multi-block
    * caller builds it ONCE instead of re-deriving the channel addressing
    * for every 512-byte block (the per-block rebuild dominated decode
    * CPU on block-dense scans). */
  def decodeBlock(codec: BlockCodec, bytes: Array[Byte],
                  keep: Int => Boolean): Seq[Sample] = {
    val schema = codec.layout.schema
    val buf = BlockBuffer(bytes)
    val ts = buf.timestamp
    val nIv = math.min(buf.validIntervals, schema.blockIntervals)
    val out = ArrayBuffer.empty[Sample]
    schema.channels.zipWithIndex.foreach { case (cfg, c) =>
      if (cfg.streamType != StreamType.DontSave && keep(c)) {
        if (cfg.register) {
          val v = codec.readRegister(buf, c)
          out += Sample(ts, c, if (v == 0xFFFFFFFFL) None else Some(v), isRegister = true)
        }
        var i = 1
        while (i <= nIv) {
          val wire = codec.readSample(buf, c, i)
          val v =
            if (codec.isInvalid(c, wire)) None
            else if (cfg.signed) Some(SignedCodec.decode(cfg.streamType.totalBits, wire))
            else Some(wire)
          out += Sample(ts + i.toLong * schema.intervalSec, c, v, isRegister = false)
          i += 1
        }
      }
    }
    out.toSeq
  }

  /** Per-block opaque xData bytes (etsd.h:102-103; saveXData
    * etsdSave.c:138-145, readBlockData etsdRead.h:29). Empty array when
    * the schema reserves no xData region. */
  def blockXData(layout: Layout, bytes: Array[Byte]): Array[Byte] =
    if (layout.schema.xDataSize == 0) Array.emptyByteArray
    else bytes.slice(layout.xDataStart, layout.xDataStart + layout.schema.xDataSize)

  /** Whole-file decode: header + every 512-byte data block. */
  def decodeFile(bytes: Array[Byte]): (EtsdSchema, Seq[Sample]) = {
    require(bytes.length % BlockBuffer.BlockSize == 0, "truncated ETSD file")
    val schema = HeaderCodec.decode(bytes.take(BlockBuffer.BlockSize))
    val codec = new BlockCodec(new Layout(schema))
    val samples = (BlockBuffer.BlockSize until bytes.length by BlockBuffer.BlockSize)
      .flatMap(off => decodeBlock(codec, bytes.slice(off, off + BlockBuffer.BlockSize), _ => true))
    (schema, samples)
  }

  /** Sequential absolute reconstruction of counter channels — the
    * `LastReading += delta` loop re-anchored at registers
    * (etsdRead.c:270-285). Reference oracle for tests; the distributed
    * form is operators.TimeSeriesOps.counterReconstruct. */
  def reconstructCounters(schema: EtsdSchema, samples: Seq[Sample]): Seq[Sample] = {
    val lastR = Array.fill(schema.channels.size)(-1L)
    samples.map { s =>
      if (!schema.channels(s.chan).counter) s
      else if (s.isRegister) {
        s.value.foreach(v => lastR(s.chan) = v)
        s
      } else s.value match {
        case Some(d) if lastR(s.chan) >= 0 =>
          lastR(s.chan) = (lastR(s.chan) + d) & 0xFFFFFFFFL
          s.copy(value = Some(lastR(s.chan)))
        case _ => s.copy(value = None)
      }
    }
  }
}
