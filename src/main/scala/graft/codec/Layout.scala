package graft.codec

import graft.model.{ChannelConfig, EtsdSchema, StreamType}

/** Per-channel storage addressing for one 512-byte ETSD data block.
  *
  * Units follow the reference: a "QS" (quarter-stream) unit is one nibble
  * per interval, i.e. `blockIntervals / 2` bytes of block space
  * (etsdSave.c:206-216: save16 addresses `data[3 + QS/4·BI + i]`, save8
  * `byteD[7 + QS/2·BI + i]`, save4 `byteD[7 + QS·(BI/2) + (i+1)/2]` — all
  * three resolve to region base `8 + QS·BI/2` bytes). Streams are laid out
  * in schema order after the 8-byte block header (timestamp, header-echo
  * word, scaling word); the 2-bit extended region follows the streams
  * (etsd.c:109), then xData, then 32-bit registers growing backwards from
  * the block end (etsdSave.c:149-151: `longD[128-reg]`).
  *
  * Channel order must be storage order: descending stream width
  * 15,14,13,9,8,12,5,4,11,10,7,6,3,2,1 (etsdCmd.c:93 `order[]` reversed;
  * the create path's loop reads one element out of bounds — we implement
  * the evident intent).
  *
  * @param qs      nibble-unit offset of the channel's stream region
  * @param extIdx  0-based index into the 2-bit extended region, -1 if none
  * @param ascIdx  0-based autoscale slot (2 bits in the scaling word), -1
  * @param regIdx  1-based register slot from the block end, 0 if none
  */
final case class ChanAddr(qs: Int, extIdx: Int, ascIdx: Int, regIdx: Int)

final class Layout(val schema: EtsdSchema) {
  import StreamType._

  private def qsWidth(t: StreamType): Int = t match {
    case DontSave => 0
    case DoubleS  => 8
    case FloatS   => 4 // 16-bit binary16 lane, FullS-shaped
    case AutoScale => 4
    case other    => (other.code & 14) / 2 // 2-bit:0, 4:1, 8:2, 12:3, 16:4, 20:5, 24:6
  }

  /** extStart "streams" unit = 2 bits/interval (etsd.c:77-90). */
  private def streamUnits(t: StreamType): Int = t match {
    case DontSave => 0
    case DoubleS  => 16
    case FloatS   => 8
    case AutoScale => 8
    case other    => other.code & 14
  }

  private def hasExt(c: ChannelConfig): Boolean =
    (c.streamType.code & 1) == 1 && c.streamType.code < 13 // EXTS_BIT, etsd.h:51

  // storage-order check (stored channels only; type-0 channels hold no space)
  private val SortRank: Map[Int, Int] =
    Seq(15, 14, 13, 9, 8, 12, 5, 4, 11, 10, 7, 6, 3, 2, 1).zipWithIndex.toMap
  locally {
    val ranks = schema.channels.filter(_.streamType != DontSave)
      .map(c => SortRank(c.streamType.code))
    require(ranks == ranks.sorted,
      "channels must be in storage order (descending stream width, etsdCmd.c:93)")
  }

  val blockIntervals: Int = schema.blockIntervals

  /** Addressing per channel, accumulated in schema order (the same
    * accumulation the reference does per call in saveChan/readChan,
    * etsdSave.c:349-374, etsdRead.c:191-223 — we precompute it once). */
  val addr: IndexedSeq[ChanAddr] = {
    var qs = 0; var ext = 0; var asc = 0; var reg = 0
    schema.channels.map { c =>
      val saved = c.streamType != DontSave
      val a = ChanAddr(
        qs = qs,
        extIdx = if (saved && hasExt(c)) ext else -1,
        ascIdx = if (saved && c.streamType == AutoScale) asc else -1,
        regIdx = if (saved && c.register) reg + 1 else 0)
      if (saved) {
        qs += qsWidth(c.streamType)
        if (hasExt(c)) ext += 1
        if (c.streamType == AutoScale) asc += 1
        if (c.register) reg += 1
      }
      a
    }.toIndexedSeq
  }

  val totalQs: Int = schema.channels.map(c => qsWidth(c.streamType)).sum
  val extCount: Int = schema.channels.count(hasExt)
  val registers: Int = schema.channels.count(c => c.register && c.streamType != DontSave)
  private val totalStreamUnits = schema.channels.map(c => streamUnits(c.streamType)).sum

  /** Byte offset where the 2-bit extended region starts
    * (etsd.c:109: `8.75 + blockIntervals·streams/4.0`, float-truncated). */
  val extStart: Int = (8.75 + blockIntervals * totalStreamUnits / 4.0).toInt

  /** Byte offset of the xData region (etsd.c:110). The reference's formula
    * omits the blockIntervals factor on the ext-region size; its own
    * saveExtS addressing (startP + fAddr, etsdSave.c:196-198) effectively
    * spans `2·extIdx·BI/4` bytes per ext stream, so we size the region from
    * the addressing that actually writes it (intent over the stale
    * formula). */
  val xDataStart: Int = {
    val extBytes =
      if (extCount == 0) 0
      else (extCount - 1) * blockIntervals / 4 +
        ((blockIntervals.toLong * (extCount - 1) + blockIntervals - 1) / 4.0).toInt + 1
    extStart + extBytes
  }

  require(schema.channels.count(_.streamType == AutoScale) <= 7,
    "at most 7 autoscale channels: scaling word bits 14-15 are reset flags (etsd.h:38-41)")

  // nibble-granular types need an even interval count or lanes alias
  // (the reference's own save4 truncates BI/2, etsdSave.c:214 "pete check")
  require(blockIntervals % 2 == 0 ||
    !schema.channels.exists(c => qsWidth(c.streamType) % 2 == 1 ||
      Set(6, 7, 10, 11).contains(c.streamType.code)),
    "odd blockIntervals requires byte-aligned stream types only")

  require(xDataStart + schema.xDataSize <= BlockBuffer.BlockSize - 4 * registers,
    s"block overflow: streams+ext end at $xDataStart, xData ${schema.xDataSize}, " +
      s"$registers registers (capacity rule etsdCmd.c:295-299)")

  /** Header-echo word for data blocks: uid<<14 | blockIntervals<<7
    * (etsdCmd.c:303-304, etsd.c:60; low 7 bits carry validIntervals,
    * etsdSave.c:59). */
  val headerEcho: Int = ((schema.uid & 3) << 14) | (blockIntervals << 7)
}

object Layout {
  private val Order = Seq(15, 14, 13, 9, 8, 12, 5, 4, 11, 10, 7, 6, 3, 2, 1, 0)
    .zipWithIndex.toMap

  /** Stable sort into storage order (the create path's width sort,
    * etsdCmd.c:93,167-185; type-0 channels hold no space and go last). */
  def sortChannels(cs: Seq[ChannelConfig]): Seq[ChannelConfig] =
    cs.sortBy(c => Order(c.streamType.code))
}
