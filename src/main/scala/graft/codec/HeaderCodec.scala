package graft.codec

import java.nio.charset.StandardCharsets.US_ASCII

import graft.model.{ChannelConfig, EtsdSchema}

/** Header block (sector 0) ↔ [[EtsdSchema]].
  *
  * Layout (etsd.c:54-107, etsdCmd.c:303-309):
  *   bytes 0-3   magic "ETSD" (LE uint32 1146311749, etsd.h:74)
  *   data[2]     uid<<14 | blockIntervals<<7 | channels
  *   data[3]     intervalTime (seconds)
  *   byte 8      labelSize = (Σ name length + channels + 1)/2
  *   byte 9      xDataSize
  *   bytes 10+2i source byte, 11+2i destination byte per channel
  *   then        NUL-terminated channel names, in order
  *
  * ETSD_EPOCH (etsd.h:79-88): the reference stores block timestamps as
  * 32-bit seconds and offers a configurable epoch offset macro
  * (`ETSD_TIME`/`ETSD_TO_EPOCH`, default offset 0) purely to extend the
  * useful range of that uint32 past 2106. This codec keeps timestamps
  * in Spark's 64-bit `TimestampType` end-to-end, which subsumes the
  * mechanism — no offset constant exists here, and on-disk `.tsd`
  * interop uses raw (offset-0) epoch seconds, matching the reference's
  * shipped default. */
object HeaderCodec {
  val Magic = 1146311749L // "ETSD"

  def encode(schema: EtsdSchema): Array[Byte] = {
    val buf = BlockBuffer()
    buf.setLongD(0, Magic)
    require((schema.uid & ~3) == 0, "uid is 2 bits (etsdCmd.c:304)")
    buf.setData(2, (schema.uid << 14) | (schema.blockIntervals << 7) | schema.channels.size)
    buf.setData(3, schema.intervalSec)
    val labelChars = schema.channels.map(_.name.length).sum
    require(10 + 2 * schema.channels.size + labelChars + schema.channels.size
      <= BlockBuffer.BlockSize, "labels exceed header block (etsdCmd.c:186-189)")
    buf.setByteD(8, (labelChars + schema.channels.size + 1) / 2)
    buf.setByteD(9, schema.xDataSize)
    schema.channels.zipWithIndex.foreach { case (c, i) =>
      buf.setByteD(10 + 2 * i, c.sourceByte)
      buf.setByteD(11 + 2 * i, c.destinationByte)
    }
    var off = 10 + 2 * schema.channels.size
    schema.channels.foreach { c =>
      val b = c.name.getBytes(US_ASCII)
      System.arraycopy(b, 0, buf.bytes, off, b.length)
      off += b.length + 1 // NUL terminator already zero
    }
    buf.bytes
  }

  def decode(bytes: Array[Byte]): EtsdSchema = {
    val buf = BlockBuffer(bytes)
    require(buf.longD(0) == Magic, "not an ETSD file (etsd.c:54-58)")
    val hdr = buf.data(2)
    val uid = (hdr >>> 14) & 3
    val blockIntervals = (hdr >>> 7) & 127
    val nChan = hdr & 127
    val intervalSec = buf.data(3)
    val xDataSize = buf.byteD(9)
    var off = 10 + 2 * nChan
    val channels = (0 until nChan).map { i =>
      val end0 = bytes.indexOf(0.toByte, off)
      val end = if (end0 < 0) bytes.length else end0
      val name = new String(bytes, off, end - off, US_ASCII)
      off = end + 1
      ChannelConfig.fromBytes(name, buf.byteD(10 + 2 * i), buf.byteD(11 + 2 * i))
    }
    EtsdSchema(channels, intervalSec, blockIntervals, uid, xDataSize)
  }
}
