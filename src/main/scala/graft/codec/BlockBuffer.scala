package graft.codec

/** A 512-byte ETSD block with the reference's three overlapping views
  * (`PBLOCK` union, etsd.h:118-124): bytes, little-endian 16-bit words
  * (`data`), little-endian 32-bit longs (`longD`). All multi-byte access
  * is little-endian, matching the reference's x86/ARM on-disk layout
  * (header bytes written LE at etsdCmd.c:303-309).
  */
final class BlockBuffer(val bytes: Array[Byte]) {
  require(bytes.length == BlockBuffer.BlockSize, "ETSD blocks are 512 bytes")

  def byteD(i: Int): Int = bytes(i) & 0xFF
  def setByteD(i: Int, v: Int): Unit = bytes(i) = (v & 0xFF).toByte

  /** 16-bit word view (`PBlock.data`). */
  def data(i: Int): Int = byteD(2 * i) | (byteD(2 * i + 1) << 8)
  def setData(i: Int, v: Int): Unit = {
    setByteD(2 * i, v)
    setByteD(2 * i + 1, v >>> 8)
  }

  /** 32-bit view (`PBlock.longD`), as unsigned-in-Long. */
  def longD(i: Int): Long =
    (data(2 * i) | (data(2 * i + 1).toLong << 16)) & 0xFFFFFFFFL
  def setLongD(i: Int, v: Long): Unit = {
    setData(2 * i, (v & 0xFFFF).toInt)
    setData(2 * i + 1, ((v >>> 16) & 0xFFFF).toInt)
  }

  /** Block timestamp, epoch seconds (TIME_STAMP, etsd.h:126). */
  def timestamp: Long = longD(0)
  def setTimestamp(t: Long): Unit = setLongD(0, t)

  /** Valid-interval count in the block header echo word
    * (VALID_INTERVALS = data[2] & 127, etsd.h:55). */
  def validIntervals: Int = data(2) & 127

  /** Per-block autoscale/reset word (SCALING = data[3], etsd.h:125). */
  def scaling: Int = data(3)
  def setScaling(v: Int): Unit = setData(3, v)
}

object BlockBuffer {
  val BlockSize = 512

  def apply(): BlockBuffer = new BlockBuffer(new Array[Byte](BlockSize))
  def apply(bytes: Array[Byte]): BlockBuffer = new BlockBuffer(bytes)
}
