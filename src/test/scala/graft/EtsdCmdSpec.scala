package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{BlockBuffer, EtsdEncoder, Reading}
import graft.model.{ChannelConfig, EtsdSchema, StreamType}

/** Golden tests for the etsdCmd-shaped CLI verbs (examine/dump + header
  * schema load). The query verb's logic is covered by EtsdSourceSpec via
  * EtsdQueryApi; here we exercise only the CLI-specific plumbing. */
class EtsdCmdSpec extends AnyFunSuite {

  private val schema = EtsdSchema(Seq(
    ChannelConfig("Mains", StreamType.FullS, counter = true, register = true),
    ChannelConfig("AuxTemp", StreamType.HalfS, signed = true, sourceId = 1,
      sourceChan = 3)), intervalSec = 10, blockIntervals = 6)

  private def writeTsd(): String = {
    val enc = new EtsdEncoder(schema)
    (0 until 12).foreach { k =>
      enc.feed(1700000000L + k * 10L, IndexedSeq(Reading(100L + k), Reading(k)))
    }
    val dir = Files.createTempDirectory("cmd").toString
    Files.write(Paths.get(dir, "a.tsd"), enc.toFileBytes())
    dir
  }

  test("loadSchema round-trips the header block from disk") {
    val dir = writeTsd()
    assert(EtsdCmd.loadSchema(dir) == schema)
    assert(EtsdCmd.loadSchema(dir + "/a.tsd") == schema)
  }

  test("examine prints geometry and per-channel flags") {
    val dir = writeTsd()
    val size = Files.size(Paths.get(dir, "a.tsd"))
    val out = EtsdCmd.examine(EtsdCmd.loadSchema(dir), size)
    assert(out.contains("interval 10s, 6 intervals/block, 2 data blocks"))
    assert(out.contains("Mains"))
    assert(out.contains("CR")) // counter + register flags
    assert(out.contains("src1:3")) // AuxTemp source byte
    assert(out.contains("GS")) // gauge + signed
  }

  test("dumpSector renders header and data blocks with bounds checks") {
    val dir = writeTsd()
    val hdr = EtsdCmd.dumpSector(dir, 0)
    assert(hdr.startsWith("sector 0 (header)"))
    assert(hdr.contains("AuxTemp")) // label blob visible in ASCII column
    val blk = EtsdCmd.dumpSector(dir, 1)
    assert(blk.startsWith("sector 1 ts=1700000000 validIntervals=6"))
    assert(blk.linesIterator.size == 1 + BlockBuffer.BlockSize / 16)
    intercept[IllegalArgumentException](EtsdCmd.dumpSector(dir, 9))
  }

  test("main dispatches on first letter like etsdCmd.c:618-663") {
    val dir = writeTsd()
    EtsdCmd.main(Array("examine", dir)) // prints; must not throw
    EtsdCmd.main(Array("d", dir, "2"))
    intercept[IllegalArgumentException](EtsdCmd.main(Array("zap", dir)))
  }
}
