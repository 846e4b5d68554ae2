package graft.codec

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Pins the CLOSED FORMS the `ts_tsd_autoscale_roundtrip` and
  * `ts_tsd_counter_roundtrip` oracles rely on against the real
  * encoder/decoder on randomized feed sequences — so a future codec
  * change that silently invalidates either derivation fails here with a
  * pointed message instead of as a gate hash mismatch.
  *
  * AutoScale: decoded = min(raw >> S, 0xFFFE) << S with S the scale the
  * block's max valid value needs — write-order-independent because
  * right-shifts compose across retroactive rescales.
  *
  * Counter+register: consecutive valid odometer readings at slot
  * distance g emit (odo−prev)//g into slots [s−min(g−1, posInBlock), s];
  * the first valid reading stores invalid (anchor only); each block
  * start snapshots the last prior valid odometer into the register. */
class ClosedFormSpec extends AnyFunSuite with GenDriven {

  private val T0 = 1700000000L

  test("autoscale decode equals the block-max closed form") {
    val schema = EtsdSchema(
      Seq(ChannelConfig("a", StreamType.AutoScale)),
      intervalSec = 10, blockIntervals = 8)
    val genFeed: Gen[Seq[Option[Long]]] = Gen.listOfN(24,
      Gen.frequency(
        5 -> Gen.choose(0L, 524286L).map(Some(_)),
        2 -> Gen.choose(0L, 65535L).map(Some(_)), // keep scale-0 blocks common
        1 -> Gen.const(None)))
    forAll(genFeed) { feeds =>
      val enc = new EtsdEncoder(schema)
      feeds.zipWithIndex.foreach { case (v, i) =>
        enc.feed(T0 + i * 10L, IndexedSeq(
          v.fold(Reading(0L, status = 1))(Reading(_))))
      }
      val decoded = enc.blocks().flatMap(EtsdDecoder.decodeBlock(schema, _))
        .filterNot(_.isRegister)
        .map(s => ((s.tsEpoch - T0) / 10 - 1).toInt -> s.value).toMap
      feeds.grouped(8).zipWithIndex.foreach { case (block, b) =>
        val valid = block.flatten
        val s = valid.maxOption.fold(0) { mx =>
          if (mx < 65536L) 0 else if (mx < 131072L) 1
          else if (mx < 262144L) 2 else 3
        }
        block.zipWithIndex.foreach { case (v, i) =>
          val slot = b * 8 + i
          val want = v.map(raw => math.min(raw >> s, 0xFFFEL) << s)
          assert(decoded.get(slot).flatten == want,
            s"slot $slot raw=$v scale=$s: got ${decoded.get(slot)}")
        }
      }
    }
  }

  test("counter+register decode equals the prefix-sum closed form") {
    val schema = EtsdSchema(
      Seq(ChannelConfig("c", StreamType.LargeS,
        counter = true, register = true)),
      intervalSec = 10, blockIntervals = 8)
    // a monotone odometer observed at a random subset of 40 slots
    val genPresent: Gen[Seq[Boolean]] = Gen.listOfN(40,
      Gen.frequency(3 -> Gen.const(true), 1 -> Gen.const(false)))
    val genSteps: Gen[Seq[Long]] = Gen.listOfN(40, Gen.choose(0L, 5000L))
    forAll(genPresent, genSteps) { (present, steps) =>
      val odo = steps.scanLeft(0L)(_ + _).tail // cumulative, monotone
      val enc = new EtsdEncoder(schema)
      present.zipWithIndex.foreach { case (ok, i) =>
        enc.feed(T0 + i * 10L, IndexedSeq(
          if (ok) Reading(odo(i)) else Reading(0L, status = 1)))
      }
      val samples = enc.blocks().flatMap(EtsdDecoder.decodeBlock(schema, _))
      val deltas = samples.filterNot(_.isRegister)
        .map(s => ((s.tsEpoch - T0) / 10 - 1).toInt -> s.value).toMap
      val regs = samples.filter(_.isRegister)
        .map(s => ((s.tsEpoch - T0) / 10).toInt -> s.value).toMap

      // closed form: expected delta per slot
      val want = Array.fill[Option[Long]](40)(None)
      val validSlots = present.zipWithIndex.collect { case (true, i) => i }
      validSlots.zip(validSlots.drop(1)).foreach { case (p, s) =>
        val g = s - p
        val avg = (odo(s) - odo(p)) / g
        val blockStart = (s / 8) * 8
        val backfill = math.min(g - 1, s - blockStart)
        (s - backfill to s).foreach(i => want(i) = Some(avg))
      }
      (0 until 40).foreach { slot =>
        assert(deltas.get(slot).flatten == want(slot),
          s"slot $slot: got ${deltas.get(slot)} want ${want(slot)}")
      }
      // registers: last valid odometer strictly before each block start
      (0 until 5).foreach { b =>
        val l = b * 8
        val wantReg = validSlots.filter(_ < l).lastOption.map(odo)
        assert(regs.get(l).flatten == wantReg,
          s"block $l register: got ${regs.get(l)} want $wantReg")
      }
    }
  }
}
