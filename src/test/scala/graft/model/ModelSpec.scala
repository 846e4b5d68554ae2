package graft.model

import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {
  import StreamType._

  test("stream type widths and sentinels match the reference table") {
    assert(FullS.totalBits == 16 && FullS.invalidSentinel == 0xFFFFL)
    assert(ExtFull.totalBits == 18 && ExtFull.invalidSentinel == 0x3FFFFL)
    assert(ExtFull.maxValid == 262142L)        // etsdSave.c:292
    assert(ShortS.maxValid == 4094L)           // etsdSave.c:271
    assert(ExtTwenty.maxValid == 4194302L)     // etsdSave.c:240
    assert(DoubleS.maxValid == 0xFFFFFFFFL)    // 32-bit can't be invalid
    assert(TwoBit.totalBits == 2 && TwoBit.invalidSentinel == 3L)
  }

  test("channel destination byte round-trips all flag combinations") {
    for {
      t <- StreamType.all if t != DontSave
      counter <- Seq(true, false); reg <- Seq(true, false)
      signed <- Seq(true, false); edo <- Seq(true, false)
      // FloatS lanes carry binary16 patterns: counter/signed integer
      // semantics are rejected at construction (see ChannelConfig)
      if t != FloatS || (!counter && !signed)
    } {
      val c = ChannelConfig("x", t, counter, reg, signed, edo, sourceId = 2, sourceChan = 17)
      val back = ChannelConfig.fromBytes("x", c.sourceByte, c.destinationByte)
      assert(back == c, s"$t counter=$counter reg=$reg signed=$signed edo=$edo")
    }
    intercept[IllegalArgumentException](ChannelConfig("x", FloatS, counter = true))
    intercept[IllegalArgumentException](ChannelConfig("x", FloatS, signed = true))
  }

  test("channel name validation: [A-Za-z0-9_]{1,19} (etsdCmd.c:38-50)") {
    assert(ChannelConfig.nameOk("Garage_Main9"))
    assert(!ChannelConfig.nameOk(""))
    assert(!ChannelConfig.nameOk("a" * 20))
    assert(!ChannelConfig.nameOk("bad-name"))
    assert(!ChannelConfig.nameOk("has space"))
  }

  test("channel resolution: case-insensitive substring, first match wins") {
    val s = EtsdSchema(Seq(
      ChannelConfig("GarageMain", FullS),
      ChannelConfig("Servers", AutoScale),
      ChannelConfig("Fridge_Freezer", FullS)), 10, 24)
    assert(s.channelIndex("garage").contains(0))   // etsdQuery.c:193-203
    assert(s.channelIndex("SERVER").contains(1))
    assert(s.channelIndex("e").contains(0))        // substring: first wins
    assert(s.channelIndex("freezer").contains(2))
    assert(s.channelIndex("nope").isEmpty)
  }
}
