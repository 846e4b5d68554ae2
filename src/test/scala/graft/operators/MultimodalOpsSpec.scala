package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", Array.tabulate(40)(i => (i * 7).toByte), 640, 480, 0),
      MediaRow(2L, "audio", Array.tabulate(16)(i => i.toByte), 0, 0, 16000),
      MediaRow(3L, "video", Array.tabulate(33)(i => (255 - i).toByte), 1920, 1080, 0)
    ).toDS()
  }

  test("extractFeatures: batched decode with typed output and exact shapes") {
    val feats = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.n_bytes).toSeq == Seq(40L, 16L, 33L))
    assert(feats.map(_.n_frames).toSeq == Seq(3, 1, 3)) // ceil(bytes/16)
    assert(feats.forall(_.feature.length == MultimodalOps.FeatureDim))
    // the stub is a pure function of the payload: same input, same feature
    assert(feats(1).feature.toSeq ==
      MultimodalOps.decodeStub(Array.tabulate(16)(i => i.toByte)).toSeq)
    // distinct payloads produce distinct features
    assert(feats.map(_.feature.toSeq).distinct.length == 3)
  }

  test("sampleFrames: strided byte-range slices, short tail preserved") {
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    // media 1: frames 0,2 of 3; media 2: frame 0 of 1; media 3: frames 0,2 of 3
    assert(frames.map(f => (f.media_id, f.frame_idx)).toSeq ==
      Seq((1L, 0), (1L, 2), (2L, 0), (3L, 0), (3L, 2)))
    assert(frames.head.frame.length == 16)
    assert(frames(1).frame.length == 8)          // 40-byte payload tail
    assert(frames.last.frame.toSeq ==
      Array.tabulate(1)(i => (255 - 32 - i).toByte).toSeq) // 33rd byte only
  }

  test("binaryStats agrees with the decode path on sizes and frame counts") {
    import spark.implicits._
    val stats = MultimodalOps.binaryStats(media).orderBy("media_id")
      .select($"n_bytes", $"n_frames").as[(Long, Long)].collect().toSeq
    assert(stats == Seq((40L, 3L), (16L, 1L), (33L, 3L)))
  }

  test("frameDedup flags a frame shared across media, counts occurrences") {
    import spark.implicits._
    val shared = Array.tabulate(16)(i => (i * 3).toByte)
    val dup = Seq(
      // media 10/11 share their first frame; 11 also repeats it at
      // sampled index 2 (n_occ counts occurrences, n_media distinct)
      MediaRow(10L, "video", shared ++ Array.fill(16)(1.toByte), 0, 0, 0),
      MediaRow(11L, "video",
        shared ++ Array.fill(16)(2.toByte) ++ shared, 0, 0, 0),
      MediaRow(12L, "image", Array.fill(16)(9.toByte), 0, 0, 0)).toDS()
    val got = graft.Pins.scoped {
      MultimodalOps.frameDedup(dup)
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    assert(got.size == 1, got)
    val (_, nMedia, nOcc, firstMedia) = got.head
    assert(nMedia == 2L && nOcc == 3L && firstMedia == 10L, got)
  }

  test("declarative frameDedup slicing matches the typed sampleFrames path") {
    import spark.implicits._
    // geometry edge cases on purpose: short tails (40, 33 bytes), an
    // exactly-one-frame payload (16), an empty payload (zero frames),
    // and a NULL payload (zero frames) — the declarative explode +
    // substring slicing must agree with sampleFrames' flatMap hash-for-
    // hash, else the two pipelines would silently drift
    val corpus = Seq(
      MediaRow(1L, "image", Array.tabulate(40)(i => (i * 7).toByte), 0, 0, 0),
      MediaRow(2L, "audio", Array.tabulate(16)(i => i.toByte), 0, 0, 0),
      MediaRow(3L, "video", Array.tabulate(33)(i => (255 - i).toByte), 0, 0, 0),
      MediaRow(4L, "image", Array.empty[Byte], 0, 0, 0),
      MediaRow(5L, "image", null, 0, 0, 0),
      MediaRow(6L, "video", Array.tabulate(40)(i => (i * 7).toByte), 0, 0, 0)
    ).toDS()
    val declarative = graft.Pins.scoped {
      MultimodalOps.frameDedup(corpus, minMedia = 1)
        .as[(String, Long, Long, Long)].collect().toSet
    }
    val typed = graft.Pins.scoped {
      MultimodalOps.frameDedup(MultimodalOps.sampleFrames(corpus),
          minMedia = 1L)
        .as[(String, Long, Long, Long)].collect().toSet
    }
    assert(declarative == typed)
    assert(declarative.exists(_._2 == 2L),
      "fixture must exercise a cross-media shared frame")
  }
}
