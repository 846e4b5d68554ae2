package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** Seeded randomized cross-checks: each round-6 analytics operator vs a
  * straight-line Scala reference on generated data — the distributed
  * two-phase/rank/join forms must agree with the obvious single-machine
  * fold on every draw. Fixed seeds keep CI deterministic; the draws are
  * adversarial where it matters (duplicate values for rank ties,
  * duplicate timestamps for session/deriv tie-breaks, sparse buckets).
  */
class RandomizedAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val t0 = 1700000000L

  test("percentiles == sorted order statistic on random ties-heavy data") {
    val rng = new scala.util.Random(101)
    // few distinct values -> heavy rank ties; tie-break must keep the
    // kth order statistic exact
    val rows = (1L to 400L).map(i =>
      (s"c${rng.nextInt(3)}", rng.nextInt(10).toDouble, i))
    val got = Pins.scoped {
      TimeSeriesOps.percentiles(rows.toDF("channel", "value", "event_id"),
          $"channel", $"value", $"event_id", Seq(25, 50, 90, 100))
        .as[(String, Long, Double, Long)].collect().toSet
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val sorted = rs.map(r => math.round(r._2 * 100)).sorted
      Seq(25, 50, 90, 100).map { p =>
        val k = ((sorted.size.toLong * p + 99) / 100).toInt
        (c, p.toLong, sorted(k - 1) / 100.0, sorted.size.toLong)
      }
    }.toSet
    assert(got == want)
  }

  test("sessionize == single-machine fold on random gappy streams") {
    val rng = new scala.util.Random(202)
    val rows = (1L to 300L).map { i =>
      val user = rng.nextInt(5).toLong
      // gaps cluster around the 600s threshold; duplicates included
      (user, t0 + rng.nextInt(40) * 310L, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.sessionize(
          rows.toDF("user_id", "sec", "event_id")
            .select($"user_id", timestamp_seconds($"sec").as("ts"),
              $"event_id"),
          $"user_id", $"ts", $"event_id", gapSec = 600L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
    val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val ordered = rs.map(r => (r._2, r._3)).sorted
      val sessions = ordered.foldLeft(Vector.empty[Vector[Long]]) {
        case (acc, (t, _)) =>
          if (acc.nonEmpty && t - acc.last.last <= 600L)
            acc.init :+ (acc.last :+ t)
          else acc :+ Vector(t)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (u, i + 1L, s.head * 1000000L, s.last * 1000000L, s.size.toLong)
      }
    }.toSet
    assert(got == want)
  }

  test("madOutliers == scala medians on random spiky data") {
    val rng = new scala.util.Random(303)
    val rows = (1L to 500L).map { i =>
      val v = if (rng.nextInt(20) == 0) rng.nextInt(1000).toDouble
              else 50.0 + rng.nextInt(7)
      (s"c${rng.nextInt(2)}", t0 + i, v, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.madOutliers(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"),
              $"value", $"event_id"),
          $"channel", $"ts", $"value", $"event_id")
        .as[(String, Long, Double, Long, Long)].collect()
        .map(r => (r._1, r._2)).toSet
    }
    def medByRank(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    // .toSeq before flatMap: a Map.flatMap over tuple results would
    // collapse to one entry per channel key
    val want = rows.groupBy(_._1).toSeq.flatMap { case (c, rs) =>
      val med = medByRank(rs.map(r => math.round(r._3 * 100)))
      val mad = medByRank(rs.map(r => math.abs(math.round(r._3 * 100) - med)))
      if (mad == 0) Nil
      else rs.filter(r => math.abs(math.round(r._3 * 100) - med) > 3 * mad)
        .map(r => (c, r._2 * 1000000L))
    }.toSet
    assert(got == want)
  }

  test("funnelSteps == scala fold on random event streams") {
    val rng = new scala.util.Random(404)
    val types = Vector("view", "click", "purchase", "error")
    val rows = (1L to 600L).map { i =>
      (rng.nextInt(40).toLong, t0 + rng.nextInt(200).toLong,
        types(rng.nextInt(types.size)), i)
    }
    val steps = Seq("view", "click", "purchase")
    val got = Pins.scoped {
      TimeSeriesOps.funnelSteps(
          rows.toDF("user_id", "sec", "event_type", "event_id")
            .select($"user_id", timestamp_seconds($"sec").as("ts"),
              $"event_type"),
          $"user_id", $"ts", $"event_type", steps)
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    }
    val byUser = rows.groupBy(_._1)
    val counts = steps.zipWithIndex.map { case (_, si) =>
      byUser.values.count { rs =>
        // fold: earliest time of each step strictly after the previous
        steps.take(si + 1).foldLeft(Option(Long.MinValue)) {
          case (Some(prev), st) =>
            rs.filter(r => r._3 == st && r._2 > prev)
              .map(_._2).sorted.headOption
          case (None, _) => None
        }.isDefined
      }.toLong
    }
    assert(got.map(_._3) == counts, s"got $got want $counts")
  }

  test("timeWeightedAvg == scala trapezoid sum on random irregular grids") {
    val rng = new scala.util.Random(505)
    val rows = (1L to 200L).map { i =>
      (s"c${rng.nextInt(3)}", t0 + rng.nextInt(5000).toLong,
        rng.nextInt(200).toDouble / 2.0, i)
    }.distinctBy(r => (r._1, r._2)) // unique (channel, ts): dt > 0
    val got = Pins.scoped {
      TimeSeriesOps.timeWeightedAvg(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"),
              $"value", $"event_id"),
          $"channel", $"ts", $"value", $"event_id")
        .as[(String, Long, Double)].collect().toMap2
    }
    val want = rows.groupBy(_._1).collect {
      case (c, rs) if rs.size >= 2 =>
        val o = rs.map(r => (r._2 * 1000000L, math.round(r._3 * 100))).sorted
        val num = o.sliding(2).map { case Seq((pt, pv), (t, v)) =>
          (BigInt(v + pv) * BigInt(t - pt))
        }.sum
        val span = o.last._1 - o.head._1
        (c, (rs.size.toLong, num.toDouble / 2.0 / span / 100.0))
    }
    assert(got == want)
  }

  test("autocorrelation == scala pearson over consecutive bucket pairs") {
    val rng = new scala.util.Random(606)
    // trending values (bucket-correlated) + sparse buckets so some
    // consecutive pairs are missing and must drop from the pair set
    val rows = (1L to 600L).map { i =>
      val b = rng.nextInt(60)
      (s"c${rng.nextInt(3)}", t0 + b * 60L + rng.nextInt(60),
        (b * 3 + rng.nextInt(20)).toDouble, i)
    }.distinctBy(r => (r._1, r._2 / 60L)) // one sample per bucket: the
    // trend survives into bucket sums (multi-sample sums would bury it
    // under count noise and defeat the r-sanity check below)
    val got = Pins.scoped {
      TimeSeriesOps.autocorrelation(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"), $"value"),
          $"channel", $"ts", $"value", bucketSec = 60L)
        .as[(String, Long, Double)].collect().toMap2
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val buckets = rs.groupBy(r => r._2 / 60L * 60L)
        .view.mapValues(_.map(r => math.round(r._3 * 100)).sum).toMap
      val pairs = buckets.keys.toSeq.sorted
        .collect { case b if buckets.contains(b - 60L) =>
          (BigInt(buckets(b)), BigInt(buckets(b - 60L))) }
      val n = pairs.size
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      if (vx > 0 && vy > 0) Some(c -> (n.toLong, cov / math.sqrt(vx * vy)))
      else None
    }
    assert(got == want)
    // the trend makes the fixture discriminating: real positive lag-1 r
    assert(got.values.forall(_._2 > 0.5))
  }

  test("uptime == scala bucket-grid fold on random gappy channels") {
    val rng = new scala.util.Random(707)
    val rows = (1L to 300L).map { i =>
      // clustered buckets with dead stretches between clusters
      val b = rng.nextInt(10) + Seq(0, 30, 35)(rng.nextInt(3))
      (s"c${rng.nextInt(3)}", t0 + b * 3600L + rng.nextInt(3600), i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.uptime(
          rows.toDF("channel", "sec", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts")),
          $"channel", $"ts", bucketSec = 3600L)
        .as[(String, Long, Long, Double, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    }
    val want = rows.groupBy(_._1).map { case (c, rs) =>
      val bs = rs.map(_._2 / 3600L * 3600L).distinct.sorted
      val expected = (bs.last - bs.head) / 3600L + 1L
      val gap = if (bs.size < 2) 0L
        else bs.sliding(2).map { case Seq(a, b) => b - a - 3600L }.max
      c -> (bs.size.toLong, expected,
        bs.size.toDouble / expected.toDouble, gap)
    }
    assert(got == want)
    assert(want.values.exists(_._4 > 0L)) // the fixture really has gaps
  }

  test("dyadicEwma == scala weighted fold (exact power-of-two weights)") {
    val rng = new scala.util.Random(808)
    val rows = (1L to 400L).map { i =>
      (s"c${rng.nextInt(2)}", t0 + rng.nextInt(40) * 3600L + rng.nextInt(3600),
        rng.nextInt(1000).toDouble / 4.0, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.dyadicEwma(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"), $"value"),
          $"channel", $"ts", $"value", bucketSec = 3600L, horizon = 24)
        .as[(String, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val buckets = rs.groupBy(r => r._2 / 3600L * 3600L)
        .view.mapValues(_.map(r => math.round(r._3 * 100)).sum).toMap
      buckets.keys.map { t =>
        val present = (0 until 24).filter(a => buckets.contains(t - a * 3600L))
        val num = present.map(a =>
          BigInt(buckets(t - a * 3600L)) * BigInt(1L << (23 - a))).sum
        val den = present.map(a => 1L << (23 - a)).sum
        (c, t) -> (den, num.toDouble / den.toDouble / 100.0)
      }
    }
    assert(got == want)
    // sparse lookbacks really occurred (den below the full weight mass)
    assert(want.values.exists(_._1 < (1L << 24) - 1))
  }

  test("seasonalOutliers == scala per-phase moment fold; phase-local spikes") {
    val rng = new scala.util.Random(909)
    val period = 14400L // 4 phases x 1h buckets
    val rows = (1L to 800L).map { i =>
      val sec = t0 / period * period + rng.nextInt(50) * 1800L
      val phase = sec % period / 3600L
      // diurnal level: phase*50, small noise, occasional big spike
      val v = phase * 50.0 + rng.nextInt(5) +
        (if (rng.nextInt(40) == 0) 500.0 else 0.0)
      (s"c${rng.nextInt(2)}", sec, v, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.seasonalOutliers(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"), $"value"),
          $"channel", $"ts", $"value", bucketSec = 3600L,
          periodSec = period, nSigma = 3.0, minN = 5L)
        .as[(String, Long, Long, Double, Double)].collect().toSet
    }
    val want = rows.groupBy(r => (r._1, r._2 % period / 3600L)).flatMap {
      case ((c, ph), rs) if rs.size >= 5 =>
        val vcs = rs.map(r => math.round(r._3 * 100))
        val n = vcs.size
        val s = vcs.map(BigInt(_)).sum
        val sq = vcs.map(v => BigInt(v) * BigInt(v)).sum
        val mu = s.toDouble / n
        val vr = sq.toDouble / n - (s.toDouble / n) * (s.toDouble / n)
        rs.collect {
          case (_, sec, v, _)
            if vr > 0 && {
              val vc = math.round(v * 100)
              (vc - mu) * (vc - mu) > 9.0 * vr
            } =>
            val vc = math.round(v * 100)
            (c, ph, sec * 1000000L, vc.toDouble / 100.0,
              (vc - mu) / math.sqrt(vr))
        }
      case _ => Nil
    }.toSet
    assert(got == want)
    assert(want.nonEmpty) // the planted spikes really flag
  }

  test("filteredKnn == per-group bruteKnn (pre-filter semantics)") {
    val rng = new scala.util.Random(111)
    val vecs = (0L until 60L).map { id =>
      (id, Array.fill(8)(rng.nextFloat()), id % 3) // grp = id mod 3
    }
    val df = vecs.toDF("vec_id", "embedding", "grp")
    val q = Pins.scoped {
      VectorOps.quantize(df, $"vec_id", $"embedding")
        .join(df.select($"vec_id", $"grp"), "vec_id")
    }
    val got = Pins.scoped {
      VectorOps.filteredKnn(q, q.filter($"vec_id" < 6), k = 4)
        .as[(Long, Long, Long, Double, Int)].collect().toSet
    }
    val want = (0L until 3L).flatMap { g =>
      Pins.scoped {
        VectorOps.bruteKnn(q.filter($"grp" === g).drop("grp"),
            q.filter($"grp" === g && $"vec_id" < 6).drop("grp"), k = 4)
          .as[(Long, Long, Double, Int)].collect()
          .map(r => (r._1, g, r._2, r._3, r._4))
      }
    }.toSet
    assert(got == want)
    // every neighbor really shares its probe's group
    assert(got.forall { case (p, g, v, _, _) => p % 3 == g && v % 3 == g })
  }

  test("m4Downsample == scala per-bucket argmin/argmax fold") {
    val rng = new scala.util.Random(333)
    // duplicate values force the (vc, t, tb) tie-break; duplicate
    // timestamps force the tb tie-break
    val rows = (1L to 400L).map { i =>
      (s"c${rng.nextInt(3)}", t0 + rng.nextInt(20) * 1800L,
        rng.nextInt(8).toDouble, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.m4Downsample(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"),
              $"value", $"event_id"),
          $"channel", $"ts", $"value", $"event_id", bucketSec = 3600L)
        .as[(String, Long, Long, Double, Long, Double, Long, Double,
          Long, Double)].collect().toSet
    }
    val want = rows.groupBy(r => (r._1, r._2 / 3600L * 3600L)).map {
      case ((c, b), rs) =>
        val o = rs.map(r => (r._2 * 1000000L, r._4, math.round(r._3 * 100)))
        val f = o.minBy(r => (r._1, r._2)); val l = o.maxBy(r => (r._1, r._2))
        val lo = o.minBy(r => (r._3, r._1, r._2))
        val hi = o.maxBy(r => (r._3, r._1, r._2))
        (c, b, f._1, f._3 / 100.0, l._1, l._3 / 100.0,
          lo._1, lo._3 / 100.0, hi._1, hi._3 / 100.0)
    }.toSet
    assert(got == want)
  }

  test("peakDetect == scala neighbor scan; plateaus never flag") {
    val rng = new scala.util.Random(444)
    // values from a tiny alphabet: plateaus (equal neighbors) occur and
    // must not flag; spikes above the delta floor must
    val rows = (1L to 500L).map { i =>
      val v = Seq(10.0, 10.0, 12.0, 50.0)(rng.nextInt(4))
      (s"c${rng.nextInt(2)}", t0 + i, v, i)
    }
    val got = Pins.scoped {
      TimeSeriesOps.peakDetect(
          rows.toDF("channel", "sec", "value", "event_id")
            .select($"channel", timestamp_seconds($"sec").as("ts"),
              $"value", $"event_id"),
          $"channel", $"ts", $"value", $"event_id", minDelta = 30.0)
        .as[(String, Long, Double, Double)].collect().toSet
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val o = rs.sortBy(r => (r._2, r._4)).map(r =>
        (r._2 * 1000000L, math.round(r._3 * 100)))
      o.sliding(3).collect {
        case Seq((_, pv), (t, vc), (_, nv))
          if vc > pv && vc > nv && vc - math.max(pv, nv) >= 3000 =>
          (c, t, vc / 100.0, (vc - math.max(pv, nv)) / 100.0)
      }
    }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("collocations == scala bigram fold with exact ppm lift") {
    val rng = new scala.util.Random(555)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x")
    val rows = (1L to 80L).map { i =>
      // "alpha beta" planted often: a genuine collocation
      val base = (1 to 10).map(_ => vocab(rng.nextInt(vocab.size)))
      val txt = (base ++ Seq("alpha", "beta")).mkString(" ")
      (i, txt)
    }
    val got = Pins.scoped {
      TextAnalysisOps.collocations(rows.toDF("doc_id", "text"),
          $"doc_id", $"text", topK = 10, minCount = 2L)
        .as[(Long, String, String, Long, Long, Long, Long)]
        .collect().toSet
    }
    val pairs = rows.flatMap { case (_, txt) =>
      val ws = txt.toLowerCase.split(" ").filter(_.nonEmpty)
      ws.sliding(2).collect { case Array(a, b) => (a, b) }
    }
    val c = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nb = c.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val tot = c.values.sum
    val want = c.filter(_._2 >= 2L).toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(10).zipWithIndex
      .map { case (((a, b), n), i) =>
        (i + 1L, a, b, n, na(a), nb(b),
          (BigInt(n) * tot * 1000000 / (BigInt(na(a)) * nb(b))).toLong)
      }.toSet
    assert(got == want)
    // the planted pair is a top collocation with lift > 1x
    assert(want.exists { case (_, a, b, _, _, _, lift) =>
      a == "alpha" && b == "beta" && lift > 1000000L })
  }

  test("thetaDistinct == scala md5-threshold fold; estimate tracks truth") {
    val rng = new scala.util.Random(666)
    val rows = (1L to 2000L).map(_ =>
      (s"g${rng.nextInt(2)}", s"item${rng.nextInt(300)}"))
    val got = Pins.scoped {
      SketchOps.thetaDistinct(rows.toDF("grp", "item"),
          $"grp", $"item", logInvFrac = 2)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val want = rows.distinct.groupBy(_._1).flatMap { case (g, rs) =>
      val kept = rs.map(_._2).distinct
        .map(i => h60("theta:" + i)).count(_ < (1L << 58))
      if (kept > 0) Some(g -> (kept.toLong, kept * 4L)) else None
    }
    assert(got == want)
    // ~75 expected survivors per group at 1/4 sampling: the estimate
    // must land within 50% of the exact count (SE ~ 1/sqrt(75) ≈ 12%)
    val truth = rows.distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.size).toMap
    got.foreach { case (g, (_, est)) =>
      assert(math.abs(est - truth(g)).toDouble / truth(g) < 0.5,
        s"$g: est=$est truth=${truth(g)}")
    }
    // mergeability: build SEPARATE sketch states over two disjoint
    // halves, merge the states, read the estimate — must equal the
    // direct sketch of the whole corpus (the property that makes
    // incremental corpus growth a union + re-count, never a re-scan)
    val (h1, h2) = rows.splitAt(1000)
    val merged = Pins.scoped {
      val s1 = SketchOps.thetaKept(h1.toDF("grp", "item"),
        $"grp", $"item", logInvFrac = 2)
      val s2 = SketchOps.thetaKept(h2.toDF("grp", "item"),
        $"grp", $"item", logInvFrac = 2)
      SketchOps.thetaEstimate(SketchOps.mergeKept(Seq(s1, s2)),
          logInvFrac = 2)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }
    assert(merged == got)
  }

  test("hllDistinct: scala register fold parity, both branches, merge == direct") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    // scala reference: registers + the exact readout formula
    def ref(items: Seq[String], b: Int): (Long, Long) = {
      val m = 1L << b
      val regs = items.distinct.map(i => h60("hll:" + i))
        .groupBy(_ % m)
        .map { case (r, hs) =>
          r -> hs.map { h =>
            val w = h >> b
            if (w == 0) 60 - b + 1
            else java.lang.Long.bitCount((w & -w) - 1) + 1
          }.max
        }
      val p = SketchOps.hllScaleBits(b)
      val v = m - regs.size
      val s = v * (1L << p) + regs.values.map(r => 1L << (p - r)).sum
      val raw = SketchOps.hllNumerator(b) / s.toDouble
      val est = if (raw <= 2.5 * m && v > 0)
        math.round(m.toDouble * math.log(m.toDouble / v))
      else math.round(raw)
      (regs.size.toLong, est)
    }
    // SMALL cardinality (linear-counting branch) and LARGE (raw branch)
    val small = (1 to 60).map(i => ("s", s"it$i"))
    val large = (1 to 60000).map(i => ("l", s"it$i"))
    val rows = small ++ large
    val got = Pins.scoped {
      SketchOps.hllDistinct(rows.toDF("grp", "item"), $"grp", $"item", b = 10)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    assert(got("s") == ref(small.map(_._2), 10), s"small: ${got("s")}")
    assert(got("l") == ref(large.map(_._2), 10), s"large: ${got("l")}")
    // both branches really exercised: small V > 0 under the 2.5m bar,
    // large raw above it (0 empty registers is near-certain at 60k)
    assert(got("s")._1 < 1024 && got("l")._1 == 1024L,
      s"branch coverage assumption broken: $got")
    // accuracy: ~1.04/sqrt(1024) ≈ 3.3% SE — assert within 15%
    assert(math.abs(got("s")._2 - 60L) <= 9, got("s").toString)
    assert(math.abs(got("l")._2 - 60000L) <= 9000, got("l").toString)
    // NULL items count nothing (the dedup-family mouth policy)
    val withNulls = small.map { case (g, i) => (g, Option(i)) } ++
      Seq(("s", Option.empty[String]), ("s", Option.empty[String]))
    val gotN = Pins.scoped {
      SketchOps.hllDistinct(withNulls.toDF("grp", "item"),
          $"grp", $"item", b = 10)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    assert(gotN("s") == got("s"), s"NULL items must not move the sketch")
    // merge of disjoint halves == direct sketch of the union
    val (h1, h2) = large.splitAt(30000)
    val merged = Pins.scoped {
      val s1 = SketchOps.hllRegisters(h1.toDF("grp", "item"),
        $"grp", $"item", b = 10)
      val s2 = SketchOps.hllRegisters(h2.toDF("grp", "item"),
        $"grp", $"item", b = 10)
      SketchOps.hllEstimate(SketchOps.mergeHllRegisters(Seq(s1, s2)), b = 10)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    assert(merged("l") == got("l"))
  }

  test("cmsEstimate: >= truth always, exact scala parity, merge == direct") {
    val rng = new scala.util.Random(888)
    // zipf-ish: low ids hot — CMS must over-estimate, never under
    val rows = (1 to 5000).map(_ => math.min(rng.nextInt(40),
      rng.nextInt(400)).toLong)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probeIds = (0L until 50L)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    // scala reference CMS
    val cells = scala.collection.mutable.Map[(Int, Long), Long]()
    for (it <- rows; j <- 0 until 4) {
      val b = h60(s"cms$j:$it") % 512
      cells((j, b)) = cells.getOrElse((j, b), 0L) + 1
    }
    def refEst(it: Long): Long =
      (0 until 4).map(j => cells.getOrElse((j, h60(s"cms$j:$it") % 512), 0L)).min
    val got = Pins.scoped {
      val cms = SketchOps.cmsCounts(rows.toDF("it"), $"it")
      SketchOps.cmsEstimate(cms, probeIds.toDF("it"), $"it")
        .as[(String, Long)].collect().toMap
    }
    probeIds.foreach { it =>
      assert(got(it.toString) == refEst(it), s"$it: ${got(it.toString)}")
      assert(got(it.toString) >= truth.getOrElse(it, 0L),
        s"CMS under-estimated $it")
    }
    // an item the sketch never saw can still alias to non-empty cells,
    // but min over d rows is exact-scala-parity regardless
    assert(got(49L.toString) == refEst(49L))
    // merge of two disjoint halves == the full sketch state
    val (h1, h2) = rows.splitAt(2500)
    val mergedGot = Pins.scoped {
      val c1 = SketchOps.cmsCounts(h1.toDF("it"), $"it")
      val c2 = SketchOps.cmsCounts(h2.toDF("it"), $"it")
      SketchOps.cmsEstimate(SketchOps.mergeCms(Seq(c1, c2)),
          probeIds.toDF("it"), $"it")
        .as[(String, Long)].collect().toMap
    }
    assert(mergedGot == got)
  }

  test("quantileSketch == scala md5-sample order statistics; merge == direct") {
    val rng = new scala.util.Random(777)
    val rows = (1L to 2000L).map(i =>
      (s"g${rng.nextInt(2)}", i, rng.nextInt(5000).toLong))
    val pcts = Seq(25, 50, 90)
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val got = Pins.scoped {
      SketchOps.quantileSketch(rows.toDF("grp", "key", "v"),
          $"grp", $"key", $"v", pcts, logInvFrac = 2)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val kept = rs.filter(r => h60("qsk:" + r._2) < (1L << 58))
        .map(_._3).sorted
      if (kept.isEmpty) None else {
        def q(p: Int) = kept((((kept.size.toLong * p + 99) / 100) - 1).toInt)
        Some(g -> ((kept.size.toLong, q(25), q(50), q(90))))
      }
    }.toMap
    assert(got == want)
    // accuracy: the 1/4-sampled median must land near the exact median
    // of the uniform draws (~250 survivors/group -> SE of an order
    // statistic ~ a few percent of the range)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val exact = rs.map(_._3).sorted.apply(rs.size / 2)
      assert(math.abs(got(g)._3 - exact) < 1000L,
        s"$g: sampled p50=${got(g)._3} exact=$exact")
    }
    // mergeability: sketch states over two disjoint halves, merged,
    // must read out exactly as the direct sketch of the whole corpus
    val (h1, h2) = rows.splitAt(1000)
    val merged = Pins.scoped {
      val s1 = SketchOps.quantileKept(h1.toDF("grp", "key", "v"),
        $"grp", $"key", $"v", logInvFrac = 2)
      val s2 = SketchOps.quantileKept(h2.toDF("grp", "key", "v"),
        $"grp", $"key", $"v", logInvFrac = 2)
      SketchOps.quantileEstimate(
          SketchOps.mergeQuantileKept(Seq(s1, s2)), pcts)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    assert(merged == got)
  }

  test("rollingMedian == sliding sorted order statistic on random data") {
    val rng = new scala.util.Random(303)
    // duplicate timestamps included: the event_id tie-break must keep
    // the frame contents deterministic
    val rows = (1L to 300L).map(i =>
      (s"c${rng.nextInt(3)}", t0 + rng.nextInt(50) * 60L, i,
        rng.nextInt(200).toDouble / 2.0))
    val got = Pins.scoped {
      TimeSeriesOps.rollingMedian(
          rows.toDF("channel", "sec", "event_id", "value")
            .select($"channel", timestamp_seconds($"sec").as("ts"),
              $"event_id", $"value"),
          $"channel", $"ts", $"value", $"event_id", window = 5)
        .as[(String, Long, Long, Double)].collect().toSet
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val ordered = rs.map(r => (r._2 * 1000000L, r._3,
        math.round(r._4 * 100))).sortBy(x => (x._1, x._2))
      ordered.indices.map { i =>
        val win = ordered.slice(math.max(0, i - 4), i + 1).map(_._3).sorted
        (c, ordered(i)._1, ordered(i)._2,
          win((win.size + 1) / 2 - 1) / 100.0)
      }
    }.toSet
    assert(got == want)
  }

  test("quantileBins == NTILE census on random ties-heavy strata") {
    val rng = new scala.util.Random(404)
    val rows = (1L to 500L).map(i =>
      (s"s${rng.nextInt(4)}", rng.nextInt(50).toLong, i))
    val got = Pins.scoped {
      TextAnalysisOps.quantileBins(rows.toDF("stratum", "v", "id"),
          $"stratum", $"v", $"id", k = 4)
        .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    }
    val want = rows.groupBy(_._1).flatMap { case (st, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val n = sorted.size
      sorted.zipWithIndex.map { case (r, i) =>
          (i.toLong * 4 / n + 1, r._2) }
        .groupBy(_._1).map { case (bin, vs) =>
          val xs = vs.map(_._2)
          (st, bin, xs.size.toLong, xs.min, xs.max,
            xs.sum.toDouble / xs.size)
        }
    }.toSet
    assert(got == want)
  }

  test("textRank == scala integer power iteration") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma delta beta gamma"),
      (3L, "alpha beta gamma delta epsilon alpha beta"),
      (4L, "gamma delta epsilon gamma delta"))
    val got = Pins.scoped {
      TextAnalysisOps.textRank(docs.toDF("doc_id", "text"),
          $"doc_id", $"text", topK = 10, minCount = 2L, iters = 3)
        .as[(Long, String, Long)].collect().toList
    }
    val Scale = 1000000000000L
    val pairs = docs.flatMap { case (_, t) =>
      val ws = t.split(" ").toSeq; ws.zip(ws.tail) }
    val c = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val edges = (c ++ c.map(p => (p._2, p._1))).distinct
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val tele = Scale * 15L / 100L / n
    var r = nodes.map(w => w -> Scale / n).toMap
    for (_ <- 1 to 3) {
      val acc = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(w =>
        w -> (tele + 85L * acc.getOrElse(w, 0L) / 100L)).toMap
    }
    val want = r.toSeq.sortBy { case (w, s) => (-s, w) }.take(10)
      .zipWithIndex.map { case ((w, s), i) => (i + 1L, w, s) }.toList
    assert(got == want)
  }

  test("saltedJoin == plain join on a hot-key distribution") {
    val rng = new scala.util.Random(505)
    // ~25% of fact rows land on key 1 — the skew shape the salt exists
    // for; the answer must not notice
    val fact = (1L to 400L).map(i =>
      (if (rng.nextInt(4) == 0) 1L else rng.nextInt(20).toLong, i,
        rng.nextInt(100).toLong))
    val dim = (0L until 15L).map(k => (k, s"seg${k % 3}"))
    val got = Pins.scoped {
      RangeJoinOps.saltedJoin(fact.toDF("k", "id", "v"),
          dim.toDF("k", "seg"), "k", $"id", salts = 8)
        .as[(Long, Long, Long, String)].collect().toList
    }
    val dm = dim.toMap
    val want = fact.filter(f => dm.contains(f._1))
      .map(f => (f._1, f._2, f._3, dm(f._1)))
    assert(got.toSet == want.toSet)
    assert(got.size == want.size) // no row duplicated by the replication
  }

  test("winsorizedStats == clip-at-order-statistics fold") {
    val rng = new scala.util.Random(808)
    val rows = (1L to 400L).map(i =>
      (s"c${rng.nextInt(3)}", rng.nextInt(40).toDouble / 2.0, i))
    val got = Pins.scoped {
      TimeSeriesOps.winsorizedStats(rows.toDF("channel", "value", "event_id"),
          $"channel", $"value", $"event_id", pLo = 10, pHi = 90)
        .as[(String, Long, Long, Long, Double, Double)].collect().toSet
    }
    val want = rows.groupBy(_._1).map { case (c, rs) =>
      val vc = rs.map(r => math.round(r._2 * 100)).sorted
      val n = vc.size
      def q(p: Int) = vc((((n.toLong * p + 99) / 100) - 1).toInt)
      val (lo, hi) = (q(10), q(90))
      (c, n.toLong, vc.count(_ < lo).toLong, vc.count(_ > hi).toLong,
        vc.sum / 100.0, vc.map(v => math.max(math.min(v, hi), lo)).sum / 100.0)
    }.toSet
    assert(got == want)
  }

  test("bloomPrunedJoin == plain join on a selective dimension") {
    val rng = new scala.util.Random(707)
    val fact = (1L to 600L).map(i =>
      (rng.nextInt(200).toLong, i, rng.nextInt(100).toLong))
    // dim covers ~1/4 of the key space: most fact rows should die in
    // the bitmap prefilter, none of the surviving matches may change
    val dim = (0L until 200L).filter(_ % 4 == 0).map(k => (k, s"d$k"))
    val got = Pins.scoped {
      RangeJoinOps.bloomPrunedJoin(fact.toDF("k", "id", "v"),
          dim.toDF("k", "name"), "k", mBits = 1 << 12, numHashes = 3)
        .as[(Long, Long, Long, String)].collect().toList
    }
    val dm = dim.toMap
    val want = fact.filter(f => dm.contains(f._1))
      .map(f => (f._1, f._2, f._3, dm(f._1)))
    assert(got.toSet == want.toSet)
    assert(got.size == want.size)
  }

  test("slidingDistinct == md5-threshold sliding fold") {
    val rng = new scala.util.Random(606)
    val rows = (1L to 500L).map(_ =>
      (s"c${rng.nextInt(2)}", t0 + rng.nextInt(30) * 3600L,
        rng.nextInt(80).toLong))
    val got = Pins.scoped {
      SketchOps.slidingDistinct(
          rows.toDF("ch", "sec", "uid")
            .select($"ch", timestamp_seconds($"sec").as("ts"), $"uid"),
          $"ch", $"ts", $"uid", bucketSec = 3600L, windowBuckets = 4,
          logInvFrac = 2)
        .as[(String, Long, Long, Long)].collect().toSet
    }
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
      val surv = rs.groupBy(r => (r._2 / 3600) * 3600)
        .view.mapValues(_.map(r => h60("sd:" + r._3))
          .filter(_ < (1L << 58)).toSet).toMap
      surv.filter(_._2.nonEmpty).keys.map { b =>
        val hs = surv.collect {
          case (bb, s) if bb <= b && bb > b - 4 * 3600 => s
        }.flatten.toSet
        (c, b, hs.size.toLong, hs.size * 4L)
      }
    }.toSet
    assert(got == want)
  }

  test("lengthHistogram == scala fold") {
    val rng = new scala.util.Random(222)
    val rows = (1L to 300L).map(i =>
      (s"s${rng.nextInt(3)}", rng.nextInt(1000).toLong))
    val got = Pins.scoped {
      TextAnalysisOps.lengthHistogram(rows.toDF("stratum", "len"),
          $"stratum", $"len", binWidth = 100L)
        .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    }
    val want = rows.groupBy(r => (r._1, r._2 / 100L)).map {
      case ((st, bin), rs) =>
        val ls = rs.map(_._2)
        (st, bin, ls.size.toLong, ls.min, ls.max,
          ls.sum.toDouble / ls.size)
    }.toSet
    assert(got == want)
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
