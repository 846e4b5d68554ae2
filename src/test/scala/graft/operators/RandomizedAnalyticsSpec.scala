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

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
