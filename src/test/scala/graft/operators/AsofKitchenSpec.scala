package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.timestamp_micros

import graft._
import graft.TestSpark

/** Brute-force goldens for the two operators otherwise covered only by
  * the DuckDB oracle: the as-of join (exact tie semantics at equal
  * timestamps) and the kitchen-sink stats (threshold fenceposts). */
class AsofKitchenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest right row at-or-before each left row, ties by tb") {
    val left = Seq(("a", 5L, 100L), ("a", 10L, 101L), ("a", 25L, 102L),
      ("b", 7L, 103L), ("c", 9L, 104L))
      .toDF("k", "t", "lid")
      .select($"k", timestamp_micros($"t").as("ts"), $"lid")
    // right rows incl. two at the SAME (key, ts): higher tb must win;
    // and one exactly at a left timestamp: at-or-before includes it
    val right = Seq(("a", 5L, 1L, 50L), ("a", 5L, 2L, 60L),
      ("a", 20L, 3L, 70L), ("b", 30L, 4L, 80L))
      .toDF("k", "t", "tb", "v")
      .select($"k", timestamp_micros($"t").as("ts"), $"tb", $"v")
    val got = TimeSeriesOps.asofJoin(left, $"k", $"ts", $"lid",
        right, $"k", $"ts", $"tb", $"v")
      .select($"lid", $"r_tb", $"r_val")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) == ((Some(2L), Some(60L)))) // tie at t=5 -> tb=2 wins
    assert(got(101L) == ((Some(2L), Some(60L)))) // latest at-or-before 10
    assert(got(102L) == ((Some(3L), Some(70L)))) // t=20 row
    assert(got(103L) == ((None, None)))          // right row is after
    assert(got(104L) == ((None, None)))          // key with no right rows
  }

  test("kitchenSink: threshold fenceposts are strict inequalities") {
    // values exactly AT the thresholds must count in neither bucket
    // (reference predicates are strict over/under, etsdQuery.h:44-47)
    val rows = Seq(("c", 1L, 10.0, false), ("c", 2L, 20.0, false),
      ("c", 3L, 20.01, false), ("c", 4L, 5.0, false), ("c", 5L, 4.99, false),
      ("c", 6L, 0.0, true))
      .toDF("ch", "t", "v", "bad")
      .select($"ch", timestamp_micros($"t" * 1000000L).as("ts"), $"v", $"bad")
    val r = TimeSeriesOps.kitchenSink(rows, $"ch", $"ts", $"v", $"bad",
      over = 20.0, under = 5.0, equal = 20.0, intervalSec = 10L).collect()(0)
    assert(r.getLong(1) == 6 && r.getLong(2) == 1)       // n, n_invalid
    // the invalid 0.0 row is excluded from every value stat
    // (reference skip-on-invalid, etsdQuery.c:320-324)
    assert(r.getLong(12) == 1 && r.getLong(13) == 1)     // n_over, n_under
    assert(r.getLong(14) == 1)                           // n_equal: the 20.0 row
    assert(r.getLong(15) == 3000000L)                    // first_over at t=3
    assert(r.getLong(16) == 5000000L)                    // first_under at t=5
    assert(r.getLong(17) == 2000000L)                    // first_equal at t=2
    assert(r.getDouble(18) == 20.01)                     // ave_over
    assert(r.getDouble(19) == 4.99)                      // ave_under
    assert(r.getLong(10) == 5000000L && r.getLong(11) == 3000000L) // t_min/t_max
    assert(r.getDouble(3) == 4.99 && r.getDouble(4) == 20.01)    // vmin/vmax
    // per-second triple (etsdQuery.h:40-42): interval stats / intervalSec
    assert(r.getDouble(7) == 4.99 / 10 && r.getDouble(8) == 20.01 / 10)
    assert(math.abs(r.getDouble(9) - r.getDouble(6) / 10) < 1e-12)
  }
}
