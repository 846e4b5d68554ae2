package graft.functions

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Grammar goldens for the reference's CLI time literals
  * (`parseT` etsdQuery.c:41-93, `etsdParseTime` etsdQuery.c:97-182). */
class TimeLiteralsSpec extends AnyFunSuite {
  import TimeLiterals._

  // 2024-03-15 14:30:00 UTC
  private val now = Instant.ofEpochSecond(1710513000L)
  private val begin = Instant.ofEpochSecond(1700000000L)
  private def t(lit: String): Long = parseTimeEpoch(lit, now, begin)

  test("durations: unit suffixes, case, words, floats, signs") {
    assert(parseDurationSec("10s") == 10L)
    assert(parseDurationSec("-356S") == -356L)
    assert(parseDurationSec("4hours") == 4 * 3600L)
    assert(parseDurationSec("-12h") == -12 * 3600L)
    assert(parseDurationSec("3minutes") == 180L)
    assert(parseDurationSec("5d") == 5 * 86400L)
    assert(parseDurationSec("2Y") == 2 * 31536000L)
    assert(parseDurationSec("1.5h") == 5400L)
    assert(parseDurationSec("90") == 90L)   // bare seconds
    assert(parseDurationSec("-45") == -45L)
    assert(parseDurationSec("+30") == 30L)
  }

  test("durations: malformed input throws IllegalArgumentException") {
    for (bad <- Seq("1+2-3", "h4", "4 4h", "", "10x")) {
      intercept[IllegalArgumentException](parseDurationSec(bad))
    }
  }

  test("keywords: now, midnight, begin") {
    assert(t("now") == now.getEpochSecond)
    assert(t("mid") == 1710460800L)       // 2024-03-15 00:00 UTC
    assert(t("midnight") == 1710460800L)
    assert(t("begin") == begin.getEpochSecond)
  }

  test("relative offsets on keywords") {
    assert(t("now-4h") == now.getEpochSecond - 4 * 3600)
    assert(t("mid+90m") == 1710460800L + 90 * 60)
    assert(t("begin+2d") == begin.getEpochSecond + 2 * 86400)
    assert(t("now-356S") == now.getEpochSecond - 356)
  }

  test("ISO dates and datetimes") {
    assert(t("2024-01-05") == 1704412800L)
    assert(t("2024-01-05 06:30:15") == 1704436215L)
    assert(t("2024-1-5 6:30") == 1704436200L)
    // a date with dashes must NOT be split as an offset
    assert(t("2024-01-05-12h") == 1704412800L - 12 * 3600)
  }

  test("US dates, two-digit year expansion") {
    assert(t("1/5/2024") == 1704412800L)
    assert(t("1/5/24") == 1704412800L)      // yy -> 20yy (etsdQuery.c:137-142)
    assert(t("1/5/24 06:30:15") == 1704436215L)
  }

  test("bare hh:mm:ss is today, or yesterday if in the future") {
    assert(t("06:30") == 1710484200L)        // 2024-03-15 06:30 (past -> today)
    assert(t("23:30") == 1710459000L)        // would be future -> yesterday
    assert(t("14:30:00") == now.getEpochSecond) // exactly now stays today
    assert(t("10:00+30") == 1710496800L + 30)   // offset in bare seconds
  }

  test("bad literals throw") {
    for (bad <- Seq("13/45/2024", "yesterday", "2024-13-01", "25:00")) {
      intercept[IllegalArgumentException](t(bad))
    }
  }
}
