package graft.queries

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TimeLiterals
import graft.model.EtsdSchema
import graft.operators.TimeSeriesOps

/** The `etsdCmd query` entry point re-expressed over the canonical long
  * DataFrame (etsdCmd.c:333-461): parses `q=`/`c=`/`s=`/`e=` arguments,
  * resolves the channel by case-insensitive substring (etsdChanNum,
  * etsdQuery.c:193-203), the verb by substring (`q=maximum` works,
  * etsdQuery.c:374-395), and start/end through the CLI time-literal
  * grammar. Defaults: `end=now`, `start=begin` — the first stored sample
  * (etsdCmd.c:449-454).
  *
  * Counter channels in the long form carry per-interval deltas, so
  * tot/min/max/ave over `value` reproduces the reference's accumulation
  * (its Min/Max also track per-interval deltas, etsdQuery.c:326-331). */
object EtsdQueryApi {

  final case class Args(verb: String, chan: Option[String],
                        start: Option[String], end: Option[String])

  /** `q=tot c=garage s=now-4h e=now` → [[Args]] (etsdCmd.c:362-442). */
  def parse(args: Seq[String]): Args = {
    var a = Args("tot", None, None, None)
    args.foreach { t =>
      t.split("=", 2) match {
        case Array("q", v) => a = a.copy(verb = v)
        case Array("c", v) => a = a.copy(chan = Some(v))
        case Array("s", v) => a = a.copy(start = Some(v))
        case Array("e", v) => a = a.copy(end = Some(v))
        case _ => throw new IllegalArgumentException(s"bad query arg '$t'")
      }
    }
    a
  }

  /** Run an AMT-family query. `df` is the long DataFrame (`ts, channel,
    * value, valid, is_register`); `now` injected for determinism. Output:
    * one row per matched channel: (channel, n, result). */
  def query(df: DataFrame, schema: EtsdSchema, rawArgs: Seq[String],
            now: Instant): DataFrame = {
    val a = parse(rawArgs)
    val verb = TimeSeriesOps.amtVerb(a.verb)

    val chanName = a.chan.map { c =>
      // number or name, like the reference CLI (etsdCmd.c:429-438):
      // all-digits → channel index, else case-insensitive substring
      val cfg =
        if (c.nonEmpty && c.forall(_.isDigit))
          // toIntOption: a 10+-digit numeral overflows Int — fall through
          // to the uniform channel-not-found error, not NumberFormatException
          c.toIntOption.flatMap(schema.channels.lift)
        else schema.channel(c)
      cfg.getOrElse(
        throw new IllegalArgumentException(s"channel '$c' not found")).name
    }

    // `begin` = first stored sample (reference seeks block 1,
    // etsdQuery.c:259-261) — one scalar agg, evaluated only when used
    lazy val begin: Instant = {
      val r = df.agg(min(unix_timestamp($"ts"))).head()
      if (r.isNullAt(0)) // empty file: the reference's read error path
        throw new IllegalArgumentException("no data blocks in file")
      Instant.ofEpochSecond(r.getLong(0))
    }
    def epoch(lit: String): Long = {
      val b = if (lit.toLowerCase.contains("begin")) begin
              else Instant.EPOCH // unused unless 'begin' appears
      TimeLiterals.parseTimeEpoch(lit, now, b)
    }
    val startE = a.start.map(epoch).getOrElse(begin.getEpochSecond)
    val endE = a.end.map(epoch).getOrElse(now.getEpochSecond)

    val base = df
      .filter($"ts" >= timestamp_seconds(lit(startE)) &&
        $"ts" <= timestamp_seconds(lit(endE)) && !$"is_register" && $"valid")
      .filter(chanName.map($"channel" === _).getOrElse(lit(true)))

    val result: Column = verb match {
      case "min" => min($"value")
      case "max" => max($"value")
      case "ave" => (sum($"value").cast("double") / count(lit(1)))
      case _     => sum($"value").cast("double")
    }
    base.groupBy($"channel")
      .agg(count(lit(1)).as("n"), result.cast("double").as("result"))
  }
}
