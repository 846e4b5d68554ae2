package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** ParityProbe builds only the tables the requested queries read, driven
  * by hand-maintained name sets (`EventsRel` / `EventsOnlyRel`). The
  * queries' own oracle SQL is the ground truth of what each reads —
  * DuckDB executes it against the raw parquet tables — so derive the
  * events/TPC-H needs from the SQL and pin the sets: a future
  * events-backed rel_ query that isn't added to ParityProbe fails HERE
  * with the two sets diffed, instead of silently skipping the events
  * expansion and failing the probe confusingly. */
class ParityProbeSpec extends AnyFunSuite {
  private val TpchTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** True when `sql` scans `table` (FROM/JOIN reference, including a
    * comma-list position — the fuzzy oracles' `FROM base b, dirty d`
    * style; a CTE of the same name would shadow the table, but no
    * oracle does that — and if one ever did, this spec failing is the
    * right outcome: the probe's table logic needs a human look either
    * way). The comma branch can overmatch (a comma-list of aliases is
    * rare but conceivable) — that errs toward INCLUDING a query in the
    * events set, i.e. a superfluous expansion, never a skipped one. */
  private def reads(sql: String, table: String): Boolean =
    ("""(?is)(\b(from|join)\s+|,\s*)""" + table + """\b""").r
      .findFirstIn(sql).isDefined

  private lazy val relSql: Map[String, String] =
    graft.SparkEntry.oracleSql.filter(_._1.startsWith("rel_"))

  test("EventsRel == rel_ queries whose oracle SQL reads events") {
    val derived = relSql.filter { case (_, sql) => reads(sql, "events") }.keySet
    assert(derived == ParityProbe.EventsRel,
      s"missing=${derived -- ParityProbe.EventsRel} " +
        s"stale=${ParityProbe.EventsRel -- derived}")
  }

  test("EventsOnlyRel == events-reading rel_ queries with no TPC-H table") {
    val derived = relSql.keySet.filter { n =>
      reads(relSql(n), "events") && !TpchTables.exists(reads(relSql(n), _))
    }
    assert(derived == ParityProbe.EventsOnlyRel,
      s"missing=${derived -- ParityProbe.EventsOnlyRel} " +
        s"stale=${ParityProbe.EventsOnlyRel -- derived}")
  }
}
