package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.DetHash
import graft.operators.{RangeJoinOps, SketchOps, TimeSeriesOps}

/** Relational operators the reference lacks but our engine exposes for free
  * through Catalyst (SURVEY.md §2.3 joins, §2.6 sort/limit/top-k, §2.7 set
  * ops, §2.8 scalar functions): star-schema joins with explicit broadcast
  * of small dimensions, deterministic top-k, anti/semi joins, window
  * ranking, JSON extraction. All money math is exact cents-integer so the
  * DuckDB oracle hash-matches. */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(s, dir) else Tables.table(s, dir, name)

  // count-min sketch shape: 4 hash rows x 512 buckets, probe users < 64
  private val CmsD = 4
  private val CmsW = 512
  private val CmsProbeMax = 64L

  // rel_bucketed_join writes two bucketed table copies to a fresh temp
  // dir per invocation; DROP TABLE on external tables leaves the files,
  // so a long-lived bench loop would accumulate /tmp dirs. Track the
  // previous invocation's dir and reap it when its bg_* tables are
  // dropped (sequential runners have finished their actions by then).
  private val prevBucketedDir =
    new java.util.concurrent.atomic.AtomicReference[java.nio.file.Path](null)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      // Files.walk holds directory handles until closed — leak-free via
      // Using, since this runs once per bench-loop invocation.
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
        st.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary over lineitem: the widest scan +
    // 2-key aggregation; map-side partial agg, no join.
    "rel_pricing_summary" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val epC = round($"l_extendedprice" * 100).cast("long") // price cents
      val dPct = round($"l_discount" * 100).cast("long")     // discount %
      val txPct = round($"l_tax" * 100).cast("long")         // tax %
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(round($"l_quantity" * 100).cast("long")).as("qty_c"),
          sum(epC).as("base_c"),
          // price*(1-disc) in integer 10^-4 units
          sum(epC * (lit(100L) - dPct)).as("disc_u"),
          // price*(1-disc)*(1+tax) in integer 10^-6 units
          sum(epC * (lit(100L) - dPct) * (lit(100L) + txPct)).as("charge_u"),
          count(lit(1)).as("n"))
        .select($"l_returnflag", $"l_linestatus",
          ($"qty_c".cast("double") / 100.0).as("sum_qty"),
          ($"base_c".cast("double") / 100.0).as("sum_base_price"),
          ($"disc_u".cast("double") / 10000.0).as("sum_disc_price"),
          ($"charge_u".cast("double") / 1000000.0).as("sum_charge"),
          ($"qty_c".cast("double") / $"n" / 100.0).as("avg_qty"),
          ($"base_c".cast("double") / $"n" / 100.0).as("avg_price"),
          $"n".as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with the
    // three small dims broadcast (no shuffle on the fact side beyond the
    // orders join; at 100 TB orders/lineitem co-partition on orderkey).
    // the bucketed co-located layout under the oracle (SURVEY §2.1): both
    // sides are rewritten as bucketed+sorted managed tables on the join
    // key (the write-time shuffle that buys every later join/agg on that
    // key its Exchange back), then joined and aggregated THROUGH the
    // bucketed read path — values must match the plain-parquet closed
    // form exactly. BucketingSpec holds the zero-runtime-shuffle plan
    // assert; this gate holds the layout's value fidelity (bucket
    // routing, per-bucket sort, bucket-file read-back).
    "rel_bucketed_join" -> ((s, d) => {
      val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      // external tables in a temp dir keep the session warehouse clean;
      // UUID names keep concurrent invocations race-free. Catalog
      // hygiene: invocations within one session accumulate bg_* entries,
      // so drop the STALE ones here (sequential runners — Verify, the
      // specs — have finished their actions by the next invocation; the
      // dropped tables are external, so an in-flight plan's files are
      // never deleted). The dropped tables' temp dir is reaped along
      // with them, so a long-running bench loop doesn't accumulate /tmp.
      s.catalog.listTables().collect()
        .map(_.name)
        .filter(n => n.startsWith("bg_ord_") || n.startsWith("bg_cust_"))
        .foreach(n => s.sql(s"DROP TABLE IF EXISTS `$n`"))
      val dir = java.nio.file.Files.createTempDirectory("bucketed_gate")
      Option(prevBucketedDir.getAndSet(dir)).foreach(deleteRecursively)
      graft.sources.Bucketing.writeBucketed(
        t(s, d, "orders").select($"o_orderkey", $"o_custkey", $"o_totalprice"),
        s"bg_ord_$tag", "o_custkey", 8, Some(s"$dir/ord"))
      graft.sources.Bucketing.writeBucketed(
        t(s, d, "customer").select($"c_custkey", $"c_mktsegment"),
        s"bg_cust_$tag", "c_custkey", 8, Some(s"$dir/cust"))
      val bo = s.table(s"bg_ord_$tag")
      val bc = s.table(s"bg_cust_$tag")
      bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round($"o_totalprice" * 100).cast("long")).as("rev_c"))
        .orderBy("c_mktsegment")
    }),

    "rel_star_revenue" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      // customer scales with sf → no hard broadcast hint (AQE picks the
      // strategy from runtime stats); nation/region are fixed-size dims,
      // safe to pin as broadcasts at any scale.
      // Aggregate BEFORE the join chain (guide §2.3): per-order partial
      // sums collapse ~4-7 lineitem rows into one map-side-combined row,
      // so the orders join (and everything after it) moves order-count
      // rows instead of line-count rows; the final (region, nation)
      // rollup sums the per-order sums — bit-identical long arithmetic,
      // just associatively regrouped.
      val liAgg = li.groupBy($"l_orderkey")
        .agg(sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))).as("rev_o"),
          count(lit(1)).as("n_lines_o"))
      liAgg.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum($"rev_o").as("rev_u"), sum($"n_lines_o").as("n_lines"))
        .select($"r_name", $"n_name",
          ($"rev_u".cast("double") / 10000.0).as("revenue"), $"n_lines")
        .orderBy($"r_name", $"n_name")
    }),

    // dim join: per-brand price stats. part scales with sf, so no hard
    // broadcast hint — AQE broadcasts when it actually fits.
    "rel_brand_stats" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      // aggregate before the join (guide §2.3): per-partkey partials
      // collapse the lineitem side map-side; count/sum/min/max all
      // re-compose exactly across the two levels
      val liAgg = li.groupBy($"l_partkey")
        .agg(count(lit(1)).as("n_p"),
          sum(round($"l_extendedprice" * 100).cast("long")).as("price_c_p"),
          min($"l_extendedprice").as("min_p"),
          max($"l_extendedprice").as("max_p"))
      liAgg.join(p, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          sum($"n_p").as("n"),
          sum($"price_c_p").as("price_c"),
          min($"min_p").as("min_price"),
          max($"max_p").as("max_price"))
        .select($"p_brand", $"n",
          ($"price_c".cast("double") / $"n" / 100.0).as("avg_price"),
          $"min_price", $"max_price")
        .orderBy($"p_brand")
    }),

    // anti join: customers with no orders since 2000, per nation
    // (left_anti — the NOT EXISTS shape; broadcast the nation dim).
    // The synthetic orders table covers every custkey, so the order side
    // is scoped to a date window — lapsed customers — to keep the
    // anti-join result non-empty (a 0 = 0 row oracle match proves
    // nothing about the join).
    "rel_cust_no_orders" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      val n = t(s, d, "nation")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"n_name")
    }),

    // deterministic top-k: top 10 customers by order spend
    // (sort + limit with a unique tie-break key)
    "rel_topk_customers" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("spend_c"),
             count(lit(1)).as("n_orders"))
        .select($"o_custkey", ($"spend_c".cast("double") / 100.0).as("spend"),
          $"n_orders")
        .orderBy($"spend".desc, $"o_custkey")
        .limit(10)
    }),

    // set ops: users seen in both purchase and error events (INTERSECT),
    // and purchase-only users (EXCEPT), tagged and unioned.
    "rel_setops_users" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchase = ev.filter($"event_type" === "purchase").select($"user_id").distinct()
      val error = ev.filter($"event_type" === "error").select($"user_id").distinct()
      purchase.intersect(error).select(lit("both").as("cohort"), $"user_id")
        .unionByName(purchase.except(error).select(lit("purchase_only").as("cohort"), $"user_id"))
        .orderBy($"cohort", $"user_id")
    }),

    // window ranking: top-3 orders per customer by price (row_number with
    // unique tie-break → deterministic)
    "rel_window_rank" -> ((s, d) => {
      val o = t(s, d, "orders")
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      o.select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).as("rk"))
        .filter($"rk" <= 3)
        .orderBy($"o_custkey", $"rk")
    }),

    // salted skew join: the events fact stream scattered over 8
    // deterministic sub-keys before joining the customer dimension
    // (replicated 8x) — identical answer to the plain join, but the
    // hottest user can never overflow one shuffle partition
    "rel_salted_agg" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select($"user_id".as("c_custkey"), $"event_id",
          round($"value" * 100).cast("long").as("vc"))
      val cust = t(s, d, "customer").select($"c_custkey", $"c_mktsegment")
      RangeJoinOps.saltedJoin(ev, cust, "c_custkey", $"event_id", salts = 8)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), sum($"vc").as("v_c"))
        .select($"c_mktsegment", $"n",
          ($"v_c".cast("double") / 100.0).as("total"))
        .orderBy("c_mktsegment")
    }),

    // count-min-sketch frequency estimation: the events stream folded
    // into a FIXED CmsD x CmsW counter table (mergeable by per-cell
    // sum — per-day states combine without re-scan), probed for a
    // bounded user set; est >= true always, and the estimates — not
    // just their bound — are md5-deterministic, so oracle-exact
    "rel_cms_heavy" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cms = SketchOps.cmsCounts(ev, $"user_id", CmsD, CmsW)
      val probes = ev.select($"user_id").filter($"user_id" < CmsProbeMax)
      val est = SketchOps.cmsEstimate(cms, probes, $"user_id", CmsD, CmsW)
      ev.filter($"user_id" < CmsProbeMax)
        .groupBy($"user_id").agg(count(lit(1)).as("true_cnt"))
        .join(est, $"user_id".cast("string") === est("it"))
        .select($"user_id", $"true_cnt", $"est_cnt")
        .orderBy("user_id")
    }),

    // bloom-pruned selective join: small parts (p_size <= 5) filter the
    // lineitem scan through a broadcast BITMAP literal before the join
    // shuffle — the runtime-filter pattern; answer == the plain join
    "rel_bloom_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select($"l_partkey".as("p_partkey"),
          round($"l_extendedprice" * 100).cast("long").as("ep_c"))
      val dim = t(s, d, "part").filter($"p_size" <= 5)
        .select($"p_partkey", $"p_brand")
      RangeJoinOps.bloomPrunedJoin(li, dim, "p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), sum($"ep_c").as("rev_c"))
        .select($"p_brand", $"n",
          ($"rev_c".cast("double") / 100.0).as("revenue"))
        .orderBy("p_brand")
    }),

    // CUBE: every grouping-set combination of (returnflag, linestatus)
    // in one pass (rel_rollup's lattice completed); gid disambiguates
    // subtotal NULLs from data NULLs
    "rel_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(sum(round($"l_quantity" * 100).cast("long")).as("qty_c"),
          count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
        .select($"l_returnflag", $"l_linestatus",
          ($"qty_c".cast("double") / 100.0).as("sum_qty"), $"n", $"gid")
        .orderBy($"gid", $"l_returnflag".asc_nulls_last,
          $"l_linestatus".asc_nulls_last)),

    // SCD type-2 dimension-history construction (the classic warehouse
    // op): compress each customer's order-priority event stream into
    // validity intervals — change rows only, [valid_from, valid_to)
    // with the current state open-ended. Lag change-detect + running
    // version sum + per-version agg + lead for the closing date; every
    // window and the groupBy hash-partition on o_custkey (high
    // cardinality), so the plan is one key shuffle reused across
    // stages — no driver state, survives any customer count.
    "rel_scd2" -> ((s, d) => {
      val o = t(s, d, "orders")
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      val prev = lag($"o_orderpriority", 1).over(w)
      val ver = o.select($"o_custkey", $"o_orderdate", $"o_orderkey",
          $"o_orderpriority")
        .withColumn("chg",
          when(prev.isNull.or(prev =!= $"o_orderpriority"), 1L)
            .otherwise(0L))
        .withColumn("version", sum($"chg").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val g = ver.groupBy($"o_custkey", $"version")
        .agg(min($"o_orderpriority").as("priority"), // constant per version
          min($"o_orderdate").as("valid_from"),
          count(lit(1)).as("n_orders"))
      val w2 = Window.partitionBy($"o_custkey").orderBy($"version")
      g.select($"o_custkey", $"version", $"priority", $"valid_from",
          lead($"valid_from", 1).over(w2).as("valid_to"), $"n_orders")
        .orderBy($"o_custkey", $"version")
    }),

    // JSON scalar extraction (§2.8; fixtures' props column): histogram of
    // props.k with per-bucket value stats
    "rel_json_props" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.select(get_json_object($"props", "$.k").cast("long").as("k"), $"value")
        .groupBy($"k")
        .agg(count(lit(1)).as("n"),
             sum(round($"value" * 100).cast("long")).as("v_c"))
        .select($"k", $"n", ($"v_c".cast("double") / $"n" / 100.0).as("avg_value"))
        .orderBy($"k")
    }),

    // scalar date functions (§2.8): orders per month × priority
    "rel_date_buckets" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"),
          $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
             sum(round($"o_totalprice" * 100).cast("long")).as("tp_c"))
        .select($"month", $"o_orderpriority", $"n",
          ($"tp_c".cast("double") / 100.0).as("total_price"))
        .orderBy($"month", $"o_orderpriority")
    }),

    // general as-of join (§2.3): each event picks the same user's latest
    // order at or before the event time — union + keyed running `last`,
    // one shuffle on the high-cardinality user key, no range explosion
    "rel_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val o = t(s, d, "orders")
      graft.operators.TimeSeriesOps.asofJoin(
          ev, $"user_id", $"ts", $"event_id",
          o, $"o_custkey", $"o_orderdate".cast("timestamp"), $"o_orderkey",
          round($"o_totalprice" * 100).cast("long"))
        .select($"k".as("user_id"), $"lid".as("event_id"), $"l_ts_us",
          $"r_ts_us", $"r_tb".as("o_orderkey"),
          ($"r_val".cast("double") / 100.0).as("o_totalprice"))
        .orderBy("event_id")
    }),

    // band join (§2.3 beyond-reference): same-brand part pairs within $1
    // retail price, via bucket replication — an ordinary equi shuffle join
    // on (brand, price-bucket), never a nested-loop pair generator
    "rel_band_join" -> ((s, d) =>
      graft.operators.RangeJoinOps.selfBandJoin(
          t(s, d, "part"), $"p_brand", $"p_partkey",
          round($"p_retailprice" * 100).cast("long"), 100L)
        .orderBy("key", "id_a", "id_b")),

    // the same capability written NAIVELY — plain abs(va-vb) <= 10 with
    // no equi key, which Spark alone would nested-loop. The injected
    // graft.plans.BandJoinRewrite optimizer rule turns it into the
    // bucketed equi join automatically (PlanAuditSpec proves no
    // nested-loop stage survives in this very query's plan).
    "rel_band_join_auto" -> ((s, d) => {
      val p = t(s, d, "part").select($"p_partkey",
        round($"p_retailprice" * 100).cast("long").as("v"))
      val a = p.select($"p_partkey".as("id_a"), $"v".as("v_a"))
      val b = p.select($"p_partkey".as("id_b"), $"v".as("v_b"))
      a.join(b, abs($"v_a" - $"v_b") <= lit(10L) && $"id_a" < $"id_b")
        .orderBy("id_a", "id_b")
    }),

    // ordered conversion funnel: users completing view, then click
    // strictly after their first view, then purchase strictly after
    // that click (out-of-order events do not convert). Scoped to the
    // fixture's first day so conversion is PARTIAL (56 -> 19 -> 3 at
    // sf0.01) — over the full month every user trivially completes all
    // three steps and the gate would not discriminate the ordering rule
    "rel_funnel" -> ((s, d) =>
      TimeSeriesOps.funnelSteps(
          t(s, d, "events")
            .filter($"ts" < lit("2024-01-02 00:00:00").cast("timestamp")),
          $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step_idx")),

    // last-touch attribution: for every purchase, the user's latest
    // strictly-earlier non-purchase event type ('none' if first)
    "rel_attribution" -> ((s, d) =>
      TimeSeriesOps.lastTouchAttribution(t(s, d, "events"), $"user_id",
          $"ts", $"event_type", "purchase", $"event_id")
        .orderBy("attributed_type")),

    // weekly cohort retention: users by the week of their first signup,
    // counted active in every later week they produce any event
    "rel_cohorts" -> ((s, d) =>
      TimeSeriesOps.cohortRetention(t(s, d, "events"), $"user_id", $"ts",
          $"event_type", "signup", bucketSec = 604800L)
        .orderBy("cohort_epoch", "bucket_epoch")),

    // sessionization: split each user's event stream at 30-minute
    // inactivity gaps (the classic clickstream operator) — lag +
    // running flag-sum in per-user bounded windows, one per-session agg
    "rel_sessions" -> ((s, d) =>
      TimeSeriesOps.sessionize(t(s, d, "events"),
          $"user_id", $"ts", $"event_id", gapSec = 1800L)
        .select($"key".as("user_id"), $"session_idx", $"start_us",
          $"end_us", $"n_events")
        .orderBy("user_id", "session_idx")),

    // exact order-value quartiles per market segment — the time-series
    // percentile machinery (two-phase rank, no hot-segment sort task)
    // applied to a relational join
    "rel_price_quartiles" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      TimeSeriesOps.percentiles(
          o.join(c, $"o_custkey" === $"c_custkey"),
          $"c_mktsegment", $"o_totalprice", $"o_orderkey",
          Seq(25, 50, 75, 100))
        .select($"channel".as("segment"), $"pct", $"value", $"n")
        .orderBy("segment", "pct")
    }),

    // latest-row-per-key snapshot (the CDC/compaction readout: collapse
    // an append-only change stream to current state) — ONE struct-max
    // aggregate, no window sort: at 100 TB the per-key max is a map-side
    // partial agg, where a row_number() window would shuffle-sort the
    // full history. Order key = (date, orderkey) so ties are total.
    "rel_latest_order" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          max(struct(unix_micros($"o_orderdate".cast("timestamp")).as("t"),
            $"o_orderkey".as("k"),
            round($"o_totalprice" * 100).cast("long").as("pc"),
            $"o_orderstatus".as("st"))).as("b"))
        .select($"o_custkey", $"n_orders", $"b.t".as("last_ts_us"),
          $"b.k".as("last_orderkey"),
          ($"b.pc".cast("double") / 100.0).as("last_price"),
          $"b.st".as("last_status"))
        .orderBy("o_custkey")),

    // hierarchical ROLLUP totals (SURVEY §2.4: grouping sets come free
    // from Catalyst — one Expand + the same partial-agg shuffle as a
    // plain groupBy; gid disambiguates a NULL group key from a subtotal)
    "rel_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum(round($"l_quantity" * 100).cast("long")).as("qty_c"),
          count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
        .select($"l_returnflag", $"l_linestatus",
          ($"qty_c".cast("double") / 100.0).as("sum_qty"), $"n", $"gid")
        // explicit null ordering: Spark ascending defaults NULLS FIRST,
        // DuckDB NULLS LAST — gid happens to segregate the subtotal
        // NULLs on TPC-H's non-null keys, but a genuinely NULL group
        // key must not make row order engine-dependent
        .orderBy($"gid", $"l_returnflag".asc_nulls_last,
          $"l_linestatus".asc_nulls_last)))

  def oracles: Map[String, String] = Map(
    "rel_cms_heavy" -> {
      val jList = (0 until CmsD).mkString("[", ", ", "]")
      val hashB = DetHash.h60Sql(
        "'cms' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
      s"""
      WITH js AS (SELECT unnest($jList) AS j),
      cells AS (SELECT j, $hashB % $CmsW AS bucket
                FROM events, js),
      cms AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
              FROM cells GROUP BY 1, 2),
      pr AS (SELECT DISTINCT user_id FROM events
             WHERE user_id < $CmsProbeMax),
      pb AS (SELECT user_id, j, $hashB % $CmsW AS bucket
             FROM pr, js),
      es AS (SELECT user_id, min(coalesce(cnt, 0)) AS est_cnt
             FROM pb LEFT JOIN cms USING (j, bucket) GROUP BY 1),
      ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
             FROM events WHERE user_id < $CmsProbeMax GROUP BY 1)
      SELECT ex.user_id, true_cnt, CAST(est_cnt AS BIGINT) AS est_cnt
      FROM ex JOIN es USING (user_id)
      ORDER BY 1"""
    },

    "rel_price_quartiles" -> """
      WITH v AS (SELECT c_mktsegment AS segment,
                        CAST(round(o_totalprice*100) AS BIGINT) AS vc,
                        o_orderkey AS tb
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE o_totalprice IS NOT NULL),
      r AS (SELECT segment, vc,
                   CAST(row_number() OVER (PARTITION BY segment
                     ORDER BY vc, tb) AS BIGINT) AS rk,
                   CAST(count(*) OVER (PARTITION BY segment) AS BIGINT) AS n
            FROM v),
      t AS (SELECT segment, n, unnest([25, 50, 75, 100]) AS p
            FROM (SELECT DISTINCT segment, n FROM r))
      SELECT r.segment, CAST(t.p AS BIGINT) AS pct,
             CAST(r.vc AS DOUBLE)/100.0 AS value, t.n
      FROM t JOIN r ON r.segment = t.segment
                   AND r.rk = (t.n * t.p + 99) // 100
      ORDER BY 1, 2""",

    "rel_latest_order" -> """
      WITH m AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               max(struct_pack(
                 t := epoch_us(CAST(o_orderdate AS TIMESTAMP)),
                 k := o_orderkey,
                 pc := CAST(round(o_totalprice*100) AS BIGINT),
                 st := o_orderstatus)) AS b
        FROM orders GROUP BY 1)
      SELECT o_custkey, n_orders, (b).t AS last_ts_us,
             (b).k AS last_orderkey,
             CAST((b).pc AS DOUBLE)/100.0 AS last_price,
             (b).st AS last_status
      FROM m ORDER BY o_custkey""",

    "rel_funnel" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et
                 FROM events
                 WHERE ts < TIMESTAMP '2024-01-02 00:00:00'),
      s1 AS (SELECT user_id, min(t) AS t1 FROM e
             WHERE et = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.t) AS t2
             FROM e JOIN s1 USING (user_id)
             WHERE e.et = 'click' AND e.t > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.t) AS t3
             FROM e JOIN s2 USING (user_id)
             WHERE e.et = 'purchase' AND e.t > s2.t2 GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL SELECT CAST(2 AS BIGINT), 'click',
               CAST(count(*) AS BIGINT) FROM s2
        UNION ALL SELECT CAST(3 AS BIGINT), 'purchase',
               CAST(count(*) AS BIGINT) FROM s3)
      ORDER BY step_idx""",

    "rel_attribution" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et,
                        event_id AS tb
                 FROM events),
      a AS (SELECT user_id, t, et,
                   last_value(CASE WHEN et <> 'purchase' THEN et END
                     IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY t, tb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS attr
            FROM e)
      SELECT coalesce(attr, 'none') AS attributed_type,
             CAST(count(*) AS BIGINT) AS n
      FROM a WHERE et = 'purchase'
      GROUP BY 1 ORDER BY 1""",

    "rel_cohorts" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et
                 FROM events),
      cohort AS (SELECT user_id,
                        (min(t) // 1000000 // 604800) * 604800 AS cohort_epoch
                 FROM e WHERE et = 'signup' GROUP BY 1),
      active AS (SELECT DISTINCT user_id,
                        (t // 1000000 // 604800) * 604800 AS bucket_epoch
                 FROM e)
      SELECT c.cohort_epoch, a.bucket_epoch,
             CAST(count(*) AS BIGINT) AS n_active
      FROM cohort c JOIN active a USING (user_id)
      WHERE a.bucket_epoch >= c.cohort_epoch
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "rel_sessions" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS tb
                 FROM events),
      l AS (SELECT user_id, ts_us, tb,
                   lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, tb) AS prev
            FROM e),
      f AS (SELECT user_id, ts_us, tb,
                   CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
                        THEN 1 ELSE 0 END AS ns
            FROM l),
      s AS (SELECT user_id, ts_us,
                   sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, tb
                     ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             min(ts_us) AS start_us, max(ts_us) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "rel_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_qty,
             count(*) AS n,
             CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",

    "rel_band_join_auto" -> """
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             CAST(round(a.p_retailprice*100) AS BIGINT) AS v_a,
             CAST(round(b.p_retailprice*100) AS BIGINT) AS v_b
      FROM part a JOIN part b
        ON abs(CAST(round(a.p_retailprice*100) AS BIGINT)
             - CAST(round(b.p_retailprice*100) AS BIGINT)) <= 10
       AND a.p_partkey < b.p_partkey
      ORDER BY 1, 2""",

    "rel_band_join" -> """
      SELECT a.p_brand AS key, a.p_partkey AS id_a, b.p_partkey AS id_b,
             CAST(round(a.p_retailprice*100) AS BIGINT) AS v_a,
             CAST(round(b.p_retailprice*100) AS BIGINT) AS v_b
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
       AND abs(CAST(round(a.p_retailprice*100) AS BIGINT)
             - CAST(round(b.p_retailprice*100) AS BIGINT)) <= 100
      ORDER BY 1, 2, 3""",

    "rel_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_qty,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_base_price,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS sum_disc_price,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_charge,
        CAST(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/100.0 AS avg_qty,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/100.0 AS avg_price,
        count(*) AS count_order
      FROM lineitem
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // the bucketed layout must be value-transparent: same closed form as
    // the plain-parquet join it co-locates
    "rel_bucketed_join" -> """
      SELECT c_mktsegment,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""",

    "rel_star_revenue" -> """
      SELECT r_name, n_name,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS DOUBLE)/10000.0 AS revenue,
        count(*) AS n_lines
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "rel_brand_stats" -> """
      SELECT p_brand, count(*) AS n,
        CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/100.0 AS avg_price,
        min(l_extendedprice) AS min_price,
        max(l_extendedprice) AS max_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1""",

    "rel_cust_no_orders" -> """
      SELECT n_name, count(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY 1 ORDER BY 1""",

    "rel_topk_customers" -> """
      SELECT o_custkey,
        CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS spend,
        count(*) AS n_orders
      FROM orders
      GROUP BY 1
      ORDER BY spend DESC, o_custkey
      LIMIT 10""",

    "rel_setops_users" -> """
      SELECT 'both' AS cohort, user_id
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      UNION ALL
      SELECT 'purchase_only' AS cohort, user_id
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      ORDER BY 1, 2""",

    "rel_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_custkey, rk""",

    // the plain join IS the oracle: the bloom prefilter must not change
    // the answer (false positives die in the join, negatives impossible)
    "rel_bloom_join" -> """
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
               AS BIGINT) AS DOUBLE)/100.0 AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 5
      GROUP BY 1 ORDER BY 1""",

    "rel_cube" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_qty,
             count(*) AS n,
             CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",

    // the plain join IS the oracle: salting must not change the answer
    "rel_salted_agg" -> """
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
               AS DOUBLE)/100.0 AS total
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1 ORDER BY 1""",

    "rel_scd2" -> """
      WITH o AS (SELECT o_custkey AS c, o_orderdate AS d, o_orderkey AS k,
                        o_orderpriority AS p FROM orders),
      l AS (SELECT c, d, k, p,
                   lag(p) OVER (PARTITION BY c ORDER BY d, k) AS pp FROM o),
      f AS (SELECT c, d, k, p,
                   CASE WHEN pp IS NULL OR p <> pp THEN 1 ELSE 0 END AS ns
            FROM l),
      s AS (SELECT c, d, p,
                   sum(ns) OVER (PARTITION BY c ORDER BY d, k
                     ROWS UNBOUNDED PRECEDING) AS version FROM f),
      g AS (SELECT c AS o_custkey, CAST(version AS BIGINT) AS version,
                   min(p) AS priority, min(d) AS valid_from,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM s GROUP BY 1, 2)
      SELECT o_custkey, version, priority, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey
               ORDER BY version) AS valid_to,
             n_orders
      FROM g ORDER BY 1, 2""",

    "rel_json_props" -> """
      SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             count(*) AS n,
             CAST(CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/count(*)/100.0 AS avg_value
      FROM events GROUP BY 1 ORDER BY 1""",

    "rel_date_buckets" -> """
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             o_orderpriority, count(*) AS n,
             CAST(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS total_price
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "rel_asof_join" -> """
      WITH u AS (
        SELECT o_custkey AS k, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS t,
               0 AS side, o_orderkey AS rtb,
               CAST(round(o_totalprice*100) AS BIGINT) AS rv,
               CAST(NULL AS BIGINT) AS lid
        FROM orders
        UNION ALL
        SELECT user_id, epoch_us(ts), 1, NULL, NULL, event_id FROM events),
      w AS (
        SELECT *, last_value(CASE WHEN side = 0
                 THEN struct_pack(rt := t, rtb := rtb, rv := rv) END IGNORE NULLS)
               OVER (PARTITION BY k ORDER BY t, side, rtb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        FROM u)
      SELECT k AS user_id, lid AS event_id, t AS l_ts_us,
             m.rt AS r_ts_us, m.rtb AS o_orderkey,
             CAST(m.rv AS DOUBLE)/100.0 AS o_totalprice
      FROM w WHERE side = 1 ORDER BY event_id""")
}
