#!/usr/bin/env python3
"""DuckDB-proxy baseline timing: run every oracle SQL from a Verify
oracle_sql.json against the parquet tables at a scale-factor dir and
time each. This is the denominator for the BENCH ratio (BASELINE.md
publishes no reference wall-time, so the working proxy IS the bar).

Usage: python3 tools/proxy_bench.py [sfdir] [oracle_sql.json] [out.json]
"""
import sys, os, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/proxy_bench.json"
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # same resource bounds + dir-table handling as check.py: expanded
    # corpora (the sf1-equivalent run) need spill instead of OOM, and
    # their tables are Spark-written directories
    # bounded to 60% of physical RAM (capped at 48 GB): a hardcoded
    # limit above RAM would re-enable the OOM-kill the setting exists
    # to prevent on smaller hosts
    mem_gb = max(4, min(48, int(os.sysconf("SC_PAGE_SIZE")
                                 * os.sysconf("SC_PHYS_PAGES") / 2**30 * 0.6)))
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/**/*.parquet', "
                        f"hive_partitioning=1)")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    # 3 runs per query, MEDIAN as the headline number (plus min/max in
    # the spread map): several oracles — llm_ann_filtered's nested-loop
    # shape above all, measured swinging 54-304 s across rounds — have
    # proxy-side variance that a single-shot timing inherits straight
    # into the round-over-round ratio comparisons. The median makes the
    # denominator stable; min/max keep the spread diagnosable.
    import statistics
    times, spread, failed = {}, {}, []
    for name, sql in sorted(oracles.items()):
        ts = []
        try:
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                ts.append(time.monotonic() - t0)
            times[name] = round(statistics.median(ts), 6)
            spread[name] = {"min": round(min(ts), 6), "max": round(max(ts), 6)}
        except Exception as e:
            times[name] = -1.0
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:160]}", file=sys.stderr)
        print(f"{times[name]:10.3f}  {name}", file=sys.stderr)
    total = sum(v for v in times.values() if v > 0)
    result = {"metric": "proxy_total", "value": round(total, 3), "unit": "sec",
              "sf": sfdir, "n_queries": len(times), "n_failed": len(failed),
              "failed": failed, "queries": times, "spread": spread}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in
                      ("metric", "value", "unit", "sf", "n_queries", "n_failed")}))


if __name__ == "__main__":
    main()
