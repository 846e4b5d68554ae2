#!/usr/bin/env python3
"""DuckDB side of the large-scale parity run (see ParityProbe.scala):
run named oracle SQLs against an expanded table dir and time each
(3 runs; median/min/max), so the Spark-vs-proxy ratio for the
stage-floor-suspect queries is a measurement at scale, not an argument.

Registers a view for every <table>.parquet in the dir (Spark-written
directory or single file), so documents- and events-based oracles both
run unchanged.

Usage: python3 tools/parity_duck.py <expanded-dir> \
           [oracle_sql.json] [query ...]
"""
import sys, os, json, statistics, time
import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main():
    d = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    names = sys.argv[3:] or ["llm_ngram_jaccard", "llm_tfidf", "llm_textrank",
                             "ts_anchored_cum", "ts_winsorize",
                             "ts_outliers_mad"]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{d}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    for name in names:
        sql = oracles[name]
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            ts.append(time.monotonic() - t0)
        print(f"[parity-duck] {name:<20} median {statistics.median(ts):.3f} s "
              f"(min {min(ts):.3f}, max {max(ts):.3f})")


if __name__ == "__main__":
    main()
