#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (schema, row count, sorted-value hash).

Usage: python3 tools/check.py [sfdir] [outdir] [query ...]
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # large expanded corpora (the sf1-equivalent 10x run) push some
    # closed-form oracles past RAM — bound DuckDB and let it spill
    # instead of getting OOM-killed mid-battery
    # bounded to 60% of physical RAM (capped at 48 GB): a hardcoded
    # limit above RAM would re-enable the OOM-kill the setting exists
    # to prevent on smaller hosts
    mem_gb = max(4, min(48, int(os.sysconf("SC_PAGE_SIZE")
                                 * os.sysconf("SC_PHYS_PAGES") / 2**30 * 0.6)))
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    # unique per process: concurrent checks must not reap each other's
    # spill files
    con.execute(f"SET temp_directory='/tmp/duck_spill_{os.getpid()}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # single file (driver testdata) or Spark-written directory (the
        # ParityProbe sf1-equivalent expansion) both register
        if os.path.isdir(p):
            # Spark-written dir (flat part files) or hive-partitioned
            # relayout (events.parquet/date=…/part-…) both register;
            # hive_partitioning surfaces the partition column, which the
            # oracles never select
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/**/*.parquet', "
                        f"hive_partitioning=1)")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:120]}")
            n_fail += 1
            continue
        o, g = canon(oracle), canon(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} got={list(g.columns)}")
            n_fail += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} got={len(g)}")
            n_fail += 1
            continue
        diffs = []
        ov, gv = o.values, g.values
        for i in range(len(o)):
            for j in range(len(o.columns)):
                a, b = cell(ov[i][j]), cell(gv[i][j])
                if a != b:
                    diffs.append((i, o.columns[j], a, b))
        if diffs:
            print(f"FAIL {name}: {len(diffs)} cell diffs; first 5:")
            for i, c, a, b in diffs[:5]:
                print(f"   row {i} col {c}: oracle={a} got={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows x {len(o.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
