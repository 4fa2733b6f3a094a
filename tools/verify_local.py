#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only;
the shipped library has no Python dependency).

Runs graft.Verify output (parquet per query) against DuckDB executing
SparkEntry.oracleSql over the same testdata tables, compares values
with columns sorted by name.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [query...]

Side effect: writes <verifyOutDir>/oracle_times.json — per-query DuckDB
wall seconds for the oracle side — so the 2x-of-baseline throughput
contract is per-query checkable (tools/ratio_table.py joins it against
the Spark side's target/bench_full.json).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    oracle_secs = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            t0 = time.perf_counter()
            exp = con.execute(sql).fetchdf()
            oracle_secs[name] = round(time.perf_counter() - t0, 3)
            got = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # The driver hashes value reprs, so dtype drift that compares
        # equal still fails there: DuckDB HUGEINT (sum of BIGINT) and
        # DECIMAL fetchdf as float64/object while Spark writes int64 —
        # '324067.0' vs '324067'. Mirror that strictness here.
        dt = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
              if str(exp[c].dtype) != str(got[c].dtype)]
        if dt:
            print(f"WARN {name}: dtype drift {dt} "
                  f"(CAST the oracle aggregate — HUGEINT/DECIMAL trap)")
        mismatch = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a != b and not (a != a and b != b):  # NaN==NaN ok
                    mismatch = (c, i, a, b)
                    break
                if str(a) != str(b):  # repr drift fails the hash gate
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: got {b!r} want {a!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    with open(f"{out_dir}/oracle_times.json", "w") as f:
        json.dump(oracle_secs, f, indent=0, sort_keys=True)
    print(f"\n{n_pass} passed, {n_fail} failed "
          f"(oracle timings -> {out_dir}/oracle_times.json)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
