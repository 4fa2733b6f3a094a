#!/usr/bin/env python3
"""Join the Spark bench sidecar (target/bench_full.json, per-query
seconds at SPARK_GRAFT_SF_DIR) against the DuckDB oracle timing sidecar
(<verifyOutDir>/oracle_times.json from tools/verify_local.py run over
the SAME sf) into the per-query ratio table the throughput contract
("match-or-beat single-node, nothing >2x out of family line") needs —
previously the contract was only checkable in aggregate. Dev tooling
only; the shipped library has no Python dependency.

Usage: python3 tools/ratio_table.py <benchFullJson> <oracleTimesJson> [outMd]
"""
import json
import sys


def main():
    bench_path, oracle_path = sys.argv[1], sys.argv[2]
    out_md = sys.argv[3] if len(sys.argv) > 3 else "BENCH_RATIO.md"
    with open(bench_path) as f:
        bench = json.load(f)
    with open(oracle_path) as f:
        oracle = json.load(f)
    spark = bench.get("queries", bench)

    rows = []
    for name, s_sec in spark.items():
        if name in oracle:
            d_sec = max(oracle[name], 1e-3)
            rows.append((name, s_sec, oracle[name], s_sec / d_sec))
    rows.sort(key=lambda r: -r[3])

    spark_only = sorted(set(spark) - set(oracle))
    over2 = [r for r in rows if r[3] > 2.0]
    lines = [
        "# Spark vs DuckDB oracle — per-query wall seconds",
        "",
        f"Spark side: `{bench_path}` (sf: `{bench.get('sf', '?')}`); "
        f"oracle side: `{oracle_path}`.",
        f"{len(rows)} comparable queries; {len(over2)} exceed 2x the "
        f"oracle; {len(spark_only)} have no SQL oracle (rows-only gate).",
        "",
        "Spark seconds include its fixed per-stage scheduling overhead "
        "(~0.1-0.3 s/query in local mode), which dominates every ratio "
        "on sub-second oracle queries — the contract line is family-"
        "relative, not the raw ratio.",
        "",
        "| query | spark s | duckdb s | ratio |",
        "|---|---|---|---|",
    ]
    for name, s, d, r in rows[:40]:
        lines.append(f"| {name} | {s:.2f} | {d:.3f} | {r:.1f} |")
    if len(rows) > 40:
        rest = rows[40:]
        s_sum = sum(r[1] for r in rest)
        d_sum = sum(r[2] for r in rest)
        lines.append(f"| …{len(rest)} more | {s_sum:.2f} | {d_sum:.3f} | "
                     f"{s_sum / max(d_sum, 1e-3):.1f} |")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}: {len(rows)} queries, {len(over2)} over 2x")


if __name__ == "__main__":
    main()
