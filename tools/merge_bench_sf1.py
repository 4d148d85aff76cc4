#!/usr/bin/env python3
"""Merge the full single-run sf1 bench with a multi-run re-measure of its
slowest tail into one committed bench_sf1.json (round-13 verdict #3: the
sf1 tail must be pinned with best-of-2/median-of-3, noted per entry).

Usage: merge_bench_sf1.py <single_run.json> <tail_rerun.json> <out.json>

The output carries the single-run map with tail entries REPLACED by the
re-measured medians, plus `runs_per_query` so every number's provenance
(1 = single-run, N = median-of-N) is machine-readable, and both passes'
host-calibration probes.
"""
import json
import sys


def main() -> None:
    single_path, tail_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(single_path) as f:
        single = json.load(f)
    with open(tail_path) as f:
        tail = json.load(f)

    queries = dict(single["queries"])
    runs_per_query = {q: 1 for q in queries}
    for q, sec in tail["queries"].items():
        queries[q] = sec
        runs_per_query[q] = tail.get("runs", 3)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "total_s": total,
        "n_queries": len(queries),
        "sf": single.get("sf"),
        "calib_single_run": single.get("calib"),
        "calib_tail_rerun": tail.get("calib"),
        "tail_rerun_n": len(tail["queries"]),
        "tail_rerun_runs": tail.get("runs", 3),
        "runs_per_query": runs_per_query,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {total}s / {len(queries)} queries "
          f"({len(tail['queries'])} tail entries median-of-{tail.get('runs', 3)})")


if __name__ == "__main__":
    main()
