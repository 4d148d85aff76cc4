#!/usr/bin/env python3
"""Local scale-up aid: synthesize an sf1-shaped dataset (10x sf0.1) for
the once-per-round full-suite perf audit (round-11 verdict #5). Keys are
shifted per replica so uniqueness and the FK graph survive; dimension
tables (region/nation) stay fixed. NOT driver data — lives under /tmp.

Usage: make_sf1.py [outDir]   (default /tmp/sf1)
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10

# per-table key columns to shift, with their shift constant (a power of
# ten above the sf0.1 max so replicas never collide)
SHIFTS = {
    "customer": {"c_custkey": 100000},
    "supplier": {"s_suppkey": 10000},
    "part": {"p_partkey": 100000},
    "orders": {"o_orderkey": 1000000, "o_custkey": 100000},
    "lineitem": {"l_orderkey": 1000000, "l_partkey": 100000,
                 "l_suppkey": 10000},
    "events": {"event_id": 1000000, "user_id": 1000000},
    "documents": {"doc_id": 100000},
    "embeddings": {"vec_id": 100000},
}
COPY_AS_IS = ["region", "nation"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")
    for t, shifts in SHIFTS.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"({c} + {i * s}) AS {c}" if (c in shifts and (s := shifts[c]))
                else c for c in cols)
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(selects)}) "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
