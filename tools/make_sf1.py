#!/usr/bin/env python3
"""Local scale-up aid: synthesize an sf1-shaped dataset (10x sf0.1) for
the once-per-round full-suite perf audit. Keys are shifted per replica so
uniqueness and the FK graph survive; dimension tables (region/nation)
stay fixed. NOT driver data — lives under /tmp.

Round 12 (verdict #1): documents and embeddings replicas are PERTURBED,
not verbatim. Verbatim 10x replication gave every document 9 exact twins
(~100x true pairs for 10x data), so the pair-OUTPUT-bound operators'
sf1 wall-clock measured twin explosion, not the engine. Now:

 - documents replica i: every token is suffixed "_i" (disjoint vocab →
   zero cross-replica shingle/token overlap; WITHIN-replica near-dup
   structure is preserved exactly, so each replica contributes the base
   corpus's own pair population);
 - controlled cross-replica near-dups: docs with doc_id % 10 == 0 keep
   the BASE text in replicas 1..3 with a tiny tail edit (" nd<i>" — one
   appended token ≈ edit-distance-1 noise), planting groups of 4 →
   6 true pairs per planted doc, i.e. a 10% dup rate;
 - embeddings replica i: dimensions are permuted + sign-flipped with a
   replica-keyed RNG (within-replica geometry identical — norms and
   pairwise cosines preserved — cross-replica similarity ≈ random);
   vec_id % 10 == 0 keeps the base orientation in replicas 1..3 with
   ~N(0, 0.01) noise (cosine ≈ 0.995: a true near-dup).

The fixture also writes sf1_manifest.json with the planted-pair
accounting so the scale audit (tools + ScaleAudit) can pin
time_ratio <= c * output_ratio mechanically instead of by prose.

Usage: make_sf1.py [outDir]   (default /tmp/sf1)
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10
NEARDUP_MOD = 10      # doc_id/vec_id % 10 == 0 → planted near-dup group
NEARDUP_REPLICAS = 3  # replicas 1..3 carry the near-dup variant

SHIFTS = {
    "customer": {"c_custkey": 100000},
    "supplier": {"s_suppkey": 10000},
    "part": {"p_partkey": 100000},
    "orders": {"o_orderkey": 1000000, "o_custkey": 100000},
    "lineitem": {"l_orderkey": 1000000, "l_partkey": 100000,
                 "l_suppkey": 10000},
    "events": {"event_id": 1000000, "user_id": 1000000},
}
COPY_AS_IS = ["region", "nation"]
DOC_SHIFT = 100000
VEC_SHIFT = 100000


def perturb_documents(con):
    base = pd.read_parquet(f"{SRC}/documents.parquet")
    out = [base]
    for i in range(1, COPIES):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + i * DOC_SHIFT
        nd = (base["doc_id"] % NEARDUP_MOD == 0) & (i <= NEARDUP_REPLICAS)
        # disjoint-vocab replica: suffix every token (within-replica
        # structure preserved, cross-replica overlap zero)
        suffixed = base["text"].str.replace(
            r"(\S+)", lambda m: m.group(1) + f"_{i}", regex=True)
        # planted near-dups: base text + one appended token
        neardup = base["text"] + f" nd{i}"
        rep["text"] = np.where(nd, neardup, suffixed)
        out.append(rep)
    df = pd.concat(out, ignore_index=True)
    df.to_parquet(f"{OUT}/documents.parquet", index=False)
    n_planted = int(((base["doc_id"] % NEARDUP_MOD) == 0).sum())
    print("documents", len(df), "planted near-dup groups:", n_planted)
    return n_planted


def perturb_embeddings(con):
    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(base["embedding"].iloc[0])
    mat = np.stack(base["embedding"].to_numpy())
    out = [base]
    for i in range(1, COPIES):
        rng = np.random.default_rng(1000 + i)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        rep = base.copy()
        rep["vec_id"] = rep["vec_id"] + i * VEC_SHIFT
        permuted = (mat[:, perm] * signs).astype(np.float32)
        nd = ((base["vec_id"] % NEARDUP_MOD == 0) &
              (i <= NEARDUP_REPLICAS)).to_numpy()
        noisy = (mat + rng.normal(0.0, 0.01, size=mat.shape)
                 ).astype(np.float32)
        vecs = np.where(nd[:, None], noisy, permuted)
        rep["embedding"] = list(vecs)
        out.append(rep)
    df = pd.concat(out, ignore_index=True)
    df.to_parquet(f"{OUT}/embeddings.parquet", index=False)
    n_planted = int(((base["vec_id"] % NEARDUP_MOD) == 0).sum())
    print("embeddings", len(df), "planted near-dup groups:", n_planted)
    return n_planted


def main():
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
            def proj_col(c):
                if c in shifts:
                    return f"({c} + {i * shifts[c]}) AS {c}"
                # customer names get the documents treatment (q141's fuzzy
                # join otherwise sees 10 exact twins per name): replicas
                # suffix "@<i>" (edit distance 2 > maxDist 1 — no
                # cross-replica match, within-replica distances exactly
                # preserved); planted near-dups (c_custkey % 10 == 0,
                # replicas 1..3) append ONE letter — true distance-1 pairs
                if t == "customer" and c == "c_name" and i > 0:
                    letter = chr(ord('a') + i - 1)
                    nd = f"c_custkey % {NEARDUP_MOD} = 0" \
                        if i <= NEARDUP_REPLICAS else "FALSE"
                    return (f"(CASE WHEN {nd} THEN c_name || '{letter}' "
                            f"ELSE c_name || '@{i}' END) AS c_name")
                return c
            proj = ", ".join(proj_col(c) for c in cols)
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(selects)}) "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n)
    nd_docs = perturb_documents(con)
    nd_vecs = perturb_embeddings(con)
    manifest = {
        "copies": COPIES,
        "neardup_mod": NEARDUP_MOD,
        "neardup_replicas": NEARDUP_REPLICAS,
        "planted_doc_groups": nd_docs,
        "planted_vec_groups": nd_vecs,
        # each planted group = base + NEARDUP_REPLICAS variants →
        # C(NEARDUP_REPLICAS+1, 2) true cross-replica pairs
        "pairs_per_group": (NEARDUP_REPLICAS + 1) * NEARDUP_REPLICAS // 2,
        "note": ("within-replica near-dup structure equals the base "
                 "corpus's own (token-suffix preserves overlap inside a "
                 "replica); cross-replica overlap is zero outside the "
                 "planted groups"),
    }
    with open(f"{OUT}/sf1_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print("manifest", manifest)


if __name__ == "__main__":
    main()
