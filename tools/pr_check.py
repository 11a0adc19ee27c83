#!/usr/bin/env python3
"""sf1-scale cross-check for s22 PageRank (the cc_check.py pattern).

The graded gate runs s22's unrolled 3-iteration exact-integer oracle
in DuckDB at sf0.01. At the local sf1-equivalent the only standing
evidence was bench wall-clock; this closes it the way cc_check closes
the CC family: a pure-Python replica of the e9 fixed point over an
edge list that is ITSELF hash-verified (s09's non-recursive oracle
hash-matches at sf1), plus the embeddings node roster.

Replicated arithmetic (Similarity.pageRank — every division floored,
all values positive, so Python // == Spark div):

    pr0      = 1e9 div n                      (all corpus vectors)
    inflow_d = sum over edges (s -> d) of pr[s] div out_deg[s]
    pr'      = (0.15e9 div n) + (85 * inflow) div 100
    3 iterations; dangling mass dropped; isolated nodes teleport-only.

Usage: python3 tools/pr_check.py <sfDir> <verifyOutDir>
"""
import os
import sys

import duckdb


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    nodes = [int(v) for v in
             read(con, f"{sf_dir}/embeddings.parquet")["vec_id"]]
    n = len(nodes)
    g = read(con, f"{out_dir}/s09_knn_graph")[["vec_id", "neighbor_id"]]
    edges = [(int(a), int(b)) for a, b in g.itertuples(index=False)]
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1

    pr = {v: 1000000000 // n for v in nodes}
    for _ in range(3):
        inflow = {}
        for a, b in edges:
            inflow[b] = inflow.get(b, 0) + pr[a] // out_deg[a]
        pr = {v: (150000000 // n) + (85 * inflow.get(v, 0)) // 100
              for v in nodes}

    exp = sorted((v, out_deg.get(v, 0), pr[v]) for v in nodes)
    got = sorted(
        (int(r.vec_id), int(r.out_deg), int(r.pr_e9))
        for r in read(con, f"{out_dir}/s22_pagerank").itertuples())
    if exp != got:
        diff = next((g_, e_) for g_, e_ in zip(got, exp) if g_ != e_)
        print(f"FAIL s22: {len(got)} rows vs expected {len(exp)}; "
              f"first diff {diff}")
        print("== 0 ok, 1 fail ==")
        return 1
    print(f"ok   s22_pagerank ({len(got)} rows, pure-python fixed point)")
    print("== 1 ok, 0 fail ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
