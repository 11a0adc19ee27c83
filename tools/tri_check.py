#!/usr/bin/env python3
"""sf1-scale cross-check for s24 triangles / clustering coefficient.

Reproducible form of the ad-hoc closure run recorded in commit
a1cbc59 (cc_check/pr_check/lpa_check pattern): pure-Python triangle
enumeration over the hash-verified s10 mutual edge list —
sorted-adjacency intersection per edge, each triangle counted once at
its lowest vertex — then per-vertex degree, triangle count, and the
exact-integer coefficient floor(2e6*t / (d*(d-1))) (0 when d < 2),
compared against the Spark s24 dump.

Usage: python3 tools/tri_check.py <verifyOutDir>
  verifyOutDir must hold s10_mutual_knn/ and s24_knn_triangles/
"""
import os
import sys
from collections import defaultdict

import duckdb


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main(out_dir):
    con = duckdb.connect()
    m = read(con, f"{out_dir}/s10_mutual_knn")[["ida", "idb"]]
    edges = [(int(a), int(b)) for a, b in m.itertuples(index=False)]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri = defaultdict(int)
    for a, b in edges:  # a < b by s10 construction
        for c in nbrs[a] & nbrs[b]:
            if c > b:  # count each a < b < c triangle once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    exp = sorted(
        (v, len(nbrs[v]), tri.get(v, 0),
         (2000000 * tri.get(v, 0)) // (len(nbrs[v]) * (len(nbrs[v]) - 1))
         if len(nbrs[v]) >= 2 else 0)
        for v in nbrs)
    got = sorted(
        (int(r.vec_id), int(r.deg), int(r.triangles), int(r.lc_e6))
        for r in read(con, f"{out_dir}/s24_knn_triangles").itertuples())
    if exp != got:
        diff = next((g, e) for g, e in zip(got, exp) if g != e)
        print(f"FAIL s24: {len(got)} rows vs {len(exp)}; first diff {diff}")
        print("== 0 ok, 1 fail ==")
        return 1
    print(f"ok   s24_knn_triangles ({len(got)} rows, pure-python closure)")
    print("== 1 ok, 0 fail ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
