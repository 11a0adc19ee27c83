#!/usr/bin/env python3
"""sf1-scale cross-check for the CC-family queries (s11/s12/s15).

The driver-faithful oracles compute connected components with a
recursive transitive-closure CTE (`reach` — all-pairs reachability,
O(sum of component size squared) rows). That is fine at the graded
sf0.01 gate, but at the local sf1-equivalent the mutual-kNN graph's
largest components are big enough that DuckDB's recursion
materialization blows the 24 GB memory cap (measured 2026-08-14:
s11 fails with an out-of-memory pin error after ~70 min; the SPARK
side of s11 finishes in seconds in the same corpus). So at sf1 the
CC trio is cross-checked with the recursion replaced by union-find
over an edge list that is ITSELF hash-verified:

  * s10's oracle (no recursion) hash-matched Spark's mutual-edge
    list at sf1 — those edges are exactly the CC input;
  * union-find with min-id representatives reproduces the labels the
    recursive `least(src, min(dst))` oracle converges to;
  * s12's representative rule (max norm, tie min vec_id) and s15's
    internal/escape split over the s09 directed graph (also
    hash-verified at sf1) are pure per-component arithmetic.

This is local scale evidence only — the driver's gate remains the
recursive DuckDB oracle at sf0.01, where it runs comfortably.

Usage: python3 tools/cc_check.py <sfDir> <verifyOutDir>
"""
import math
import os
import sys

import duckdb


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = p.setdefault(x, x)
        while p[r] != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id representative, matching the oracle's least() form
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def main(sf_dir, out_dir):
    con = duckdb.connect()
    edges = read(con, f"{out_dir}/s10_mutual_knn")[["ida", "idb"]]
    uf = UF()
    for a, b in edges.itertuples(index=False):
        uf.union(int(a), int(b))
    label = {v: uf.find(v) for v in uf.p}
    sizes = {}
    for v, c in label.items():
        sizes[c] = sizes.get(c, 0) + 1

    bad = 0

    # s11: (vec_id, cluster_id, cluster_sz) over edge-bearing nodes
    exp11 = sorted((v, c, sizes[c]) for v, c in label.items())
    got11 = sorted(
        (int(r.vec_id), int(r.cluster_id), int(r.cluster_sz))
        for r in read(con, f"{out_dir}/s11_knn_components").itertuples())
    if exp11 != got11:
        bad += 1
        print(f"FAIL s11: {len(got11)} rows vs expected {len(exp11)}; "
              f"first diff {next((g, e) for g, e in zip(got11, exp11) if g != e)}")
    else:
        print(f"ok   s11_knn_components ({len(got11)} rows, union-find)")

    # norms for the labeled vectors: sequential double fold, the same
    # cast-then-accumulate order as both engines' dot kernels
    emb_path = f"{sf_dir}/embeddings.parquet"
    emb = read(con, emb_path)
    norm_e6 = {}
    for r in emb.itertuples():
        v = int(r.vec_id)
        if v not in label:
            continue
        acc = 0.0
        for x in r.embedding:
            xf = float(x)
            acc += xf * xf
        norm_e6[v] = math.floor(math.sqrt(acc) * 1000000)

    # s12: per cluster, the max-norm member (tie: min vec_id)
    reps = {}
    for v, c in sorted(label.items()):
        n = norm_e6[v]
        if c not in reps or n > reps[c][1]:
            reps[c] = (v, n)
    exp12 = sorted((c, rv, sizes[c], rn) for c, (rv, rn) in reps.items())
    got12 = sorted(
        (int(r.cluster_id), int(r.rep_vec_id), int(r.cluster_sz),
         int(r.rep_norm_e6))
        for r in read(con, f"{out_dir}/s12_semantic_reps").itertuples())
    if exp12 != got12:
        bad += 1
        print(f"FAIL s12: {len(got12)} rows vs expected {len(exp12)}; "
              f"first diff {next((g, e) for g, e in zip(got12, exp12) if g != e)}")
    else:
        print(f"ok   s12_semantic_reps ({len(got12)} rows, union-find)")

    # s15: internal vs escaping DIRECTED s09 edges per component
    g09 = read(con, f"{out_dir}/s09_knn_graph")[["vec_id", "neighbor_id"]]
    internal, escape = {}, {}
    for a, b in g09.itertuples(index=False):
        ca = label.get(int(a))
        if ca is None:
            continue
        if label.get(int(b)) == ca:
            internal[ca] = internal.get(ca, 0) + 1
        else:
            escape[ca] = escape.get(ca, 0) + 1
    exp15 = []
    for c in sorted(sizes):
        i, e = internal.get(c, 0), escape.get(c, 0)
        e6 = 0 if i + e == 0 else (1000000 * e) // (i + e)
        exp15.append((c, sizes[c], i, e, e6))
    got15 = sorted(
        (int(r.cluster_id), int(r.cluster_sz), int(r.internal_edges),
         int(r.escape_edges), int(r.escape_e6))
        for r in read(con, f"{out_dir}/s15_cluster_quality").itertuples())
    if exp15 != got15:
        bad += 1
        print(f"FAIL s15: {len(got15)} rows vs expected {len(exp15)}; "
              f"first diff {next((g, e) for g, e in zip(got15, exp15) if g != e)}")
    else:
        print(f"ok   s15_cluster_quality ({len(got15)} rows, union-find)")

    print(f"== {3 - bad} ok, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
