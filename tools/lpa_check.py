#!/usr/bin/env python3
"""sf1-scale cross-check for s25 label propagation (cc_check pattern).

The graded gate runs the unrolled 3-round LPA oracle in DuckDB at
sf0.01; at the sf1-equivalent the mutualKnnCtes chain re-derives the
whole candidate generation, so instead this replica — like cc_check
for s11 and pr_check for s22 — reruns the exact integer algorithm in
pure Python over an edge list that is ITSELF verified at sf1 (the
s10 dump, whose oracle hash-matches there):

    lab0(v)  = v                         (edge-bearing vertices)
    lab'(v)  = argmax by (count, -label) over neighbor labels
               (most frequent neighbor label, ties -> smallest)
    3 synchronous rounds; comm_n = final-label community size.

Usage: python3 tools/lpa_check.py <verifyOutDir>
  verifyOutDir must hold s10_mutual_knn/ and s25_label_propagation/
"""
import os
import sys
from collections import Counter, defaultdict

import duckdb


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main(out_dir):
    con = duckdb.connect()
    m = read(con, f"{out_dir}/s10_mutual_knn")[["ida", "idb"]]
    nbrs = defaultdict(list)
    for a, b in m.itertuples(index=False):
        nbrs[int(a)].append(int(b))
        nbrs[int(b)].append(int(a))
    lab = {v: v for v in nbrs}
    for _ in range(3):
        nxt = {}
        for v, ns in nbrs.items():
            c = Counter(lab[u] for u in ns)
            # max count, then smallest label
            nxt[v] = min(c, key=lambda l: (-c[l], l))
        lab = nxt
    sz = Counter(lab.values())
    exp = sorted((v, lab[v], sz[lab[v]]) for v in nbrs)
    got = sorted(
        (int(r.vec_id), int(r.comm), int(r.comm_n))
        for r in read(con, f"{out_dir}/s25_label_propagation").itertuples())
    if exp != got:
        diff = next((g, e) for g, e in zip(got, exp) if g != e)
        print(f"FAIL s25: {len(got)} rows vs {len(exp)}; first diff {diff}")
        print("== 0 ok, 1 fail ==")
        return 1
    print(f"ok   s25_label_propagation ({len(got)} rows, pure-python LPA)")
    print("== 1 ok, 0 fail ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
