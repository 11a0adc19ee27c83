#!/usr/bin/env python3
"""Large-scale cross-check for the dedup CLUSTER queries (d06/d09/m07).

The driver-faithful oracles compute connected components with a
recursive transitive-closure CTE — fine at the graded sf0.01 gate,
but at the ×30 local dir each recursion pins a 20 GB DuckDB process
for 15+ minutes (the d06/d09/m07 entries were the last hours-class
tail of the round-13 census drive). Same infeasibility class, same
remedy as tools/cc_check.py (s11/s12/s15): replace the recursion
with union-find over an edge list that is ITSELF hash-verified at
the same scale:

  * d06 clusters over d03_dedup_minhash_lsh pairs (DuckDB-direct
    green at ×30: 7,683 rows),
  * d09 clusters over d08_neardup_bucketed pairs (green: 32,623),
  * m07 clusters over m04_ahash_neardup pairs (green: 1,004,411);
  * min-id representatives reproduce the labels the recursive
    `least(src, min(dst))` oracle converges to (the cc_check
    precedent, validated against the recursive oracle at sf0.01).

This is local scale evidence only — the driver's gate remains the
recursive DuckDB oracle at sf0.01, where it runs comfortably.

Usage: python3 tools/dup_cc_check.py <sfDir> <verifyOutDir>
"""
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


def check_one(con, out_dir, name, edges_name, id_col):
    edges = read(con, f"{out_dir}/{edges_name}")[["ida", "idb"]]
    uf = UF()
    for a, b in edges.itertuples(index=False):
        uf.union(int(a), int(b))
    label = {v: uf.find(v) for v in uf.p}
    sizes = {}
    for c in label.values():
        sizes[c] = sizes.get(c, 0) + 1
    exp = sorted((v, c, sizes[c]) for v, c in label.items())
    got = sorted(
        (int(getattr(r, id_col)), int(r.cluster_id), int(r.cluster_sz))
        for r in read(con, f"{out_dir}/{name}").itertuples())
    if exp != got:
        diff = next(((g, e) for g, e in zip(got, exp) if g != e),
                    ("len", (len(got), len(exp))))
        print(f"FAIL {name}: {len(got)} rows vs {len(exp)}; "
              f"first diff {diff}")
        return 0
    print(f"ok   {name} ({len(got)} rows, union-find over "
          f"{len(edges)} {edges_name} edges)")
    return 1


def main(sf_dir, out_dir):
    con = duckdb.connect()
    ok = 0
    ok += check_one(con, out_dir, "d06_dup_clusters",
                    "d03_dedup_minhash_lsh", "doc_id")
    ok += check_one(con, out_dir, "d09_embedding_clusters",
                    "d08_neardup_bucketed", "vec_id")
    ok += check_one(con, out_dir, "m07_ahash_clusters",
                    "m04_ahash_neardup", "doc_id")
    print(f"== {ok} ok, {3 - ok} fail ==")
    return 0 if ok == 3 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
