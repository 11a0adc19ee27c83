#!/usr/bin/env python3
"""Large-scale cross-check for the dedup CLUSTER-family queries
(d06/d09/m07 clusters, d10 keep-best, x24 soft-dedup audit).

The driver-faithful oracles compute connected components with a
recursive transitive-closure CTE — fine at the graded sf0.01 gate,
but at the ×30 local dir each recursion pins a 20 GB DuckDB process
for 15+ minutes (d06/d09/m07 were the round-13 census tail; d10/x24
embed the SAME recursion inside their keep rules, measured stuck at
20+ min in the round-14 sweep). Same infeasibility class, same remedy
as tools/cc_check.py (s11/s12/s15): union-find over an edge list that
is ITSELF hash-verified at the same scale:

  * d06 clusters + x24's soft-dedup audit over d03_dedup_minhash_lsh
    pairs (DuckDB-direct green at ×30: 7,683 rows),
  * d09 clusters + d10 keep-best over d08_neardup_bucketed pairs
    (green: 32,623),
  * m07 clusters over m04_ahash_neardup pairs (green: 1,004,411);
  * min-id representatives reproduce the labels the recursive
    `least(src, min(dst))` oracle converges to (the cc_check
    precedent, validated against the recursive oracle at sf0.01);
  * d10's rep norm replays float_dot exactly: a left-fold DOUBLE
    accumulation of double(f32)·double(f32) per element, then
    floor(sqrt·1e6) (FloatVecDot.scala:32-43);
  * x24's keep decision is the salted rolling hash (base 31, seed 7,
    'softdedup:'++lower(text), mod P2=998244353) — exact integers,
    the t31_check hashing pattern.

This is local scale evidence only — the driver's gate remains the
recursive DuckDB oracle at sf0.01, where it runs comfortably.

Usage: python3 tools/dup_cc_check.py <sfDir> <verifyOutDir>
"""
import math
import os
import sys

import duckdb

P2 = 998244353  # TextHash.P2
SALT = "softdedup:"  # DupCluster.SoftDedupSalt


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


def labels_of(con, out_dir, edges_name):
    edges = read(con, f"{out_dir}/{edges_name}")[["ida", "idb"]]
    uf = UF()
    for a, b in edges.itertuples(index=False):
        uf.union(int(a), int(b))
    label = {v: uf.find(v) for v in uf.p}
    sizes = {}
    for c in label.values():
        sizes[c] = sizes.get(c, 0) + 1
    return label, sizes, len(edges)


def check_clusters(con, out_dir, name, label, sizes, n_edges,
                   edges_name, id_col):
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
          f"{n_edges} {edges_name} edges)")
    return 1


def check_d10(con, sf_dir, out_dir, label, sizes):
    """Keep-best per embedding cluster: max norm_e6, tie min vec_id."""
    e = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(e):
        e = f"{e}/*.parquet"
    emb = con.sql(f"SELECT vec_id, embedding FROM read_parquet('{e}')").df()
    best = {}
    for r in emb.itertuples(index=False):
        v = int(r.vec_id)
        if v not in label:
            continue  # clusters cover edge-bearing vectors only
        acc = 0.0  # float_dot's left-fold double accumulation
        for x in r.embedding:
            xd = float(x)
            acc += xd * xd
        ne6 = math.floor(math.sqrt(acc) * 1000000)
        c = label[v]
        # keep rule: norm desc, vec_id asc
        if c not in best or (-ne6, v) < (-best[c][1], best[c][0]):
            best[c] = (v, ne6)
    exp = sorted((c, v, sizes[c], ne6) for c, (v, ne6) in best.items())
    got = sorted(
        (int(r.cluster_id), int(r.rep_vec_id), int(r.cluster_sz),
         int(r.rep_norm_e6))
        for r in read(con, f"{out_dir}/d10_keep_best_embedding")
        .itertuples())
    if exp != got:
        diff = next(((g, e) for g, e in zip(got, exp) if g != e),
                    ("len", (len(got), len(exp))))
        print(f"FAIL d10_keep_best_embedding: {len(got)} rows vs "
              f"{len(exp)}; first diff {diff}")
        return 0
    print(f"ok   d10_keep_best_embedding ({len(got)} rows, "
          "float_dot-exact norms)")
    return 1


def check_x24(con, sf_dir, out_dir, label, sizes):
    """Soft-dedup audit: salted-hash keep over d06's clusters."""
    d = f"{sf_dir}/documents.parquet"
    if os.path.isdir(d):
        d = f"{d}/*.parquet"
    rh = ("list_reduce(list_prepend(7::BIGINT, "
          "[ascii(s[j])::BIGINT for j in generate_series(1, length(s))]), "
          f"(a, x) -> (a * 31 + x) % {P2})")
    docs = con.sql(f"""
      SELECT doc_id, {rh} AS h
      FROM (SELECT doc_id, '{SALT}' || lower(text) AS s
            FROM read_parquet('{d}'))""").df()
    agg = {}  # cluster_sz -> [n_docs, set(cid), n_kept]
    for r in docs.itertuples(index=False):
        did, h = int(r.doc_id), int(r.h)
        cid = label.get(did, did)
        sz = sizes.get(cid, 1)
        a = agg.setdefault(sz, [0, set(), 0])
        a[0] += 1
        a[1].add(cid)
        if (h % 1000000) * sz < 1000000:
            a[2] += 1
    exp = sorted((sz, n, len(cids), k, 1000000 * k // n)
                 for sz, (n, cids, k) in agg.items())
    got = sorted(
        (int(r.cluster_sz), int(r.n_docs), int(r.n_clusters),
         int(r.n_kept), int(r.keep_rate_e6))
        for r in read(con, f"{out_dir}/x24_soft_dedup").itertuples())
    if exp != got:
        print(f"FAIL x24_soft_dedup: got {got} vs exp {exp}")
        return 0
    print(f"ok   x24_soft_dedup ({len(got)} size buckets over "
          f"{len(docs)} docs, exact salted-hash keeps)")
    return 1


def main(sf_dir, out_dir):
    con = duckdb.connect()
    ok = 0
    l03, s03, n03 = labels_of(con, out_dir, "d03_dedup_minhash_lsh")
    l08, s08, n08 = labels_of(con, out_dir, "d08_neardup_bucketed")
    l04, s04, n04 = labels_of(con, out_dir, "m04_ahash_neardup")
    ok += check_clusters(con, out_dir, "d06_dup_clusters",
                         l03, s03, n03, "d03_dedup_minhash_lsh", "doc_id")
    ok += check_clusters(con, out_dir, "d09_embedding_clusters",
                         l08, s08, n08, "d08_neardup_bucketed", "vec_id")
    ok += check_clusters(con, out_dir, "m07_ahash_clusters",
                         l04, s04, n04, "m04_ahash_neardup", "doc_id")
    ok += check_d10(con, sf_dir, out_dir, l08, s08)
    ok += check_x24(con, sf_dir, out_dir, l03, s03)
    print(f"== {ok} ok, {5 - ok} fail ==")
    return 0 if ok == 5 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
