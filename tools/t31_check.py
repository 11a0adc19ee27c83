#!/usr/bin/env python3
"""sf1-scale cross-check for t31 (exact source-pair Jaccard) and t32
(its MinHash sketch estimate) — the cc_check.py pattern.

The graded gate runs both DuckDB oracles at sf0.01. At the sf1
equivalent the t31 oracle's hash SELF-JOIN is infeasible in
single-node DuckDB (measured >60 GB of spill before being killed —
itself the argument for the Spark engine's distributed shuffle), so
this replica avoids the join entirely: DuckDB computes the per-source
DISTINCT shingle-hash sets in ONE linear pass (the same tokenize →
5-gram shingle → rolling-hash formulas as the oracle, list
comprehensions only), then numpy does the 190-pair set algebra
(intersect1d) and the k=32 affine-MinHash component mins — integer
math identical to both engines.

Usage: python3 tools/t31_check.py <sfDir> <verifyOutDir>
  verifyOutDir must hold t31_source_similarity/ and t32_source_minhash/
"""
import os
import shutil
import sys

import duckdb
import numpy as np

P = 1000000007
K = 32
SPILL = "/tmp/t31_spill"


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    os.makedirs(SPILL, exist_ok=True)
    con.execute(f"SET temp_directory='{SPILL}'")
    d = f"{sf_dir}/documents.parquet"
    if os.path.isdir(d):
        d = f"{d}/*.parquet"
    rh = ("CASE WHEN length(s) >= 1 THEN list_reduce(list_prepend(7::BIGINT, "
          "[ascii(s[j])::BIGINT for j in generate_series(1, length(s))]), "
          f"(a, x) -> (a * 31 + x) % {P}) ELSE 7::BIGINT END")
    # one linear pass: distinct (source, shingle-hash) — no join; a
    # temp parquet keeps the per-source fetches out of pandas
    sp_pq = f"{SPILL}/sp.parquet"
    con.execute(f"""
      COPY (
      WITH tk AS (SELECT doc_id, source,
                    string_split_regex(lower(text), '\\s+') AS tk
                  FROM read_parquet('{d}')),
      sh AS (SELECT doc_id, source, CASE WHEN len(tk) >= 5 THEN list_distinct(
               [array_to_string(tk[i:i+4], ' ')
                for i in generate_series(1, len(tk)-4)])
               ELSE [] END AS shs FROM tk)
      SELECT DISTINCT source, {rh} AS h
      FROM (SELECT source, unnest(shs) AS s FROM sh)
      ) TO '{sp_pq}' (FORMAT PARQUET)""")
    srcs = [r[0] for r in con.execute(
        f"SELECT DISTINCT source FROM read_parquet('{sp_pq}') ORDER BY 1"
    ).fetchall()]
    sets = {}
    for s in srcs:
        arr = con.execute(
            f"SELECT h FROM read_parquet('{sp_pq}') WHERE source = ?",
            [s]).fetchnumpy()["h"]
        sets[s] = np.sort(np.asarray(arr, dtype=np.int64))

    # t31 exact: inclusion-exclusion over numpy set intersections
    exp31 = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = int(np.intersect1d(
                sets[a], sets[b], assume_unique=True).size)
            if inter >= 1:
                union = int(sets[a].size + sets[b].size - inter)
                exp31.append((a, b, inter, union, 1000000 * inter // union))
    got31 = sorted(
        (r.source_a, r.source_b, int(r.inter), int(r.union_sz),
         int(r.jac_e6))
        for r in read(con, f"{out_dir}/t31_source_similarity").itertuples())
    ok = 0
    if got31 != sorted(exp31):
        diff = next((g, e) for g, e in zip(got31, sorted(exp31)) if g != e)
        print(f"FAIL t31: {len(got31)} rows vs {len(exp31)}; first diff {diff}")
    else:
        print(f"ok   t31_source_similarity ({len(got31)} rows, numpy sets)")
        ok += 1

    # t32 sketch: component-wise min of the affine family over each set
    # per-component loop keeps the temp at one |set| array (the outer-
    # product form would hold K of them at once — GBs at sf1)
    sig = {s: np.array([int(np.min(((2 * i + 1) * sets[s]
                                    + 7919 * (i + 1)) % P))
                        for i in range(K)], dtype=np.int64)
           for s in srcs}
    exp32 = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            m = int((sig[a] == sig[b]).sum())
            exp32.append((a, b, m, 1000000 * m // K))
    got32 = sorted(
        (r.source_a, r.source_b, int(r.match_k), int(r.est_jac_e6))
        for r in read(con, f"{out_dir}/t32_source_minhash").itertuples())
    if got32 != sorted(exp32):
        diff = next((g, e) for g, e in zip(got32, sorted(exp32)) if g != e)
        print(f"FAIL t32: {len(got32)} rows vs {len(exp32)}; first diff {diff}")
    else:
        print(f"ok   t32_source_minhash ({len(got32)} rows, numpy minhash)")
        ok += 1

    shutil.rmtree(SPILL, ignore_errors=True)
    print(f"== {ok} ok, {2 - ok} fail ==")
    return 0 if ok == 2 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
