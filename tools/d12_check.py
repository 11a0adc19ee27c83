#!/usr/bin/env python3
"""Large-scale cross-check for d12 (asymmetric containment dedup).

The driver-faithful d12 oracle self-joins the exploded shingle-hash
postings inside DuckDB — at the ×30 local dir that join pins a 20 GB
DuckDB process for 15+ minutes (the last non-CC entry of the round-13
census tail; the CC trio has tools/dup_cc_check.py). Here the
corpus-scale work stays a LINEAR DuckDB pass (per-document distinct
shingle hashes, the tools/t31_check.py pattern), and the join is
replaced by the capped-postings walk itself: group postings by hash,
drop hashes with df > JaccardDfCap (=64, the engine's stop-shingle
rule), emit each surviving hash group's C(n,2) pairs into a dict of
common counts — ~Σ C(df,2) increments, measured linear in the corpus
under the cap — then apply the per-direction exact-integer threshold
5·common ≥ 4·n_contained, where n_sh is the document's DISTINCT
shingle count (pre-cap, matching the engine and oracle).

This is local scale evidence only — the driver's gate remains the
self-join DuckDB oracle at sf0.01, where it runs comfortably.

Usage: python3 tools/d12_check.py <sfDir> <verifyOutDir>
"""
import os
import shutil
import sys

import duckdb

P = 1000000007
DF_CAP = 64  # Dedup.JaccardDfCap
SPILL = "/tmp/d12_spill"


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
    # one linear pass: per-doc distinct 5-gram shingles → n_sh (the
    # PRE-cap distinct-shingle count the threshold divides by) and the
    # distinct-hash postings, spilled to parquet
    hv_pq = f"{SPILL}/hv.parquet"
    con.execute(f"""
      COPY (
      WITH tk AS (SELECT doc_id,
                    string_split_regex(lower(text), '\\s+') AS tk
                  FROM read_parquet('{d}')),
      sh AS (SELECT doc_id, CASE WHEN len(tk) >= 5 THEN list_distinct(
               [array_to_string(tk[i:i+4], ' ')
                for i in generate_series(1, len(tk)-4)])
               ELSE [] END AS shs FROM tk),
      hv AS (SELECT doc_id, len(shs) AS n_sh,
               list_distinct([{rh} for s in shs]) AS hv FROM sh)
      SELECT doc_id, n_sh, unnest(hv) AS h FROM hv
      ) TO '{hv_pq}' (FORMAT PARQUET)""")
    n_sh = {int(r.doc_id): int(r.n_sh) for r in con.execute(
        f"SELECT DISTINCT doc_id, n_sh FROM read_parquet('{hv_pq}')"
    ).df().itertuples()}
    # capped postings, grouped per hash (df ≤ cap keeps each group's
    # pair fan-out bounded: Σ C(df,2) stays corpus-linear)
    groups = con.execute(f"""
      SELECT list(doc_id ORDER BY doc_id) AS ds
      FROM read_parquet('{hv_pq}')
      GROUP BY h HAVING count(*) BETWEEN 2 AND {DF_CAP}""").df()["ds"]
    common = {}
    for ds in groups:
        ds = [int(x) for x in ds]
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                k = (a, b)
                common[k] = common.get(k, 0) + 1
    exp = []
    for (a, b), c in common.items():
        if 5 * c >= 4 * n_sh[a]:
            exp.append((a, b, c, n_sh[a]))
        if 5 * c >= 4 * n_sh[b]:
            exp.append((b, a, c, n_sh[b]))
    got = sorted(
        (int(r.contained_id), int(r.container_id), int(r.common),
         int(r.n_contained))
        for r in read(con, f"{out_dir}/d12_dedup_containment").itertuples())
    ok = 0
    if got != sorted(exp):
        diff = next(((g, e) for g, e in zip(got, sorted(exp)) if g != e),
                    ("len", (len(got), len(exp))))
        print(f"FAIL d12: {len(got)} rows vs {len(exp)}; first diff {diff}")
    else:
        print(f"ok   d12_dedup_containment ({len(got)} rows, "
              f"{len(common)} candidate pairs walked)")
        ok += 1
    shutil.rmtree(SPILL, ignore_errors=True)
    print(f"== {ok} ok, {1 - ok} fail ==")
    return 0 if ok == 1 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
