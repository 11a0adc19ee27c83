#!/usr/bin/env python3
"""sf1-scale cross-check for d21 (SemDeDup).

The driver-faithful oracle re-derives the 2-round Lloyd assignment
and then scores every within-cluster pair with an interpreted
list_reduce cosine. At the graded sf0.01 gate that is ~16k pairs; at
the local sf1-equivalent the fixed-K pair budget is ~25M pairs of
64-dim interpreted folds — hours in single-node DuckDB (the same
cost class that made the CC recursion and the t31 hash self-join
infeasible there), while Spark's codegen'd float_dot finishes in
seconds. So at sf1 d21 is cross-checked with numpy:

  * the Lloyd chain (e6-floored components, integer argmin distances
    with ties -> smallest bucket, floor(sum/n) means, empty-cluster
    carry) is EXACT int64 arithmetic — replicated bit-for-bit;
  * pair cosines use numpy float64 matmul, mathematically the same
    sum as the engines' sequential fold but in a different
    association order (error ~1e-13 relative), so the comparison is
    exact on (vec_id, bucket, dup_of, n_dups) and allows |delta| <= 1
    on the e6-floored max cosine.

This is local scale evidence only — the driver's gate remains the
DuckDB oracle at sf0.01, where it runs comfortably.

Usage: python3 tools/d21_check.py <sfDir> <verifyOutDir>
"""
import os
import sys

import duckdb
import numpy as np

K_MIN = 8        # Similarity.KmeansK (the clamp floor)
K_MAX = 16384    # Similarity.KmeansKMax
ROUNDS = 2
TAU = 0.4
CHUNK_TARGET = 256  # Similarity.SemDedupChunkTarget (also the K width)
P = 1000000007


def k_of(n):
    """Data-derived K, round 12: ceil(n / width) clamped — must match
    Similarity.lloydState's kRow and the oracle's kz CTE exactly."""
    return max(K_MIN, min(K_MAX, (n + CHUNK_TARGET - 1) // CHUNK_TARGET))


def read(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    ep = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(ep):  # ScaleUp writes Spark parquet directories
        ep = f"{ep}/*.parquet"
    emb = con.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{ep}') "
        f"ORDER BY vec_id"
    ).df()
    ids = emb["vec_id"].to_numpy()
    # the chunk rule below uses numpy %, which is always non-negative,
    # while Spark and DuckDB % preserve the dividend's sign — the three
    # implementations diverge on a negative vec_id, so make the
    # assumption explicit instead of silently mismatching
    assert len(ids) == 0 or ids.min() >= 0, \
        f"negative vec_id {ids.min()}: numpy %% != Spark/DuckDB %% here"
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    X = np.floor(V.astype(np.float64) * 1e6).astype(np.int64)

    # Lloyd: init = rows with vec_id < K, bucket label = vec_id (the
    # engines' rule — NOT positional X[:K], which diverges whenever
    # vec_ids are not dense 0-based); integer argmin d2 (ties ->
    # smallest bucket), floor(sum/n) means, empty clusters carry the
    # previous centroid
    K = k_of(len(ids))
    init = np.where(ids < K)[0]
    blist = [int(v) for v in sorted(ids[init])]
    cents = {int(ids[i]): X[i].copy() for i in init}
    asg = None
    for _ in range(ROUNDS):
        # d2 in exact int64: max |x| ~ 2e6 -> 64 * (4e6)^2 ~ 1e15, safe
        d2 = np.zeros((len(X), len(blist)), dtype=np.int64)
        for bi, b in enumerate(blist):
            diff = X - cents[b]
            d2[:, bi] = np.einsum("ij,ij->i", diff, diff)
        # argmin ties -> lowest index = smallest bucket (blist sorted)
        asg = np.array([blist[i] for i in np.argmin(d2, axis=1)])
        for b in blist:
            m = X[asg == b]
            if len(m):
                cents[b] = np.floor_divide(m.sum(axis=0), len(m))

    # within-cluster cosine evictions
    nrm = np.sqrt(np.einsum("ij,ij->i", V.astype(np.float64),
                            V.astype(np.float64)))
    expected = {}
    for b in blist:
        bsel = np.where(asg == b)[0]
        if len(bsel) < 2:
            continue
        # hash-assigned sub-chunks of ~CHUNK_TARGET members: same LCG
        # arithmetic as both engines, pairs within a chunk only
        n_chunks = (len(bsel) + CHUNK_TARGET - 1) // CHUNK_TARGET
        chunks = ((ids[bsel].astype(np.int64) % P) * 2654435761) % P \
            % n_chunks
        for ck in np.unique(chunks):
            sel = bsel[chunks == ck]
            sel = sel[np.argsort(ids[sel])]
            if len(sel) < 2:
                continue
            Vs = V[sel].astype(np.float64)
            cs = (Vs @ Vs.T) / np.outer(nrm[sel], nrm[sel])
            iu, ju = np.triu_indices(len(sel), 1)
            hit = cs[iu, ju] >= TAU
            for i, j, c in zip(iu[hit], ju[hit], cs[iu, ju][hit]):
                vid = int(ids[sel[j]])
                ida = int(ids[sel[i]])
                e6 = int(np.floor(c * 1e6))
                cur = expected.get(vid)
                if cur is None:
                    expected[vid] = [int(b), ida, 1, e6]
                else:
                    cur[1] = min(cur[1], ida)
                    cur[2] += 1
                    cur[3] = max(cur[3], e6)

    got = read(con, os.path.join(out_dir, "d21_semantic_dedup"))
    ok = True
    if len(got) != len(expected):
        print(f"FAIL d21: {len(got)} rows vs replica {len(expected)}")
        ok = False
    near = 0
    for r in got.itertuples():
        exp = expected.get(int(r.vec_id))
        if exp is None:
            print(f"FAIL d21: unexpected eviction vec_id={r.vec_id}")
            ok = False
            break
        b, dup_of, n, e6 = exp
        if (int(r.bucket), int(r.dup_of), int(r.n_dups)) != (b, dup_of, n):
            print(f"FAIL d21: vec_id={r.vec_id} "
                  f"({r.bucket},{r.dup_of},{r.n_dups}) != ({b},{dup_of},{n})")
            ok = False
            break
        if abs(int(r.max_cs_e6) - e6) > 1:  # matmul-order float slack
            print(f"FAIL d21: vec_id={r.vec_id} max_cs_e6 {r.max_cs_e6} "
                  f"vs replica {e6}")
            ok = False
            break
        if int(r.max_cs_e6) != e6:
            near += 1
    if ok:
        print(f"ok   d21 ({len(got)} evictions, {near} cs_e6 within "
              f"the documented +-1 float-order slack)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
