#!/usr/bin/env python3
"""Independent closure of the classifier chain (t36 / t37 / x33) at
scale dirs where the unrolled 16-round DuckDB oracle exhausts
single-node memory (the d21_check / t31_check pattern: a pure
numpy/python replica built from the documented rules, no Spark and no
shared SQL).

Replicates from first principles:
  * tokenize (whitespace split of lowercase, trailing-empty kept),
    unigram+bigram rolling hashes (base 31, seed 7, mod P), bucket
    mod 4096, the always-on bias bucket 4096;
  * the t02 quality rule as the distillation label;
  * 16 class-stratified hard-example perceptron rounds (128 most-
    misclassified per class, ties by doc_id) — t36's weights must
    match EXACTLY;
  * the 80/20 LCG fold and the t37 confusion rollup — must match
    EXACTLY;
  * x33's keep rule (margin > 0 under the full-corpus weights): the
    emitted doc set must equal keep ∩ {docs with >= 1 kept token},
    where kept-token presence comes from the d20 oracle (n_toks -
    n_covered > 0), which closes DuckDB-direct at these dirs; plus
    the x30 shard-key rule, gapless per-shard tiling, and the
    bin arithmetic on x33's own rows.

Usage: python3 tools/cls_check.py <sfDir> <verifyOutDir>
Expects <verifyOutDir>/{t36_classifier_train,t37_classifier_eval,
x33_assembly_trained}/*.parquet (any subset) and oracle_sql.json
(for the d20 oracle text when x33 is present).
"""
import json
import os
import sys
from collections import defaultdict

import duckdb
import numpy as np

P = 1000000007
B = 4096
BIAS = 4096
ROUNDS = 16
HARD_K = 128
EVAL_FOLDS = 5
MIN_CHARS, MIN_TOKS, MAX_PUNCT_E6, MIN_TTR_E6 = 100, 20, 100000, 150000


def rh(s):
    a = 7
    for ch in s:
        a = (a * 31 + ord(ch)) % P
    return a


def featurize(text):
    # Spark split(lower(text), "\\s+") keeps trailing empties — re.split
    # matches that behavior
    import re as _re
    t = text.lower()
    tk = _re.split(r"\s+", t)
    fts = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
    tf = defaultdict(int)
    for f in fts:
        tf[rh(f) % B] += 1
    tf[BIAS] += 1
    return tk, tf


def quality_label(text, tk):
    t = text.lower()
    n_chars = len(t)
    n_punct = sum(1 for c in t
                  if not (c.isspace() or "a" <= c <= "z" or "0" <= c <= "9"))
    punct_e6 = int(np.floor(n_punct / n_chars * 1e6)) if n_chars else 0
    ttr_e6 = int(np.floor(len(set(tk)) / len(tk) * 1e6)) if tk else 0
    ok = (n_chars >= MIN_CHARS and len(tk) >= MIN_TOKS and
          punct_e6 < MAX_PUNCT_E6 and ttr_e6 > MIN_TTR_E6)
    return 1 if ok else -1


def train(docs):
    """docs: list of (doc_id, y, tf-dict). Returns weights array."""
    ids = np.array([d[0] for d in docs], dtype=np.int64)
    ys = np.array([d[1] for d in docs], dtype=np.int64)
    # sparse-ish margin evaluation via bucket lists
    bl = [np.array(sorted(d[2].keys()), dtype=np.int64) for d in docs]
    tl = [np.array([d[2][b] for b in bs], dtype=np.int64)
          for d, bs in zip(docs, bl)]
    w = np.zeros(B + 1, dtype=np.int64)
    for _ in range(ROUNDS):
        m = np.array([int((w[bs] * ts).sum()) for bs, ts in zip(bl, tl)],
                     dtype=np.int64)
        ym = ys * m
        dw = np.zeros(B + 1, dtype=np.int64)
        for cls in (1, -1):
            cm = (ys == cls) & (ym <= 0)
            if not cm.any():
                continue
            order = np.lexsort((ids[cm], ym[cm]))
            for i in np.where(cm)[0][order[:HARD_K]]:
                dw[bl[i]] += ys[i] * tl[i]
        w = w + dw
    return w


def margins(docs, w):
    return {d[0]: int(sum(w[b] * n for b, n in d[2].items())) for d in docs}


def read_parq(con, path):
    p = f"{path}/*.parquet" if os.path.isdir(path) else path
    return con.sql(f"SELECT * FROM read_parquet('{p}')").df()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET memory_limit='20GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    dp = f"{sf_dir}/documents.parquet"
    dp = f"{dp}/*.parquet" if os.path.isdir(dp) else dp
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{dp}')")
    raw = con.sql(
        "SELECT doc_id, source, text FROM documents ORDER BY doc_id").df()
    # Python % is always non-negative while Spark/DuckDB % keep the
    # dividend's sign — the holdout fold below would silently diverge
    # on a negative doc_id (the d21_check.py guard, mirrored here)
    assert int(raw.doc_id.min()) >= 0, \
        f"negative doc_id {raw.doc_id.min()}: fold arithmetic diverges"
    docs = []
    for did, src, text in zip(raw.doc_id, raw.source, raw.text):
        tk, tf = featurize(text)
        docs.append((int(did), quality_label(text, tk), tf, src))
    fails = 0

    t36p = f"{out_dir}/t36_classifier_train"
    if os.path.exists(t36p):
        got = read_parq(con, t36p).sort_values("bucket")
        w = train([(d, y, tf) for d, y, tf, _ in docs])
        ok = (len(got) == B + 1 and
              (got.w.to_numpy() == w[got.bucket.to_numpy()]).all())
        print(("ok  " if ok else "FAIL") +
              f" t36 weights ({int((w != 0).sum())} nonzero)")
        fails += 0 if ok else 1

    t37p = f"{out_dir}/t37_classifier_eval"
    if os.path.exists(t37p):
        hold = {d: ((d % P) * 2654435761) % P % EVAL_FOLDS == 0
                for d, _, _, _ in docs}
        wtr = train([(d, y, tf) for d, y, tf, _ in docs if not hold[d]])
        mg = margins([(d, y, tf) for d, y, tf, _ in docs], wtr)
        cell = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,keep,tp,fp,fn,tn
        for d, y, tf, src in docs:
            c = cell[(src, 1 if hold[d] else 0)]
            pred = 1 if mg[d] > 0 else -1
            c[0] += 1
            c[1] += pred == 1
            c[2] += y == 1 and pred == 1
            c[3] += y == -1 and pred == 1
            c[4] += y == 1 and pred == -1
            c[5] += y == -1 and pred == -1
        got = read_parq(con, t37p)
        ok = len(got) == len(cell)
        for r in got.itertuples(index=False):
            exp = cell.get((r.source, int(r.holdout)))
            if exp is None or [r.n_docs, r.n_keep, r.tp, r.fp, r.fn,
                               r.tn] != exp:
                ok = False
        print(("ok  " if ok else "FAIL") + f" t37 confusion ({len(got)} cells)")
        fails += 0 if ok else 1

    x33p = f"{out_dir}/x33_assembly_trained"
    if os.path.exists(x33p):
        w = train([(d, y, tf) for d, y, tf, _ in docs])
        mg = margins([(d, y, tf) for d, y, tf, _ in docs], w)
        keep = {d for d, m in mg.items() if m > 0}
        # kept-token presence from the d20 oracle (DuckDB-closed at
        # these dirs): a doc survives the span strip iff
        # n_toks - n_covered > 0. The d20 SQL comes from the out dir's
        # dump, or (when Verify ran a subset that excluded d20) from
        # an optional third argument pointing at a full dump.
        src = sys.argv[3] if len(sys.argv) > 3 else f"{out_dir}/oracle_sql.json"
        sqls = json.load(open(src))
        d20 = con.sql(sqls["d20_substring_rewrite"]).df()
        has_kept = {int(d): (n - c) > 0 for d, n, c in
                    zip(d20.doc_id, d20.n_toks, d20.n_covered)}
        got = read_parq(con, x33p)
        emitted = set(int(d) for d in got.doc_id)
        expect = {d for d in keep if has_kept.get(d, False)}
        ok = emitted == expect
        if not ok:
            print(f"  doc-set diff: extra={sorted(emitted - expect)[:5]} "
                  f"missing={sorted(expect - emitted)[:5]}")
        # internal laws: shard key rule, gapless tiling, bin arithmetic.
        # n_shards re-derives from the kept mass (Curation.ShardBudget
        # = 20000), NOT from max(shard)+1 — a shard can be empty
        total = int(got.n_bpe.sum()) if len(got) else 0
        n_shards = max(1, (total + 19999) // 20000)
        kr = {int(d): rh(f"{int(d)}:1") for d in got.doc_id}
        for r in got.itertuples(index=False):
            if kr[int(r.doc_id)] % n_shards != r.shard:
                ok = False
            if (r.bin_first != r.start_tok // 512 or
                    r.bin_last != (r.start_tok + r.n_bpe - 1) // 512):
                ok = False  # Curation.BpePackBudget = 512
        by_shard = defaultdict(list)
        for r in got.itertuples(index=False):
            by_shard[int(r.shard)].append((int(r.start_tok), int(r.n_bpe)))
        for sh, iv in by_shard.items():
            cur = 0
            for st, n in sorted(iv):
                if st != cur or n < 1:
                    ok = False
                cur = st + n
        print(("ok  " if ok else "FAIL") +
              f" x33 ({len(got)} rows; keep={len(keep)}, "
              f"emitted=keep∩has-kept-tokens)")
        fails += 0 if ok else 1

    print(f"== cls_check {'PASS' if fails == 0 else 'FAIL'} ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
