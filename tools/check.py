#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev-only, not part
of the Scala library): reads the parquet results written by
`graft.Verify` and compares each against its DuckDB oracle.

Driver-faithful comparison path (round-6 fix): both sides are fetched
through pandas (`.df()`), sorted by every column, and hashed over the
stringified cell values. This reproduces the two failure classes the
older fetchall() path silently masked:

  * array/struct-typed cells make pandas `sort_values` raise
    TypeError (unhashable numpy.ndarray) — gated outputs must be
    scalar-only, so such a column is an outright FAIL here;
  * DuckDB HUGEINT (e.g. sum(BIGINT), window sums) renders as
    float64 in pandas → str() gives '123.0' while Spark's int64
    gives '123' — a hash mismatch on numerically equal values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import hashlib
import json
import os
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort a pandas frame the way the driver does and hash its cells.

    Returns (sorted_columns, n_rows, hexdigest). Raises on non-scalar
    cells (arrays/structs/maps) — those can never pass the driver gate.
    """
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype == object:
            # probe the WHOLE column (not a head sample): a late
            # non-scalar cell must fail with this message, not a
            # generic sort/hash error
            bad = df[c].dropna().map(
                lambda v: type(v).__name__
                if isinstance(v, (list, tuple, dict, set, np.ndarray))
                else None).dropna()
            if len(bad):
                raise TypeError(
                    f"column '{c}' holds non-scalar cells "
                    f"({bad.iloc[0]}); gated outputs must be scalar-only")
    df = df.sort_values(cols).reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        # length-prefix each cell so a '|' or newline inside a string
        # cell can't shift boundaries and hash two different frames
        # equal (false-PASS channel)
        for v in row:
            s = str(v)
            h.update(f"{len(s)}:".encode())
            h.update(s.encode())
        h.update(b"\n")
    return cols, len(df), h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # An in-memory DuckDB connection has no temp directory, so a
    # memory-hungry oracle (the cosine self-joins at the sf1-equivalent)
    # GROWS UNBOUNDED instead of spilling — measured 103 GB RSS before
    # strangling the host. Cap it and give it a spill path; the graded
    # sf0.01 gate never comes near the cap.
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        # driver testdata is one file per table; Spark-written datasets
        # (e.g. the ScaleUp sf1-equivalent) are directories of parts
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_df = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp_df = con.sql(sql).df()
            got_cols, got_n, got_h = canon(got_df)
            exp_cols, exp_n, exp_h = canon(exp_df)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs oracle {exp_cols}")
            n_bad += 1
        elif got_n != exp_n:
            print(f"FAIL {name}: rows {got_n} vs {exp_n}")
            n_bad += 1
        elif got_h != exp_h:
            n_bad += 1
            print(f"FAIL {name}: hash mismatch over {got_n} rows")
            gs = got_df[got_cols].sort_values(got_cols).reset_index(drop=True)
            es = exp_df[exp_cols].sort_values(exp_cols).reset_index(drop=True)
            for i in range(got_n):
                g = tuple(str(v) for v in gs.iloc[i])
                e = tuple(str(v) for v in es.iloc[i])
                if g != e:
                    print(f"  first diff at {i}: got={g} exp={e}")
                    print(f"  dtypes: got={list(gs.dtypes)} exp={list(es.dtypes)}")
                    break
        else:
            n_ok += 1
            print(f"ok   {name} ({got_n} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
