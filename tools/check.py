#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev-only, not part
of the Scala library): reads the parquet results written by
`graft.Verify` and compares each against its DuckDB oracle.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = norm(con.sql(
                f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = norm(con.execute(
                f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} vs oracle {exp_cols}")
            n_bad += 1
        elif got != exp:
            n_bad += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at {i}: got={g} exp={e}")
                    break
            if len(got) != len(exp):
                only_got = set(got) - set(exp)
                only_exp = set(exp) - set(got)
                for r in list(only_got)[:2]:
                    print(f"  only in got: {r}")
                for r in list(only_exp)[:2]:
                    print(f"  only in oracle: {r}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(got)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
