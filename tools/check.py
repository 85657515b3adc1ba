#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <out>/<name> parquet result written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the same
testdata parquet, and compares: schema (column names), row count, and
exact values (columns sorted by name, rows sorted by all columns).

The value compare is BYTE-EXACT on stringified cells — including the
integer/float dtype rendering (so a DuckDB HUGEINT that pandas renders
as `15.0` fails against Spark's BIGINT `15`), because that is what the
driver's hasher does. No float tolerance: if a query needs tolerance it
will fail the driver too, and the fix belongs in the oracle SQL (CAST).

`python3 tools/check.py --selftest` exercises the strictness invariant.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # stringify for a stable total sort incl. NaN/None
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # Driver-strict: byte-exact stringified compare, dtype
            # rendering included (BIGINT "15" != HUGEINT/float "15.0").
            eqm = (gv.isna() & ev.isna()) | (gv.astype(str) == ev.astype(str))
            if not eqm.all():
                i = int(np.argmin(eqm.values))
                bad.append(f"{c}[row {i}]: spark={gv.iloc[i]!r} oracle={ev.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: value mismatch: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


def selftest() -> int:
    """The round-2 regression: an int64 Spark column vs a float64
    oracle column with equal numeric values MUST mismatch (the driver's
    hasher sees "15" vs "15.0")."""
    g = pd.DataFrame({"k": ["a"], "n": np.array([15], dtype="int64")})
    e = pd.DataFrame({"k": ["a"], "n": np.array([15.0], dtype="float64")})
    gn, en = norm(g), norm(e)
    same = bool((gn["n"].astype(str) == en["n"].astype(str)).all())
    if same:
        print("SELFTEST FAIL: int64 15 compared equal to float64 15.0")
        return 1
    print("SELFTEST PASS: int64 15 != float64 15.0 under strict compare")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
