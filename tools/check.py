#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads the Spark result parquet from
<outDir>/<name>/, canonicalizes both (columns sorted by name, rows sorted
by all columns), and reports exact-match / close-match per query.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Sort key: round floats (so last-bit engine differences can't reorder
    # rows) and zero-pad numerics (so the lexicographic sort is numeric).
    key = pd.DataFrame(index=df.index)
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            key[c] = col.round(6).map(lambda v: f"{v:+025.6f}")
        elif col.dtype.kind in "iu":
            key[c] = col.map(lambda v: f"{v:+021d}")
        else:
            key[c] = col.astype(str)
    idx = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[idx].reset_index(drop=True)


def cell_eq(a, b) -> (bool, bool):
    """(exact, close)"""
    if a is None and b is None:
        return True, True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        # "close" = genuine float agreement at 1e-9, OR a row-pairing swap
        # between rows that tie under the sort key's 1e-6 rounding. A tie
        # swap implies both cells round to the same 6-dp value, so the
        # loose tolerance is scoped to exactly that case — a genuine
        # small divergence between values that round apart still fails.
        # The extra 1e-8 absolute band keeps ulp noise that happens to
        # STRADDLE a 6-dp rounding boundary (0.1234564999 vs
        # 0.1234565001: rel diff ~1.6e-9, rounds apart) from flaking.
        close = (math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                 or round(a, 6) == round(b, 6)
                 or abs(a - b) < 1e-8)
        return a == b, close
    if (a is None) != (b is None):
        return False, False
    eq = str(a) == str(b)
    return eq, eq


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    try:
        errors = json.load(open(f"{outdir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"
                      + (f" ({errors[name]})" if name in errors else ""))
                n_fail += 1
                continue
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = []
        n_close_only = 0
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                exact, close = cell_eq(a, b)
                if not exact and close:
                    n_close_only += 1
                elif not exact:
                    bad.append((c, i, a, b))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
            n_fail += 1
        elif n_close_only:
            print(f"WARN {name}: exact on all but {n_close_only} close-only float cells")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
