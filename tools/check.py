#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
sf_dir parquet tables, sorts columns by name and rows by value, and
compares cell-for-cell. Exit 1 on any mismatch.

Dev tool only — never shipped in the Spark library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total order (mirrors a hash-of-values compare)
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)


def cells_equal(a, b) -> bool:
    # STRICT: mirror the driver's hash of stringified values exactly.
    # Decimal('1.00') vs 1.0 must FAIL here because it fails there
    # (r1 lesson: a 1e-9 tolerance passed locally what the driver failed).
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    # union with oracle keys: a query that threw in Verify (no parquet
    # dir) must show up as FAIL, not silently vanish
    names = sorted(dirs | set(oracles))
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written")
            n_fail += 1
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracles:
            status = "WEAK" if len(got) > 0 else "FAIL(empty)"
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_weak += 1 if len(got) > 0 else 0
            n_fail += 0 if len(got) > 0 else 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
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
        g, e = canon(got), canon(exp)
        bad = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: col={col} row={i}: got={a!r} exp={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
