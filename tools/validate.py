#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries against the DuckDB oracle.

Replicates the driver's compare as closely as we can infer (BASELINE.md):
sort columns by name, canonicalize values (floats rounded to 1e-9,
timestamps as UTC strings), sort rows, sha256-hash, compare.

Both sides are fetched THROUGH PANDAS (`rel.df()`), not `fetchall()`:
round 5 proved the driver does the same — DuckDB renders HUGEINT
(e.g. an uncast SUM(INTEGER)) as float64 through pandas, so an oracle
whose output type is HUGEINT hashes `12.000000000` against Spark's
`12` and fails. `fetchall()` preserves Python ints and green-lit
exactly that bug (q124, round 5). Never switch this back.

Usage: python3 tools/validate.py <verify_out_dir> <sf_dir>
where <verify_out_dir> was produced by `sbt "runMain graft.Verify <sf_dir> <out>"`.
"""
import sys, os, json, hashlib, glob
import duckdb
import numpy as np
import pandas as pd


def canon_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (float, np.floating)):
        if v != v:
            return "NaN"
        return f"{round(float(v), 9):.9f}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    # timestamps / dates -> isoformat
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def fetch(rel):
    """Fetch a DuckDB relation the way the driver does: via pandas.

    This is load-bearing for type canonicalization (HUGEINT/DECIMAL ->
    float64, int columns with NULLs -> float64) — see module docstring.
    """
    df = rel.df()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def row_hash(lines):
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    # A query that THREW inside Verify never dumps a directory and would
    # otherwise vanish from this count (round 8 caught exactly that: six
    # NTZ-broken queries, "144 pass, 0 fail"). Every oracle key must
    # have an output dir — missing means the Spark side failed.
    missing = sorted(set(oracles) - set(names))
    for name in missing:
        print(f"{name}: MISSING SPARK OUTPUT (query failed in Verify?)")
        n_fail += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        s_cols, s_rows = fetch(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        if name not in oracles:
            print(f"{name}: no oracle (rows-only check): {len(s_rows)} rows")
            n_skip += 1
            continue
        try:
            o_cols, o_rows = fetch(con.sql(oracles[name]))
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"{name}: COLUMN MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        sc, oc = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
        if len(sc) != len(oc):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sc)} oracle={len(oc)}")
            n_fail += 1
            continue
        if row_hash(sc) != row_hash(oc):
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"{name}: HASH MISMATCH ({len([1 for a,b in zip(sc,oc) if a!=b])} differing rows)")
            for a, b in diffs:
                print(f"   spark:  {a[:160]}")
                print(f"   oracle: {b[:160]}")
            n_fail += 1
            continue
        print(f"{name}: OK ({len(sc)} rows)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
