#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the testdata
parquet tables, and compares: schema (column names), row count, and values
(rows sorted, columns sorted by name). Exact match is reported separately
from approx (1e-9 rel tol on floats) so float-hash risk is visible.

Dev tool only — NOT part of the Scala library (duckdb/pandas are
driver-side utilities per the build brief).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rows_key(row):
    # Floats sort by a rounded-repr key: raw str() of jitter within the
    # comparison tolerance could order the two sides differently near a
    # string-ordering boundary, mispairing rows and producing a spurious
    # FAIL (queries round to 6dp, so 9dp here is strictly finer than the
    # data while coarser than the 1e-9 tolerance).
    def k(v):
        if isinstance(v, float):
            return (str(float), "nan" if math.isnan(v) else f"{v:.9e}")
        return (str(type(v)), str(v))
    return tuple(k(v) for v in row)


def dtypes(con, sql):
    """Column -> DuckDB type name, via DESCRIBE (binds, does not execute)."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def compare(name, got, exp, gtypes=None, etypes=None):
    if got is None:
        return f"FAIL {name}: spark result missing"
    gcols, grows = got
    ecols, erows = exp
    if sorted(gcols) != sorted(ecols):
        return f"FAIL {name}: columns differ spark={sorted(gcols)} duckdb={sorted(ecols)}"
    # Physical type gate: the driver's hash is width-sensitive (HUGEINT vs
    # BIGINT vs INTEGER fail it even when Python values compare equal), so
    # the local gate must be too — this is the class that shipped red in r6.
    if gtypes is not None and etypes is not None:
        bad = [(c, gtypes.get(c), etypes.get(c)) for c in sorted(gcols)
               if gtypes.get(c) != etypes.get(c)]
        if bad:
            det = ", ".join(f"{c}: spark={g} duckdb={e}" for c, g, e in bad)
            return f"FAIL {name}: dtype mismatch ({det})"
    # reorder columns by sorted name
    gidx = [gcols.index(c) for c in sorted(gcols)]
    eidx = [ecols.index(c) for c in sorted(ecols)]
    g = sorted([tuple(r[i] for i in gidx) for r in grows], key=rows_key)
    e = sorted([tuple(r[i] for i in eidx) for r in erows], key=rows_key)
    if len(g) != len(e):
        return f"FAIL {name}: rowcount spark={len(g)} duckdb={len(e)}"
    exact = True
    approx = True
    for gr, er in zip(g, e):
        for gv, ev in zip(gr, er):
            if gv == ev:
                continue
            if gv is None or ev is None:
                exact = approx = False
                break
            if isinstance(gv, float) and isinstance(ev, float):
                # NaN on BOTH sides is parity (NaN != NaN would otherwise
                # fail a query whose results agree perfectly); note the
                # driver hash may still treat NaN specially - prefer
                # queries that never emit NaN.
                if math.isnan(gv) and math.isnan(ev):
                    continue
                exact = False
                if math.isclose(gv, ev, rel_tol=1e-9, abs_tol=1e-9):
                    continue
                approx = False
                break
            exact = approx = False
            break
        if not approx:
            return (f"FAIL {name}: value mismatch\n  spark={gr}\n  duck ={er}")
    if exact:
        return f"PASS {name}: exact ({len(g)} rows)"
    return f"PASS {name}: approx-only (float hash RISK) ({len(g)} rows)"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query names to check (matches
    # graft.Verify's subset arg for local iteration)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        try:
            cur = con.execute(sql)
            ecols = [d[0] for d in cur.description]
            erows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            cur = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            gcols = [d[0] for d in cur.description]
            grows = cur.fetchall()
            gtypes = dtypes(
                con, f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        except Exception as ex:
            print(f"FAIL {name}: cannot read spark output: {ex}")
            n_fail += 1
            continue
        try:
            etypes = dtypes(con, sql)
        except Exception as ex:
            print(f"FAIL {name}: oracle DESCRIBE error: {ex}")
            n_fail += 1
            continue
        msg = compare(name, (gcols, grows), (ecols, erows), gtypes, etypes)
        print(msg)
        if msg.startswith("FAIL"):
            n_fail += 1
    # queries with no oracle get rows-only smoke
    declared = set(oracle)
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in declared:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS {p.name}: {n} rows (no oracle)")
            except Exception as ex:
                print(f"FAIL {p.name}: unreadable rows-only output: {ex}")
                n_fail += 1
    print(f"== {n_fail} failures ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
