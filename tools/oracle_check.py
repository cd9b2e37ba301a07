#!/usr/bin/env python3
"""Local differential oracle check (mirrors the driver's t2 compare).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

For each query dumped by `graft.Verify` into <verifyOutDir>/<name>/ :
  - read Spark's parquet result,
  - run the matching oracle SQL from oracle_sql.json in DuckDB over
    '{sfDir}/<table>.parquet' views,
  - compare row count, column names (sorted), and values row-for-row
    (columns sorted by name, exact equality; floats compared exactly to
    surface any parity drift early),
  - DESCRIBE the oracle SQL and FAIL on any >64-bit numeric output
    column (HUGEINT / UHUGEINT / DECIMAL with precision > 18).  The
    driver's hasher canonicalizes 128-bit integers differently from
    64-bit ones even when values are equal, and pandas' fetchdf()
    silently narrows them — so the row-compare above is blind to the
    mismatch (this bit rounds 7 AND 8; see VERDICT r8 "What's wrong").
    DuckDB promotes SUM(BIGINT) -> HUGEINT: every SUM-derived oracle
    output column must be cast back with ::BIGINT.
"""
import json, os, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def wide_columns(con, sql):
    """Oracle output columns wider than 64 bits (driver-hash hazard)."""
    bad = []
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        col_name, t = row[0], str(row[1]).upper()
        if t in ("HUGEINT", "UHUGEINT"):
            bad.append((col_name, t))
        elif t.startswith("DECIMAL("):
            prec = int(t[len("DECIMAL("):].split(",")[0])
            if prec > 18:
                bad.append((col_name, t))
    return bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver testdata are single files; Spark-written scale fixtures
        # (graft.ScaleUp at sf1) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a typo'd query name must not exit 0 with "0 pass, 0 fail"
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query name(s) {sorted(unknown)}")
        n_fail += len(unknown)
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}");  n_fail += 1;  continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}");  n_fail += 1;  continue
        got, exp = got[gc], exp[gc]
        bad = None
        for i in range(len(got)):
            for c in gc:
                a, b = got[c].iloc[i], exp[c].iloc[i]
                an, bn = pd.isna(a), pd.isna(b)
                eq = (an and bn) or (not an and not bn and a == b)
                if not eq:
                    bad = (i, c, a, b);  break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
            continue
        # second, DuckDB-NATIVE multiset compare (r15 self-review of this
        # harness): the pandas loop above is blind to two classes —
        # fetchdf() maps SQL NULL and NaN both to float NaN (a Spark NULL
        # would "equal" an oracle NaN), and an int64 column containing a
        # NULL is widened to float64, where two big integers differing
        # below 2^53 precision compare equal. EXCEPT ALL inside DuckDB
        # compares exact native values (NULL distinct from NaN, BIGINTs
        # exact), order-insensitively — together the two gates cover
        # order AND exactness.
        try:
            cols = ", ".join(f'"{c}"' for c in gc)
            diff = con.execute(
                f"SELECT count(*) FROM ("
                f"(SELECT {cols} FROM read_parquet({files!r}) "
                f" EXCEPT ALL SELECT {cols} FROM ({sql})) UNION ALL "
                f"(SELECT {cols} FROM ({sql}) "
                f" EXCEPT ALL SELECT {cols} FROM read_parquet({files!r}))"
                f")").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: native multiset compare failed: {e}")
            n_fail += 1
            continue
        if diff:
            print(f"FAIL {name}: {diff} row(s) differ in the native "
                  f"multiset compare (NULL/NaN or >2^53 integer drift "
                  f"the pandas loop cannot see)")
            n_fail += 1
            continue
        try:
            wide = wide_columns(con, sql)
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE failed: {e}");  n_fail += 1;  continue
        if wide:
            print(f"FAIL {name}: >64-bit oracle output column(s) {wide} "
                  f"(driver hash hazard — add ::BIGINT casts)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
