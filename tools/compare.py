#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py [sf_dir] [verify_out_dir]

Reads each <out>/<name>/ parquet result (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against the same
parquet tables, and compares values EXACTLY (sorted columns + sorted rows).
Exact equality here implies any driver-side hash compare passes.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

# Per-oracle DuckDB budget: the driver's gate runs under a global time
# budget, and round 3's correctness artifact silently zeroed when
# oracle-side cost exploded (~27 min). Any single oracle slower than this
# at sf0.01 is flagged as a gate risk even if it matches.
ORACLE_BUDGET_SEC = 30.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    over_budget = []
    names_file = f"{out}/query_names.json"
    if os.path.exists(names_file):
        for name in json.load(open(names_file)):
            if not os.path.isdir(os.path.join(out, name)):
                print(f"  {name}: MISSING OUTPUT (query threw — see verify stderr)")
                n_fail += 1; failures.append(name)
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT PARQUET"); n_fail += 1; failures.append(name); continue
        # Output-type lint (the r7/r8/r9 local-green/driver-red class): the
        # driver's harness hashes its own serialization of each column, and
        # FLOAT and DECIMAL — ANY decimal, r9 proved it, not just
        # decimal128 — have hashed differently across engines while
        # comparing value-equal through this gate's single DuckDB session.
        # The r9 mechanism: the harness renders the Spark parquet side as
        # str(Decimal) WITH trailing zeros ('4792710.90') but the oracle
        # side as shortest-float repr ('4792710.9'), so a decimal column
        # fails exactly when some value hits a trailing zero at its scale
        # (15/15 of r9's driver fails predicted by that rule, 0 false
        # positives over 269 outputs). Ban the class outright; readouts
        # must be DOUBLE or BIGINT. (Unreviewed DOUBLE is
        # OutputTypeLintSpec's finer check.)
        bad_types = []
        for cname, ctype, *_ in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')").fetchall():
            t = ctype.upper()
            if "FLOAT" in t or "REAL" in t:  # float32 (DOUBLE is fine here)
                bad_types.append(f"{cname}: {ctype}")
            if "DECIMAL" in t:
                bad_types.append(f"{cname}: {ctype}")
        if bad_types:
            print(f"  {name}: BANNED OUTPUT TYPE {bad_types} "
                  "(FLOAT / DECIMAL serialize engine-specifically at the driver)")
            n_fail += 1; failures.append(name); continue
        spark_df = con.execute(f"SELECT * FROM read_parquet('{path}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(spark_df)} rows)" +
                  (" EMPTY!" if len(spark_df) == 0 else ""))
            if len(spark_df) == 0: n_fail += 1; failures.append(name)
            else: n_pass += 1
            continue
        try:
            t0 = time.time()
            duck_df = con.execute(oracle[name]).fetchdf()
            oracle_sec = time.time() - t0
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; failures.append(name); continue
        if oracle_sec > ORACLE_BUDGET_SEC:
            print(f"  {name}: ORACLE OVER BUDGET ({oracle_sec:.1f}s > {ORACLE_BUDGET_SEC:.0f}s) — gate risk")
            over_budget.append(name)
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  {name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; failures.append(name); continue
        if len(a) != len(b):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            n_fail += 1; failures.append(name); continue
        # dtype check: a float column on ONE side only (Spark emitting
        # DOUBLE where the oracle computes DECIMAL/int, or vice versa)
        # compares value-equal through this single DuckDB session but
        # hashes differently downstream — the q80 escape the ScalaTest
        # lint caught in r9. Cross-kind float/non-float is a FAILURE;
        # same-kind representation diffs (int64 vs object Decimal of
        # integers) stay informational.
        dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if str(a[c].dtype) != str(b[c].dtype)]
        kind_bad = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                    if (a[c].dtype.kind == 'f') != (b[c].dtype.kind == 'f')]
        if kind_bad:
            print(f"  {name}: DTYPE KIND MISMATCH {kind_bad} "
                  "(float on one side only — serialization-divergent)")
            n_fail += 1; failures.append(name); continue
        try:
            ok = True
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    eq = (av.isna() & bv.isna()) | (av == bv)
                else:
                    eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
                if not eq.all():
                    bad = (~eq).idxmax()
                    print(f"  {name}: VALUE MISMATCH col={c} row={bad} "
                          f"spark={av[bad]!r} duck={bv[bad]!r}")
                    ok = False
                    break
        except Exception as e:
            print(f"  {name}: COMPARE ERROR: {e}"); ok = False
        if ok:
            extra = f" [dtype diffs: {dt}]" if dt else ""
            print(f"  {name}: OK ({len(a)} rows){extra}")
            n_pass += 1
        else:
            n_fail += 1; failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    if over_budget:
        print(f"oracles over {ORACLE_BUDGET_SEC:.0f}s budget: {over_budget}")
    sys.exit(1 if n_fail or over_budget else 0)

if __name__ == "__main__":
    main()
