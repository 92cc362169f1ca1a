#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Reads verify_out_dir/oracle_sql.json + per-query parquet dumps written by
`graft.Verify`, runs each oracle SQL in DuckDB over the sf parquet tables,
and compares (column-name-sorted, row-sorted) values exactly.
Dev-only tool — the Scala library never depends on this.
"""
import duckdb, json, sys, glob, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.execute(sql).df()
        got_ty = dict(con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").df()
            [["column_name", "column_type"]].values)
        exp_ty = dict(con.execute(f"DESCRIBE {sql}").df()
            [["column_name", "column_type"]].values)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    # DECIMAL finals are the proven driver-hash hazard (r9 pagerank /
    # dataset_card, r12 sample_balanced_classes): pandas renders DuckDB
    # HUGEINT/DECIMAL differently from Spark's physical type even when
    # values are byte-identical, so the driver's stringifying hash fails
    # while a value compare passes. FAIL locally on any decimal-typed
    # final column on EITHER side so the builder sees it before the
    # driver does.
    dec_cols = sorted(
        {c for c, t in got_ty.items() if "DECIMAL" in str(t).upper()} |
        {c for c, t in exp_ty.items() if "DECIMAL" in str(t).upper()})
    if dec_cols:
        det = ", ".join(
            f"{c}({got_ty.get(c, '?')} vs {exp_ty.get(c, '?')})"
            for c in dec_cols)
        print(f"FAIL {name}: decimal final column(s): {det} "
              f"(format-hash hazard — cast to BIGINT/DOUBLE on both sides)")
        fails += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    diff_cols = []
    hazard_cols = set()
    # dtype-CLASS mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark
    # int64, or object vs int): values compare equal but a stringifying
    # hash ("3.0" vs "3") fails — exactly the r8/r9/r12 driver failure
    # mode. Any class difference is a local FAIL, not just float-vs-int.
    def dtype_class(d):
        d = str(d)
        for k in ("int", "float", "bool", "datetime", "timedelta"):
            if k in d:
                return k
        return "object"
    for c in gs.columns:
        ga, ea = str(gs[c].dtype), str(es[c].dtype)
        if ga != ea and dtype_class(ga) != dtype_class(ea):
            hazard_cols.add(c)
            diff_cols.append(f"{c}(dtype {ga} vs {ea}: format-hash hazard)")
    for c in gs.columns:
        if c in hazard_cols:
            continue  # already reported above; don't double-list
        a, b = gs[c], es[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            n = int((~eq).sum())
            i = (~eq).idxmax()
            diff_cols.append(f"{c}({n} diffs, e.g. {a[i]!r} vs {b[i]!r})")
    if diff_cols:
        print(f"FAIL {name}: value diffs: {'; '.join(diff_cols)}")
        fails += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")

print(f"\n{len([n for n in oracle if not only or n in only]) - fails} ok, {fails} failed")
sys.exit(1 if fails else 0)
