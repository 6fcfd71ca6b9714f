#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracle SQL on the same sf dir, compare values
(columns sorted by name, rows sorted, exact equality) AND dtypes.

Driver parity note (round 6 lesson): the driver's hash is dtype-sensitive —
a DuckDB HUGEINT (materialized float64) vs a Spark BIGINT fails the driver
even when every value is exactly equal. So a numeric-kind mismatch
(int vs float) is a hard FAIL here too, and the default gate SF is the
driver's sf0.1, not sf0.01."""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = glob.glob(f"{outdir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(p) for p in pq], ignore_index=True)
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    ok = True
    for c in got.columns:
        a, b = got[c], exp[c]
        # dtype gate first: int-vs-float (the HUGEINT widening class) is a
        # driver hash fail even with exact values.
        ka = 'i' if a.dtype.kind == 'u' else a.dtype.kind
        kb = 'i' if b.dtype.kind == 'u' else b.dtype.kind
        if {ka, kb} == {'i', 'f'}:
            print(f"  col {c}: DTYPE mismatch {a.dtype} vs {b.dtype} "
                  f"(driver hash is dtype-sensitive)")
            ok = False
            continue
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            eq = np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = eq.all()
            close = np.isclose(a.astype(float), b.astype(float), rtol=1e-12, atol=1e-9, equal_nan=True).all()
            if not exact:
                tag = "(close but not exact!)" if close else ""
                print(f"  col {c}: mismatch {tag} e.g. {a[~eq].head(3).tolist()} vs {b[~eq].head(3).tolist()}")
                ok = False
        else:
            eq = (a.astype(str) == b.astype(str))
            if not eq.all():
                print(f"  col {c}: mismatch e.g. {a[~eq].head(3).tolist()} vs {b[~eq].head(3).tolist()}")
                ok = False
    if ok: print(f"PASS {name} ({len(got)} rows)")
    else: print(f"FAIL {name}"); fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
