#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each parquet table as a view, runs every oracle SQL from
oracle_sql.json, and diffs against the Spark parquet output: row count,
column set, and (column-name-sorted, row-sorted) value equality.

DRIVER FIDELITY: the driver hashes STRING RENDERINGS of every value, so
this pre-flight compares string renderings too (astype(str)), for EVERY
column. Numeric equality is NOT enough: -0.0 vs 0.0 (round-4 ts_holt),
or a DuckDB HUGEINT rendered "38827026.0" vs a Spark BIGINT "38827026"
(round-2/3 txt_winnow), are numerically equal yet driver-red. The only
carve-out is a NaN==NaN pair (the driver treats nulls as equal).
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"create view {name} as select * from '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# oracle_sql.json now carries each entry under both `<name>` and
# `<name>.parquet` (driver key format) — compare each query once
oracle = {k: v for k, v in oracle.items() if not k.endswith(".parquet")}
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}.parquet"
    if not os.path.isdir(spark_dir):
        spark_dir = f"{out}/{name}"  # pre-rename layout fallback
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    sdf = con.sql(f"select * from '{spark_dir}/*.parquet'").df()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: cols oracle={ocols} spark={scols}"); fails += 1; continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}"); fails += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[ocols].sort_values(ocols).reset_index(drop=True)
    diff_cols = []
    repr_cols = []
    for c in ocols:
        a, b = o[c], s[c]
        # Loud dedicated message for the dtype-level representation skew:
        # one side float64 with integral values, the other integer (the
        # DuckDB HUGEINT blind spot). astype(str) below would also catch
        # it, but the fix hint (cast the oracle to BIGINT) is worth naming.
        if (a.dtype.kind == 'f') != (b.dtype.kind == 'f'):
            f, i = (a, b) if a.dtype.kind == 'f' else (b, a)
            if i.dtype.kind in 'iu' and (f.dropna() == f.dropna().round()).all():
                repr_cols.append(c)
                continue
        # Driver semantics: string renderings, every column. -0.0 != 0.0
        # here, exactly as in the driver's hash. NaN-pair carve-out kept.
        eq = ((a.isna() & b.isna()) | (a.astype(str) == b.astype(str))).all()
        if not eq:
            diff_cols.append(c)
    if repr_cols:
        print(f"FAIL {name}: HUGEINT-REPR in {repr_cols} — one side is "
              f"float64, the other integral; values may be equal but the "
              f"driver hashes string renderings (cast the oracle column to "
              f"BIGINT)")
        fails += 1
        continue
    if diff_cols:
        print(f"FAIL {name}: render mismatch in {diff_cols} ({len(o)} rows)")
        for c in diff_cols[:3]:
            a, b = o[c], s[c]
            mask = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
            print(f"  {c}: {mask.sum()} differing rows; first:")
            print("   oracle:", o[mask].head(2).to_dict('records'))
            print("   spark :", s[mask].head(2).to_dict('records'))
        fails += 1
    else:
        print(f"OK   {name} ({len(o)} rows)")
print(f"{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
