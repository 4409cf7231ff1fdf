#!/usr/bin/env python3
"""Self-test for tools/compare.py driver fidelity.

Plants the two representation-skew classes that slipped past the old
numeric pre-flight (round-2/3 HUGEINT float-render, round-4 IEEE -0.0)
and asserts compare.py goes red on each, then green on a clean pair.

Usage: python3 tools/compare_selftest.py
"""
import json, os, shutil, subprocess, sys, tempfile
import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
COMPARE = os.path.join(HERE, "compare.py")


def run_case(tag, oracle_sql, spark_sql, expect_fail):
    tmp = tempfile.mkdtemp(prefix=f"cmpself_{tag}_")
    try:
        sf = os.path.join(tmp, "sf"); out = os.path.join(tmp, "out")
        os.makedirs(sf); os.makedirs(out)
        con = duckdb.connect()
        # a dummy base table so the sf dir is non-empty
        con.sql(f"copy (select 1 as x) to '{sf}/base.parquet' (format parquet)")
        os.makedirs(os.path.join(out, "q.parquet"))
        con.sql(f"copy ({spark_sql}) to "
                f"'{out}/q.parquet/part-0.parquet' (format parquet)")
        json.dump({"q": oracle_sql}, open(os.path.join(out, "oracle_sql.json"), "w"))
        r = subprocess.run([sys.executable, COMPARE, sf, out],
                           capture_output=True, text=True)
        failed = r.returncode != 0
        ok = failed == expect_fail
        print(f"{'PASS' if ok else 'SELFTEST-FAIL'} {tag}: compare.py "
              f"{'red' if failed else 'green'} (expected "
              f"{'red' if expect_fail else 'green'})")
        if not ok:
            print(r.stdout)
        return ok
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


cases = [
    # IEEE negative zero: numerically equal, renders differently — must be RED
    # (a `-0.0` literal is DECIMAL and normalizes; round() of a tiny
    # negative is how the real oracles produce it — ts_holt round 4)
    ("neg_zero",
     "select 1 as k, round(-0.00001 + 1e-9, 4) as v",
     "select 1 as k, cast(0.0 as double) as v",
     True),
    # HUGEINT: duckdb sum() yields HUGEINT → pandas float64 "7.0" vs spark
    # BIGINT "7" — must be RED
    ("hugeint",
     "select sum(x) as s from (select unnest([3, 4]) as x)",
     "select cast(7 as bigint) as s",
     True),
    # identical doubles incl. a NaN pair — must be GREEN
    ("clean",
     "select unnest([1, 2]) as k, unnest([cast(0.25 as double), cast('nan' as double)]) as v",
     "select unnest([1, 2]) as k, unnest([cast(0.25 as double), cast('nan' as double)]) as v",
     False),
]

ok = all([run_case(*c) for c in cases])
print("SELFTEST " + ("ALL OK" if ok else "FAILURES"))
sys.exit(0 if ok else 1)
