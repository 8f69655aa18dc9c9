#!/usr/bin/env python
"""Exact-value sweep: every oracle-paired registry query, Spark vs DuckDB,
full sorted value-multiset comparison (the same normalization as
tests/test_plans.py and the driver gate), at an arbitrary scale factor.

The driver's correctness gate runs at sf0.01 only; rounding-boundary bugs
are data-dependent (the r01 sweep caught a real flip in
hourly_event_counts that sf0.01 could not show), so each round's new
queries get swept at sf0.1 too:

    python scripts/value_sweep.py /root/testdata/sf0.1 [query ...]

With no query names, sweeps everything. Exit code = number of mismatches.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from news_crawler_slm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark("value-sweep", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    fails = []
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        sdf = qs[name](spark, sf_dir)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(sql)
        ocols = [d[0].lower() for d in res.description]
        orows = res.fetchall()
        ok_schema = sorted(scols) == sorted(ocols)
        ok_vals = ok_schema and _value_multiset(scols, srows) == _value_multiset(
            ocols, orows
        )
        status = "OK" if ok_vals else "FAIL"
        print(f"{status:4} {name}  spark={len(srows)} oracle={len(orows)}"
              + ("" if ok_schema else f"  SCHEMA {scols} vs {ocols}"))
        if not ok_vals:
            fails.append(name)
            if ok_schema:
                sm = _value_multiset(scols, srows)
                om = _value_multiset(ocols, orows)
                om_set, sm_set = set(om), set(sm)
                diff_s = [x for x in sm if x not in om_set][:3]
                diff_o = [x for x in om if x not in sm_set][:3]
                print(f"     spark-only: {diff_s}")
                print(f"     oracle-only: {diff_o}")
    print(f"\n{len(fails)} mismatches: {fails}")
    return len(fails)


if __name__ == "__main__":
    # cap the exit status: a raw mismatch count >= 256 would wrap modulo 256
    # and could read as 0 (success) to CI callers; the count is on stdout
    raise SystemExit(min(main(), 125))
