#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX [query ...]
With no query names, dumps every bench.py HEADLINE query.
Writes OUTDIR/<query>_<SUFFIX>.txt. SF dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import bench
    import __spark_entry__ as entry_mod
    from news_crawler_slm_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)
    spark = get_spark("dump-plans")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
