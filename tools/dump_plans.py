"""Dump ``explain("formatted")`` for declared queries to files.

Usage::

    python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] [query ...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each named query (all
queries when none named). The judge reads these files to check plan
claims (Exchange counts, join strategies, PushedFilters) against the
code, so the dump is the raw formatted plan, unedited.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    names = sys.argv[4:]

    import __spark_entry__ as E
    from rehiver_spark.session import get_spark

    spark = get_spark(app_name="rehiver-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    queries = E.queries()
    for name in names or sorted(queries):
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
            print(f"FAIL {name}: {e}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
