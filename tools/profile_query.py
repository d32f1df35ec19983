"""Per-query profiling harness for optimization rounds (guide §1).

Usage:
    python tools/profile_query.py <query> [query ...] [--passes N] [--plan DIR]

For each named registry query: builds the frame, forces it end-to-end with
the noop sink (same methodology as bench.py), reports per-pass wall and the
summed executorRunTime delta of the new stages (load-robust CPU), and
optionally writes ``.explain("formatted")`` to ``<DIR>/<query>.txt``.

Jobs are labeled via setJobDescription so the UI/eventlog attribute stages
to queries. Diagnostics to stderr; one JSON line per query to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import stage_exec_ms  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    passes = 3
    plan_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--plan":
            plan_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_excel_csv_sql_spark.plans.registry import all_queries
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # same warmup as bench.py so pass-1 isn't charged for session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        fn = queries[name]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls, execs = [], []
        for p in range(passes):
            spark.sparkContext.setJobDescription(f"profile:{name}:pass{p}")
            before = stage_exec_ms(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            after = stage_exec_ms(spark)
            if before is not None and after is not None:
                execs.append(round(sum(
                    v for k, v in after.items() if k not in before) / 1000, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name, "walls": walls, "execs": execs,
            "median_wall": sorted(walls)[len(walls) // 2],
            "median_exec": sorted(execs)[len(execs) // 2] if execs else None,
            "load1": round(os.getloadavg()[0], 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
