"""Adversarial-diameter connected-components probe (VERDICT r9 #6).

The star-CC x100 evidence is on near-dup (shallow) graphs; this probe
runs BOTH component solvers on the shape min-propagation fails at — a
single path of n nodes (diameter n-1) — at n and 10n:

- connected_components_star must CONVERGE (every node labeled 1) within
  an O(log n) round budget and its wall should grow ~linearly in n;
- connected_components is given a fixed 30-round budget (converging
  would take diameter rounds ~ n); the probe records that its output is
  NOT converged — the honest evidence for why star is the library
  default (dedup_keep_first algorithm='star').

Appends one scale_probe row per (solver, n) to
.benchmarks/history.jsonl: metric=scale_probe, query=cc_chain_<solver>.

Usage: python tools/chain_cc_probe.py [base_n=10000] [multiplier=10]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from etl_excel_csv_sql_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark(
        "chain_cc_probe",
        conf={"spark.sql.shuffle.partitions": "32", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in (base_n, base_n * mult):
        # path 1-2-...-n, distributed construction (never a driver list)
        pairs = (
            spark.range(1, n)
            .select(
                F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
            )
            .localCheckpoint(eager=True)
        )

        t0 = time.time()
        star = connected_components_star(pairs, max_rounds=25)
        star_bad = star.where(F.col("component") != 1).count()
        star_n = star.count()
        star_sec = round(time.time() - t0, 3)

        t0 = time.time()
        prop = connected_components(pairs, max_iter=30)
        prop_bad = prop.where(F.col("component") != 1).count()
        prop_n = prop.count()
        prop_sec = round(time.time() - t0, 3)

        assert star_n == prop_n == n
        for query, sec, bad, note in (
            ("cc_chain_star", star_sec, star_bad,
             "must converge in O(log n) alternating rounds"),
            ("cc_chain_propagation", prop_sec, prop_bad,
             "30-round budget; full convergence needs diameter rounds"),
        ):
            row = {
                "ts": time.time(),
                "metric": "scale_probe",
                "query": query,
                "corpus": "chain",
                "n_nodes": n,
                "multiplier": n // base_n,
                "run2_sec": sec,
                "converged": bad == 0,
                "mislabeled_nodes": bad,
                "note": note,
                "load1_start": os.getloadavg()[0],
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        assert star_bad == 0, (
            f"star-CC failed to converge on the {n}-node chain "
            f"({star_bad} mislabeled)"
        )

    with open(".benchmarks/history.jsonl", "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    s0, s1 = rows[0]["run2_sec"], rows[2]["run2_sec"]
    print(
        f"star growth at x{mult}: {s1 / s0:.1f}x "
        f"({s0}s -> {s1}s); propagation converged: "
        f"{rows[1]['converged']}/{rows[3]['converged']}"
    )


if __name__ == "__main__":
    main()
