"""Dump formatted plans for the r15-optimization evidence set.

Usage: python tools/dump_r15_plans.py <out_dir> <suffix>

Writes <out_dir>/<name>_<suffix>.txt for each entry. Besides registered
queries, dumps the *internal* frames whose plans the r15 rewrites
changed (the registered minhash/simhash queries checkpoint their
expensive stage, so the registered plan alone hides the rewrite).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def explain_str(df) -> str:
    jdf = df._jdf
    return df._sc._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), "formatted"
    )


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_excel_csv_sql_spark.operators import dedup
    from etl_excel_csv_sql_spark.plans.registry import all_queries
    from etl_excel_csv_sql_spark.session import get_spark

    spark = get_spark("dump-r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    frames = {}

    # internal frames: the minhash signature + simhash fingerprint stages
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    corpus = dedup.synth_shingle_docs(docs).unionByName(
        dedup.synth_shingle_docs(docs, id_offset=1_000_000, twin=True)
    )
    frames["minhash_signatures"] = dedup.minhash_signatures(
        corpus, "doc_id", "text", 32, 3
    )
    frames["simhash_frame"] = dedup.simhash_frame(corpus, "doc_id", "text", 3)

    for name in (
        "cosine_topk",
        "ann_ivf_topk",
        "ann_ivf_persisted_topk",
        "semantic_dedup_report",
        "pricing_summary",
        "region_revenue",
        "shipping_priority_top10",
        "ngram_jaccard_pairs",
        "simhash_pairs",
        "minhash_lsh_pairs",
        "asof_latest_order_per_event",
        "doc_quality_score",
    ):
        try:
            frames[name] = queries[name](spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"skip {name}: {exc}", file=sys.stderr)

    for name, df in frames.items():
        if df is None:
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(explain_str(df))
        print(f"dumped {name}_{suffix}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
