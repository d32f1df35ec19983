"""Dump formatted plans for the r16-optimization evidence set.

Usage: python tools/dump_r16_plans.py <out_dir> <suffix>

Writes <out_dir>/<name>_<suffix>.txt for each entry. Registered queries
that checkpoint their expensive stage (ngram pair build, the star
components) hide the rewritten subtree behind a Scan ExistingRDD, so this
tool additionally dumps the *internal* lazy frames the r16 changes touch:

- ngram_pairs_lazy: the posting self-join + pair aggregation of
  ngram_jaccard_pairs at the registered parameters (n=3, t=0.12,
  max_df=100, hashed), built directly on a fresh postings frame;
- minhash_lsh_pairs: the registered query's returned frame — its plan
  carries the exact-verify joins (the r16 sets-materialization target);
- simhash_pairs / window_running_sum / asof_latest_order_per_event:
  registered frames;
- minhash_index_query: MinHashIndex.query over a throwaway index built in
  a temp dir (the lane-match expression rewrite target).
"""

from __future__ import annotations

import os
import sys
import tempfile

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

    spark = get_spark("dump-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    frames = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = dedup.shingle_postings(
        docs, "doc_id", "text", n=3, max_df=100, hash_shingles=True
    )
    frames["ngram_pairs_lazy"] = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text",
        n=3, threshold=0.12, max_df=100, hash_shingles=True,
        postings=postings,
    )

    # lazy replica of the hashed-path stop-shingle build (the operator
    # checkpoints its result, which hides the ReusedExchange evidence)
    from etl_excel_csv_sql_spark.operators.dedup import (
        _exploded_shingle_hash_rows,
    )
    from etl_excel_csv_sql_spark.operators.relational import (
        spread_for_compute,
    )

    shingled = _exploded_shingle_hash_rows(
        spread_for_compute(docs), "doc_id", "text", 3
    ).select("id", F.col("__h").alias("shingle")).distinct()
    hot = (
        shingled.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 100)
        .select("shingle")
    )
    frames["postings_build"] = shingled.join(
        F.broadcast(hot), "shingle", "left_anti"
    )

    ids = docs.select("doc_id")
    corpus = dedup.synth_shingle_docs(ids).unionByName(
        dedup.synth_shingle_docs(ids, id_offset=1_000_000, twin=True)
    )
    # tiny index for the query-plan dump (plan shape is size-independent)
    with tempfile.TemporaryDirectory() as tmp:
        idx = dedup.MinHashIndex(os.path.join(tmp, "idx"))
        idx.build(corpus.limit(200), "doc_id", "text")
        qplan = idx.query(corpus.limit(50), "doc_id", "text", threshold=0.5)
        with open(
            os.path.join(out_dir, f"minhash_index_query_{suffix}.txt"), "w"
        ) as fh:
            fh.write(explain_str(qplan))
        print(f"dumped minhash_index_query_{suffix}", file=sys.stderr)

    for name in (
        "minhash_lsh_pairs",
        "simhash_pairs",
        "ngram_jaccard_pairs",
        "window_running_sum",
        "asof_latest_order_per_event",
        "dedup_components_star",
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
