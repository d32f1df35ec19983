"""A/B: string-key vs xxhash64-key inverted-index posting lists.

Measures ngram_jaccard_pairs (the headline exact-Jaccard query) and the
star-CC pipeline's edge build at sf0.1 with hash_shingles on/off, plus
result parity. Appends one jsonl row to .benchmarks/history.jsonl
(metric="hash_shingle_ab").

Usage: python tools/hash_shingle_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_excel_csv_sql_spark.operators import dedup  # noqa: E402
from etl_excel_csv_sql_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hash_shingle_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(1).collect()  # warm

    from bench import stage_exec_ms

    def one(hash_shingles: bool) -> tuple[float, float | None, int]:
        before = stage_exec_ms(spark)
        t0 = time.perf_counter()
        n = dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.12, max_df=100,
            hash_shingles=hash_shingles,
        ).count()
        wall = time.perf_counter() - t0
        after = stage_exec_ms(spark)
        ex = (
            sum(v for k, v in after.items() if k not in before) / 1000.0
            if before is not None and after is not None
            else None
        )
        return wall, ex, n

    # INTERLEAVED arms (string, hash) × 3 rounds, best-of per arm: a
    # sequential string-string-hash-hash protocol hands the second arm a
    # fully warmed JIT — exactly the ordering bias that produced the
    # spurious 1.4× fold reading this tool exists to avoid (code-review
    # r9 catch). Round 1 is warmup for BOTH arms; wall is best-of-3,
    # exec (the load-robust series) best of the probe-complete rounds.
    load1 = round(os.getloadavg()[0], 2)
    walls: dict[bool, list] = {False: [], True: []}
    execs: dict[bool, list] = {False: [], True: []}
    counts: dict[bool, int] = {}
    for _ in range(3):
        for arm in (False, True):
            w, e, n = one(arm)
            walls[arm].append(w)
            if e is not None:
                execs[arm].append(e)
            counts[arm] = n
    wall_str, wall_hash = min(walls[False]), min(walls[True])
    exec_str = min(execs[False]) if execs[False] else None
    exec_hash = min(execs[True]) if execs[True] else None
    n_str, n_hash = counts[False], counts[True]

    row = {
        "ts": time.time(),
        "metric": "hash_shingle_ab",
        "sf_dir": sf_dir,
        "query": "ngram_jaccard_pairs(t=0.12, max_df=100)",
        "string_sec": round(wall_str, 3),
        "hash_sec": round(wall_hash, 3),
        "speedup": round(wall_str / wall_hash, 2) if wall_hash else None,
        "string_exec_sec": round(exec_str, 3) if exec_str else None,
        "hash_exec_sec": round(exec_hash, 3) if exec_hash else None,
        "exec_speedup": (
            round(exec_str / exec_hash, 2) if exec_str and exec_hash else None
        ),
        "pairs_string": n_str,
        "pairs_hash": n_hash,
        "rows_equal": n_str == n_hash,
        "load1": load1,
        "note": "interleaved (string,hash)x3 best-of per arm; 8-byte "
        "xxhash64 posting keys vs n-word strings; value parity pinned "
        "in test_dedup",
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".benchmarks", "history.jsonl"), "a"
    ) as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
