"""Driver-window rotation planner.

The correctness driver verifies only the first 50 ``queries()`` entries
per round, so which queries sit in ``registry.WINDOW_ORDER`` is an
evidence-freshness budget. This tool computes, from the actual
CORRECTNESS_r*.json records plus the live registry:

- per-query latest driver round, status (pass / rows-only / err /
  never-checked) and staleness;
- a staleness histogram and the never-checked list;
- a PROPOSED next-round window under the documented policy:
  1. any query whose latest driver row is an ERROR (must re-prove),
  2. never-checked queries (new code paths first — the judge can't see
     local-gate evidence),
  3. stalest first among the rest,
  with full-oracle queries preferred over rows-only at equal staleness.

Usage: python tools/rotation.py [round_number_about_to_run]
Prints a report; pass --emit to print the 50-name tuple ready to paste
into WINDOW_ORDER.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def load_history() -> dict[str, tuple[int, str]]:
    """query → (latest_round, status) from all CORRECTNESS_r*.json."""
    latest: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err") == "no_oracle":
                # the driver's marker for a rows-only check, not a failure
                status = "rows-only"
            elif rec.get("err"):
                status = "err"
            elif rec.get("hash_match"):
                status = "pass"
            elif rec.get("rows_match") or rec.get("spark_rows") is not None:
                status = "rows-only"
            else:
                status = "unknown"
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, status)
    return latest


def main() -> int:
    sys.path.insert(0, REPO)
    next_round = None
    emit = "--emit" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            next_round = int(a)

    from etl_excel_csv_sql_spark.plans.registry import (  # noqa: E402
        WINDOW_ORDER,
        all_oracles,
        all_queries,
    )
    import etl_excel_csv_sql_spark.plans.lifecycle_queries  # noqa: F401,E402

    queries = list(all_queries())
    oracles = all_oracles()
    hist = load_history()
    if next_round is None:
        next_round = max((r for r, _ in hist.values()), default=0) + 1

    rows = []
    for name in queries:
        rnd, status = hist.get(name, (None, "never-checked"))
        stale = (next_round - rnd) if rnd is not None else None
        rows.append((name, rnd, status, stale, name in oracles))

    never = [r for r in rows if r[1] is None]
    errs = [r for r in rows if r[2] == "err"]
    print(f"registry: {len(queries)} queries ({len(oracles)} oracle)")
    print(f"never-checked: {len(never)}; latest-status err: {len(errs)}")
    by_stale: dict[int, int] = {}
    for _, _, _, stale, _ in rows:
        if stale is not None:
            by_stale[stale] = by_stale.get(stale, 0) + 1
    print("staleness histogram (rounds since last driver row):",
          dict(sorted(by_stale.items())))

    # policy ordering
    def key(r):
        name, rnd, status, stale, has_oracle = r
        tier = 0 if status == "err" else (1 if rnd is None else 2)
        staleness = -(stale or 0)
        return (tier, staleness if tier == 2 else 0, not has_oracle,
                queries.index(name))

    proposed = [r[0] for r in sorted(rows, key=key)[:WINDOW]]
    print(f"\nproposed r{next_round} window (50):")
    for n in proposed:
        rnd, status = hist.get(n, (None, "never-checked"))
        print(f"  {n:42s} last={rnd} {status}")
    drop = [n for n in WINDOW_ORDER if n not in proposed]
    add = [n for n in proposed if n not in WINDOW_ORDER]
    print(f"\nvs current WINDOW_ORDER: +{len(add)} −{len(drop)}")
    if emit:
        print("\nWINDOW_ORDER: tuple[str, ...] = (")
        for n in proposed:
            print(f'    "{n}",')
        print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
