"""Python UDTFs (user-defined TABLE functions, Spark 3.5+/4.x) — the
one-row-in / many-rows-out Python surface, callable from SQL as a
lateral table function.

Honesty about the execution model: a UDTF runs Python per input row
(same lane as the row-at-a-time UDFs this engine otherwise bans), so a
UDTF here must (a) implement logic with no JVM/column-expression
equivalent and (b) only ever run on ALREADY-REDUCED frames (candidate
pairs, per-group summaries), never on the raw corpus — the same
contract as the Jaro-Winkler Arrow scorer. The registered use below
consumes near-duplicate PAIRS (blocked, capped upstream), not rows.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="op string, a_start int, a_end int, b_start int, "
    "b_end int, a_seg string, b_seg string"
)
class DiffSpans:
    """Edit script between two strings via stdlib difflib
    (Ratcliff-Obershelp longest-matching-block recursion): one output
    row per opcode — 'equal' / 'replace' / 'delete' / 'insert' with the
    half-open [start, end) spans in each string and the text segments.

    The dedup-forensics primitive: given a near-duplicate pair, WHICH
    spans differ (a timestamp? a name? boilerplate?) decides whether to
    collapse or keep both. No JVM equivalent exists (levenshtein gives
    the distance, not the script). Deterministic (autojunk off), so the
    output is value-testable; applying the script to `a` reconstructs
    `b` exactly — the invariant the tests pin.
    """

    def eval(self, a: str, b: str):  # noqa: D102 — UDTF contract
        import difflib

        sm = difflib.SequenceMatcher(
            a=a or "", b=b or "", autojunk=False
        )
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            yield (
                tag,
                i1,
                i2,
                j1,
                j2,
                (a or "")[i1:i2],
                (b or "")[j1:j2],
            )


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL (idempotent)."""
    spark.udtf.register("diff_spans", DiffSpans)
