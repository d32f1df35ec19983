"""Fixed-width text files — the mainframe/legacy-feed format every ETL
engine eventually meets (the reference family's CSV/Excel feeds have a
fixed-width sibling in most shops; SURVEY §2.1 scope extension).

Read path: ``spark.read.text`` (splittable, parallel) + SUBSTRING column
slices from the spec — pure Catalyst expressions, so column pruning
drops unused slices and the scan stays one narrow map. No Python ever
touches a row.

Write path: pad/truncate each column to its width (rpad on a stringified
value — overflow TRUNCATES, documented; keys should size their width),
concat, write as text. Round-trips exactly for values within width, with
two documented format limits: values containing line breaks FAIL the
write (a line-oriented format cannot carry them — silently splitting
records would misalign every later column), and all-blank fields read
back as NULL (the format cannot distinguish NULL from the empty
string).

A spec is ``[(name, width, type)]``; type is any Spark cast target
("string" values are trimmed of the right-padding on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Spec = "list[tuple[str, int, str]]"


def write_fixed_width(df: DataFrame, path: str, spec: Spec) -> None:
    parts = []
    for name, width, _typ in spec:
        raw = F.col(name).cast("string")
        # embedded line breaks would split one record across physical
        # lines and silently misalign EVERY later column on read (r10
        # review) — a line-oriented format cannot carry them; fail the
        # write loudly instead of corrupting
        guarded = F.when(
            raw.rlike("[\\r\\n]"),
            F.raise_error(
                F.concat(
                    F.lit(f"fixed-width column {name!r} contains a "),
                    F.lit("line break; scrub before writing"),
                )
            ),
        ).otherwise(raw)
        # rpad both pads AND truncates to width — no extra substr needed
        parts.append(F.rpad(F.coalesce(guarded, F.lit("")), width, " "))
    df.select(F.concat(*parts).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_fixed_width(spark: SparkSession, path: str, spec: Spec) -> DataFrame:
    raw = spark.read.text(path)
    cols = []
    pos = 1
    for name, width, typ in spec:
        sl = F.col("value").substr(pos, width)
        if typ == "string":
            # all-blank field = NULL for strings too (r10 review): the
            # writer emits blanks for NULL, so reading them back as ''
            # broke the round-trip contract (isNull filters, coalesce
            # defaults). The format cannot distinguish NULL from '' —
            # the documented all-blank=NULL convention wins.
            sl = F.nullif(F.rtrim(sl), F.lit(""))
        else:
            # nullif first — ANSI mode rejects casting '' to numerics
            sl = F.nullif(F.rtrim(sl), F.lit("")).cast(typ)
        cols.append(sl.alias(name))
        pos += width
    return raw.select(*cols)
