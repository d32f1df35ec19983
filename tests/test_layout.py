"""Z-order layout: correctness of the Morton key and a measured
file-statistics pruning benefit vs a single-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_excel_csv_sql_spark.catalog import load_table
from etl_excel_csv_sql_spark.operators import layout


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", layout.zorder_value(F.col("a"), F.col("b")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_minmax_bucket_clamps_and_degenerates(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "x double")
    out = df.select(
        layout.minmax_bucket(
            F.col("x"), F.lit(0.0), F.lit(100.0), bits=4
        ).alias("b")
    ).collect()
    assert [r["b"] for r in out] == [0, 8, 15]  # hi clamps to 2^bits - 1
    degen = df.select(
        layout.minmax_bucket(F.col("x"), F.lit(7.0), F.lit(7.0), bits=4).alias("b")
    ).collect()
    assert all(r["b"] == 0 for r in degen)


def _file_spans(path: str, col_a: str, col_b: str):
    """Per-file (min,max) span on both columns, normalized by the global
    range — the quantity min-max pruning actually uses."""
    spans = []
    mins_a, maxs_a, mins_b, maxs_b = [], [], [], []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ia, ib = schema_names.index(col_a), schema_names.index(col_b)
        lo_a = min(md.row_group(g).column(ia).statistics.min for g in range(md.num_row_groups))
        hi_a = max(md.row_group(g).column(ia).statistics.max for g in range(md.num_row_groups))
        lo_b = min(md.row_group(g).column(ib).statistics.min for g in range(md.num_row_groups))
        hi_b = max(md.row_group(g).column(ib).statistics.max for g in range(md.num_row_groups))
        spans.append((lo_a, hi_a, lo_b, hi_b))
        mins_a.append(lo_a); maxs_a.append(hi_a)
        mins_b.append(lo_b); maxs_b.append(hi_b)
    ga = (min(mins_a), max(maxs_a))
    gb = (min(mins_b), max(maxs_b))
    norm = []
    for lo_a, hi_a, lo_b, hi_b in spans:
        norm.append(
            (
                (hi_a - lo_a) / max(ga[1] - ga[0], 1e-12),
                (hi_b - lo_b) / max(gb[1] - gb[0], 1e-12),
            )
        )
    return norm


def test_zorder_write_tightens_both_dims(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zord")
    spath = str(tmp_path / "singlesort")
    layout.write_zordered(orders, zpath, "o_custkey", "o_totalprice", num_files=16)
    (
        orders.repartitionByRange(16, F.col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    z_spans = _file_spans(zpath, "o_custkey", "o_totalprice")
    s_spans = _file_spans(spath, "o_custkey", "o_totalprice")
    z_mean_a = sum(s[0] for s in z_spans) / len(z_spans)
    z_mean_b = sum(s[1] for s in z_spans) / len(z_spans)
    s_mean_b = sum(s[1] for s in s_spans) / len(s_spans)

    # single-column sort leaves the OTHER dim unpruned: each file spans
    # ~the whole o_totalprice range
    assert s_mean_b > 0.8
    # z-order keeps BOTH dims materially narrower than full range — a
    # band filter on either column can skip most files via stats alone
    assert z_mean_a < 0.6
    assert z_mean_b < 0.6

    # correctness: layout changes bytes, not rows
    assert spark.read.parquet(zpath).count() == orders.count()


# ------------------------------------------------------------- Hilbert


def test_hilbert_index_matches_reference_xy2d(spark):
    """The Catalyst fold vs the classic xy2d reference on random
    points — bit-exactness of the curve."""
    import random

    from etl_excel_csv_sql_spark.operators.layout import hilbert_index

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(11)
    pts = [(0, 0), (255, 255), (1, 0), (0, 1)] + [
        (rng.randrange(256), rng.randrange(256)) for _ in range(200)
    ]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", hilbert_index(F.col("x"), F.col("y"), bits=8).alias("h")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == xy2d(256, x, y), (x, y)


def test_hilbert_is_a_bijection_on_the_grid(spark):
    from etl_excel_csv_sql_spark.operators.layout import hilbert_index

    n = 32  # 5-bit grid: all 1024 cells
    df = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    hs = df.select(
        hilbert_index(F.col("x"), F.col("y"), bits=5).alias("h")
    )
    agg = hs.agg(
        F.countDistinct("h").alias("d"), F.min("h").alias("lo"),
        F.max("h").alias("hi"),
    ).collect()[0]
    assert (agg["d"], agg["lo"], agg["hi"]) == (n * n, 0, n * n - 1)


def test_hilbert_locality_beats_zorder(spark):
    """The reason to prefer Hilbert: walking the curve in index order,
    the total spatial jump (Manhattan distance between consecutive
    cells) is exactly 1 per step for Hilbert; Morton/z-order jumps at
    quadrant seams. Measure both on the full 5-bit grid."""
    from etl_excel_csv_sql_spark.operators.layout import (
        hilbert_index,
        zorder_value,
    )
    from pyspark.sql import Window as W

    n = 32
    df = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    both = df.select(
        "x", "y",
        hilbert_index(F.col("x"), F.col("y"), bits=5).alias("h"),
        zorder_value(F.col("x"), F.col("y")).alias("z"),
    )

    def total_jump(col):
        w = W.orderBy(col)
        stepped = both.select(
            (F.abs(F.col("x") - F.lag("x").over(w))
             + F.abs(F.col("y") - F.lag("y").over(w))).alias("jump")
        )
        return stepped.agg(F.sum("jump")).collect()[0][0]

    hilbert_jump = total_jump("h")
    z_jump = total_jump("z")
    assert hilbert_jump == n * n - 1  # unit steps: the defining property
    assert z_jump > hilbert_jump * 1.5


def test_hilbert_write_tightens_both_dims_at_least_as_well(spark, sf_dir, tmp_path):
    """The file-stat view of the locality claim: a Hilbert-ordered
    write must bound BOTH dims per file like z-order does (each file a
    small rectangle), and its total normalized span must not be worse
    than the Morton layout's on the same data / file count."""
    from etl_excel_csv_sql_spark.operators.layout import with_hilbert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    hpath = str(tmp_path / "hilb")
    zpath = str(tmp_path / "zord")
    hdf = with_hilbert(orders, "o_custkey", "o_totalprice", bits=8)
    (
        hdf.repartitionByRange(16, F.col("hvalue"))
        .sortWithinPartitions("hvalue")
        .drop("hvalue")
        .write.mode("overwrite")
        .parquet(hpath)
    )
    layout.write_zordered(
        orders, zpath, "o_custkey", "o_totalprice", num_files=16
    )
    h_spans = _file_spans(hpath, "o_custkey", "o_totalprice")
    z_spans = _file_spans(zpath, "o_custkey", "o_totalprice")
    h_mean_a = sum(s[0] for s in h_spans) / len(h_spans)
    h_mean_b = sum(s[1] for s in h_spans) / len(h_spans)
    z_total = sum(s[0] + s[1] for s in z_spans) / len(z_spans)
    h_total = sum(s[0] + s[1] for s in h_spans) / len(h_spans)
    assert h_mean_a < 0.6 and h_mean_b < 0.6  # rectangles, not stripes
    assert h_total <= z_total * 1.1  # at least as tight as Morton
    assert spark.read.parquet(hpath).count() == orders.count()
