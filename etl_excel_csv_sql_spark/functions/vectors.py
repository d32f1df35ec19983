"""Vector column expressions over array<float>/array<double> embeddings.

Pure built-ins (``zip_with`` + ``aggregate``): per-row O(dim) work inside
codegen, no Python boundary, no shuffle. Dot products accumulate in float64
in array order, so results are bit-deterministic across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Σ aᵢ·bᵢ accumulated left-to-right in double."""
    products = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; null if either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def l2_normalize(a: ColumnOrName) -> Column:
    """Scale to unit norm (pre-normalizing lets cosine top-k become a plain
    dot product, halving per-pair flops in brute-force search)."""
    v = _col(a)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x.cast("double") / n))


def random_hyperplane_signature(a: ColumnOrName, n_planes: int, seed: int = 42) -> Column:
    """SimHash-style LSH signature for cosine: sign pattern of projections
    onto ``n_planes`` pseudo-random hyperplanes, packed into a string key.

    Hyperplane components are derived deterministically from (seed, plane,
    dim) via xxhash64 → uniform in [-1, 1]; identical across executors with
    no broadcast of plane matrices needed.

    .. deprecated:: r16
        Cold reference implementation only — the fold runs as an
        interpreted CodegenFallback per (plane, element), which is why its
        one hot consumer (``dedup.embedding_dup_pairs``) was rewritten in
        r15 to compute all projections in a single codegen posexplode +
        aggregate (same xxhash64 weight formula, bit-identical signs). No
        query path calls this function; new bulk callers should follow the
        ``embedding_dup_pairs`` shape instead (guide §4.1).
    """
    v = _col(a)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: x.cast("double")
                * (
                    (
                        F.xxhash64(F.lit(seed), F.lit(p), i)
                        % F.lit(1_000_003)
                    ).cast("double")
                    / F.lit(1_000_003.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def quantization_scale(a: ColumnOrName, bits: int = 8) -> Column:
    """Symmetric scalar-quantization scale: max(|xᵢ|) / (2^(bits-1) - 1).
    Compute this in its OWN projection before the code transform — an
    array_max referenced inside a per-element lambda is re-evaluated per
    element (the CollapseProject HOF trap)."""
    qmax = (1 << (bits - 1)) - 1
    return (
        F.array_max(F.transform(_col(a), lambda x: F.abs(x.cast("double"))))
        / qmax
    )


def quantize_codes(a: ColumnOrName, scale: ColumnOrName) -> Column:
    """int codes: floor(x/scale + 0.5) — deliberately NOT round(), whose
    tie convention differs across engines (Spark HALF_UP vs half-even);
    floor(+0.5) is identical everywhere. |x| ≤ max|x| keeps codes inside
    ±qmax with no clamp. Zero vectors (scale 0) map to all-zero codes."""
    s = _col(scale)
    return F.when(
        s > 0,
        F.transform(
            _col(a), lambda x: F.floor(x.cast("double") / s + 0.5).cast("int")
        ),
    ).otherwise(F.transform(_col(a), lambda x: F.lit(0)))
