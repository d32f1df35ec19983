"""Composable DataFrame transforms.

Each operator is a function ``DataFrame -> DataFrame`` (plus parameters):
declarative, so Catalyst keeps full visibility for pushdown / join
selection / AQE. Families:

- invoice.py    — the reference's semi-join + write-back pattern (J1/J2)
- relational.py — filters/projections/top-k/set-ops breadth, bounded
                  grouped top-k, salted skew join, compute-spread helper
- dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                  LSH, connected components, keep-first dedup
- similarity.py — cosine top-k (brute force + IVF with k-means centroids)
- textstats.py  — corpus quality/language/token statistics, TF-IDF
- events.py     — event-time windows & sessionization
- asof.py       — point-in-time (as-of) join
- sampling.py   — deterministic splits, stratified sampling
- multimodal.py — binary media columns with REAL stdlib decode kernels,
                  perceptual average-hash image near-dup
- codecs.py — pure-stdlib BMP/PNG/PPM/JPEG/WAV codecs (struct+zlib+numpy)
- quality.py    — declarative data-quality constraint suite (deequ-lite)
- linkage.py    — record linkage: blocked fuzzy matching funnel
- layout.py     — Z-order (Morton) clustering for min-max scan pruning
- sketches.py   — mergeable HLL distinct / GK quantile calibration
- stats.py      — chi-square independence, decimal-exact OLS, one-pass
                  correlation matrix, pre-flight join cardinality
"""
