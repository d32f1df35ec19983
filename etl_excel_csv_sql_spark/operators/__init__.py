"""Composable DataFrame transforms.

Each operator is a function ``DataFrame -> DataFrame`` (plus parameters):
declarative, so Catalyst keeps full visibility for pushdown / join
selection / AQE. Families:

- invoice.py    — the reference's semi-join + write-back pattern (J1/J2)
- relational.py — filters/projections/top-k/set-ops breadth
- dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
- similarity.py — cosine top-k (brute force + LSH-bucketed ANN)
- textstats.py  — corpus quality/language/token statistics
- events.py     — event-time windows & sessionization
- multimodal.py — binary-column plumbing (decode stubs, real Spark shape)
"""
