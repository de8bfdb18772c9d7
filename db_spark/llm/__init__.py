"""Large-scale training-data operations (north-star extensions).

Not present in the reference engine (SURVEY §2.4) — these are the
operations a 100 TB training-data pipeline needs, built as first-class
partition-parallel operators: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force +
IVF/LSH), text analysis (language-ID, quality, tokens, fingerprints),
and multimodal column handling.

Design rules: no driver-side materialization, no unbounded cartesian
products, deterministic hash families (md5-derived) so results are
reproducible across engines and runs.
"""

from db_spark.llm import dedup, similarity, text, multimodal  # noqa: F401
