"""End-to-end corpus curation: the standard pre-training recipe as ONE
composable, deterministic operator.

``curate`` chains the tier's primitives in the cost-correct order —
cheap map-only stages first so every expensive stage runs on an
already-shrunk corpus:

1. normalize   — canonical whitespace/punctuation (map-only)
2. quality gate — composite score as integer ppm, threshold compare
                  (map-only; the score column rides along for stage 4)
3. decontaminate — drop the eval docs themselves, then every training
                  doc sharing an n-gram with the eval set (one
                  broadcast semi-join against the tiny eval gram set)
4. near-dup keep-best — MinHash-LSH pairs -> connected components ->
                  keep each cluster's highest-quality member

Everything is built from the deterministic md5 hash family and
integer-ppm comparisons, so the SURVIVOR SET of the whole pipeline is
oracle-checkable end to end (the driver query `curate_corpus` hash-
compares it against a single composed DuckDB query).

At 100 TB the shape is: two map-only passes, one broadcast semi-join,
then the LSH/dedup machinery on the reduced corpus — the expensive
candidate generation never sees rows the cheap gates already dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from db_spark.llm import corpus as _corpus
from db_spark.llm import dedup as _dedup
from db_spark.llm import text as _text


def curate(
    docs: DataFrame, *,
    quality_min: float = 0.5,
    eval_df: DataFrame | None = None,
    decontam_n: int = 4,
    dedup_threshold: float | None = 0.5,
    k: int = 16, bands: int = 4,
    normalize: bool = True,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Run the curation recipe; returns the surviving docs with their
    (normalized) text and a ``quality_ppm`` column.

    ``quality_min`` is compared as integer ppm — no float at the gate.
    ``eval_df`` (optional) is removed from the corpus by id AND used as
    the decontamination reference (its text is normalized under the
    same flag so gram matching sees the same canon). Pass
    ``dedup_threshold=None`` to skip the near-dup stage."""
    out = docs
    if normalize:
        out = out.withColumn(text_col, _text.normalize_text(F.col(text_col)))
    ppm = F.round(
        F.least(F.lit(1.0), F.greatest(
            F.lit(0.0), _text.quality_score(F.col(text_col)))) * 1_000_000
    ).cast("long")
    out = (out.withColumn("quality_ppm", ppm)
           .filter(F.col("quality_ppm") >= int(round(quality_min * 1_000_000))))
    if eval_df is not None:
        ev = eval_df
        if normalize:
            ev = ev.withColumn(text_col, _text.normalize_text(F.col(text_col)))
        out = out.join(ev.select(id_col), id_col, "left_anti")
        contaminated = _corpus.decontaminate(
            out, ev, n=decontam_n, id_col=id_col, text_col=text_col)
        out = out.join(contaminated.select(id_col), id_col, "left_anti")
    if dedup_threshold is not None:
        # score from the already-computed ppm: select_representatives
        # re-rounds clamp(score)*1e6, and ppm/1e6 round-trips exactly
        out = _dedup.dedup_corpus_keep_best(
            out, F.col("quality_ppm").cast("double") / 1_000_000.0,
            id_col=id_col, text_col=text_col, k=k, bands=bands,
            threshold=dedup_threshold)
    return out
