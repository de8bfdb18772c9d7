"""Partition-invariance evidence: the determinism doctrine (integer
folds, total-order tie-breaks, hash-threshold sampling) claims every
registry result is independent of the physical partitioning. On a
cluster the partition count is whatever AQE and the data size dictate,
so any partition-sensitive operator (a float fold whose order shifts,
a sample keyed on partition id, a tie broken by arrival order) would
return different answers at 100 TB than it does locally — this runs
the most partition-sensitive operator classes under two very different
shuffle-partition settings and requires bit-identical results.

Keys chosen per class: LSH banding (minhash_lsh_pairs), iterative
frontier selection (kcenter), synchronous label propagation
(communities), hash-threshold sampling (stratified_sample,
weighted_sample, temperature_sample), mergeable sketch folds
(hll_distinct, kmv_distinct), cluster-then-dedup (dedup_corpus),
fixed-iteration graph rank (pagerank), grouped near-dup output
(simhash_grouped), and resampling (bootstrap).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"

KEYS = [
    "minhash_lsh_pairs", "kcenter", "communities", "stratified_sample",
    "weighted_sample", "temperature_sample", "hll_distinct",
    "kmv_distinct", "dedup_corpus", "pagerank", "simhash_grouped",
    "bootstrap",
    # r9: scaled-BIGINT k-means fold + within-cell prune (the centroid
    # mean is the partition-order risk the BIGINT fold neutralizes)
    "semantic_dedup",
    # r10: diagonal-grouped island merge — the window-ordered running
    # sum is the partition-order risk (orderBy pa is total within a
    # (pair, diagonal) partition, so it must not be)
    "winnow_spans",
    # r10: integer covariance fold + driver-side bigint power iteration
    # (a float fold here would make the component run-dependent)
    "pca_project",
    # r11: NB training — per-class bucket counts + fixed-point integer
    # log2 (a float log or order-dependent count fold would make the
    # learned weights run-dependent)
    "nb_train",
    # r11: deflated top-k PCA — the deflation chain amplifies any
    # partition sensitivity in the moment fold across components
    "pca_topk",
    # r11: product quantization — per-subspace k-means + ADC, all in
    # exact integer L2 (a float fold or arrival-order tie anywhere in
    # train/encode/score would flip codes)
    "pq_topk",
]


def _rows(spark, key):
    df = entry_mod.queries()[key](spark, SF_DIR)
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.mark.parametrize("key", KEYS)
def test_result_is_partition_invariant(spark, key):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = _rows(spark, key)
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        many = _rows(spark, key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert few == many, (
        f"{key}: result depends on shuffle partitioning "
        f"({len(few)} vs {len(many)} rows after sort)")
