"""Property-based tests (hypothesis) for the round-5 curation ops:
for ANY corpus, the prefix-filtered exact similarity join must equal
the unfiltered brute force (losslessness is a theorem — test it like
one), and weighted sampling must be a deterministic, weight-respecting
k-subset. Small example counts — each example runs Spark jobs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st_
from pyspark.sql import functions as F

from db_spark.llm import corpus, dedup

_settings = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])

# Documents over a tiny vocabulary: maximizes shared shingles (the
# adversarial regime for prefix filtering — many ties in the global
# rarity order, candidates everywhere).
WORDS = ["a", "b", "c", "d"]
DOC = st_.lists(st_.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)
CORPUS = st_.lists(DOC, min_size=0, max_size=8)
THRESH = st_.sampled_from([0.2, 0.5, 0.8, 1.0])


def _docs(spark, texts):
    if not texts:
        return spark.createDataFrame([], "doc_id long, text string")
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


@given(texts=CORPUS, t=THRESH)
@_settings
def test_jaccard_join_lossless(spark, texts, t):
    df = _docs(spark, texts)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in dedup.jaccard_similarity_join(df, t).collect()}
    want = {(r["id_a"], r["id_b"], round(r["jaccard"], 6))
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=t, max_shingle_df=None,
                group_identical=False).collect()}
    assert got == want


@given(texts=CORPUS, t=THRESH)
@_settings
def test_ngram_grouping_lossless(spark, texts, t):
    """Identical-set grouping inside ngram_jaccard_pairs is exact: the
    tiny vocabulary makes duplicate texts (whole identical-set groups)
    common, which is precisely the regime the fast path rewrites."""
    df = _docs(spark, texts)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in dedup.ngram_jaccard_pairs(
               df, threshold=t, max_shingle_df=None).collect()}
    want = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=t, max_shingle_df=None,
                group_identical=False).collect()}
    assert got == want


@given(weights=st_.lists(
    st_.integers(min_value=0, max_value=9), min_size=0, max_size=30),
    k=st_.sampled_from([1, 3, 10]))
@_settings
def test_weighted_sample_contract(spark, weights, k):
    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = (spark.createDataFrame(rows, "doc_id long, w double") if rows
          else spark.createDataFrame([], "doc_id long, w double"))
    out = corpus.weighted_sample(df, F.col("w"), k).collect()
    ids = [r["doc_id"] for r in out]
    eligible = [i for i, w in enumerate(weights) if w > 0]
    # exactly min(k, eligible) distinct rows, all with positive weight
    assert len(ids) == len(set(ids)) == min(k, len(eligible))
    assert set(ids) <= set(eligible)
    # sample keys are non-increasing in selection order
    keys = [r["sample_key"] for r in out]
    assert keys == sorted(keys, reverse=True)
    # deterministic under repartition
    ids2 = {r["doc_id"] for r in corpus.weighted_sample(
        df.repartition(4), F.col("w"), k).collect()}
    assert ids2 == set(ids)


# ---------------------------------------------------------------------------
# DBSCAN role/cluster consistency vs a brute-force reference
# ---------------------------------------------------------------------------

VEC = st_.lists(st_.integers(-3, 3), min_size=3, max_size=3)


@given(vecs=st_.lists(VEC, min_size=2, max_size=8))
@_settings
def test_dbscan_matches_bruteforce_reference(spark, vecs):
    import math

    from hypothesis import assume

    from db_spark.llm.similarity import dbscan

    assume(all(any(x != 0 for x in v) for v in vecs))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # max_hamming = n_bits disables blocking loss: candidate set == all
    # pairs, so the engine must equal the brute-force reference exactly
    got = {r["vec_id"]: (r["cluster_id"], r["role"]) for r in dbscan(
        df, threshold=0.9, min_pts=2, dim=3, n_bits=16,
        max_hamming=16).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    n = len(rows)
    adj = {i: set() for i in range(n)}
    for i in range(n):
        for j in range(i + 1, n):
            if cos(rows[i][1], rows[j][1]) >= 0.9:
                adj[i].add(j)
                adj[j].add(i)
    core = {i for i in range(n) if len(adj[i]) >= 2}
    # components over core-core adjacency, label = min member
    label = {}
    for c in sorted(core):
        if c in label:
            continue
        stack, comp = [c], set()
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(y for y in adj[x] if y in core)
        m = min(comp)
        for x in comp:
            label[x] = m
    for i in range(n):
        if i in core:
            assert got[i] == (label[i], "core")
        else:
            bclusters = [label[j] for j in adj[i] if j in core]
            if bclusters:
                assert got[i] == (min(bclusters), "border")
            else:
                assert got[i] == (None, "noise")


# Winnowing guarantee (Schleimer et al. SIGMOD'03, Theorem in §3): any
# two documents sharing a token run of length >= k + w - 1 share at
# least one selected fingerprint. With value-set selection the argument
# is direct — the run's w consecutive grams form one complete window in
# EACH doc, the window contents are identical, so its minimum hash is
# selected in both. The property test embeds a random shared run at
# random offsets inside random noise and asserts the intersection.
_K, _W = 3, 3
RUN_WORDS = ["red", "blue", "green", "gold", "iron", "opal", "jade",
             "onyx", "ruby", "teal", "plum", "sage"]
RUN = st_.lists(st_.sampled_from(RUN_WORDS), min_size=_K + _W - 1,
                max_size=_K + _W - 1)
PAD = st_.lists(st_.sampled_from(RUN_WORDS), min_size=0, max_size=6)


@given(run=RUN, pa=PAD, sa=PAD, pb=PAD, sb=PAD)
@_settings
def test_winnowing_guarantee(spark, run, pa, sa, pb, sb):
    df = spark.createDataFrame(
        [(1, " ".join(pa + run + sa)), (2, " ".join(pb + run + sb))],
        "doc_id long, text string")
    fps = dedup.winnow_fingerprints(df, k=_K, w=_W, output="fps").collect()
    a = {r["fingerprint"] for r in fps if r["doc_id"] == 1}
    b = {r["fingerprint"] for r in fps if r["doc_id"] == 2}
    assert a & b, "shared (k+w-1)-token run must share a fingerprint"
