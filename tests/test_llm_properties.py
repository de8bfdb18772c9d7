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


# ---------------------------------------------------------------------------
# round-11 primitives: interval-merge removal and the fixed-point log2
# ---------------------------------------------------------------------------

SPANS = st_.lists(
    st_.tuples(st_.integers(0, 3),                       # doc id
               st_.integers(-2, 20), st_.integers(0, 8)  # start, length-ish
               ).map(lambda t: (t[0], t[1], t[1] + t[2])),
    min_size=0, max_size=10)


@given(spans=SPANS)
@_settings
def test_remove_char_spans_matches_python_reference(spark, spans):
    """For ANY set of (possibly overlapping, duplicated, out-of-range)
    ranges, the relational merge-and-cut must equal a direct python
    interval sweep over the same documents — including boundary clip,
    adjacency coalescing, full coverage, and untouched pass-through."""
    texts = {0: "abcdefghijkl", 1: "xy", 2: "", 3: "0123456789"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    schema = "id long, char_start long, char_end long"
    sdf = (spark.createDataFrame(spans, schema)
           if spans else spark.createDataFrame([], schema))
    got = {r["doc_id"]: (r["text"], r["n_spans_cut"], r["chars_removed"])
           for r in dedup.remove_char_spans(docs, sdf).collect()}

    for did, text in texts.items():
        n = len(text)
        raw = sorted(set((max(s, 1), min(e, n))
                         for d, s, e in spans
                         if d == did and max(s, 1) <= min(e, n)))
        merged = []
        for s, e in raw:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        kept, prev = [], 0
        for s, e in merged:
            kept.append(text[prev:s - 1])
            prev = e
        kept.append(text[prev:])
        want = ("".join(kept), len(merged),
                sum(e - s + 1 for s, e in merged))
        assert got[did] == want, (did, got[did], want)


@given(xs=st_.lists(st_.integers(1, 2**62 - 1), min_size=1, max_size=6))
@_settings
def test_ilog2_fp256_layers_match_python_replay(spark, xs):
    """The shared Spark/DuckDB fixed-point log2 generator must compute
    (bitlen-1)*256 + 8 square-and-compare bits exactly as the python
    replay, for arbitrary int64-range inputs, and be monotone."""
    from db_spark.llm.text import _spark_shl, ilog2_fp256_layers

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                               "i long, x long")
    cur = df
    for layer in ilog2_fp256_layers([("x", "lx")], "div", _spark_shl):
        cur = cur.selectExpr("*", *layer)
    got = {r["i"]: r["lx"] for r in cur.select("i", "lx").collect()}

    def ref(x):
        i = x.bit_length() - 1
        m = (x << (20 - i)) if i <= 20 else (x >> (i - 20))
        frac = 0
        for _ in range(8):
            m = m * m
            if m >= 1 << 41:
                frac, m = frac * 2 + 1, m >> 21
            else:
                frac, m = frac * 2, m >> 20
        return i * 256 + frac

    for i, x in enumerate(xs):
        assert got[i] == ref(x)
    pairs = sorted(zip(xs, [got[i] for i in range(len(xs))]))
    assert all(a[1] <= b[1] for a, b in zip(pairs, pairs[1:]))
