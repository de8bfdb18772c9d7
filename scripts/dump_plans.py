"""Regenerate docs/PLANS.md: formatted physical plans for the headline
and custom operators, with what-to-look-for commentary."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from db_spark.session import get_spark


PICKS = {
    "pricing_summary": (E.q_pricing_summary,
        "One scan, partial+final hash aggregate, single exchange on the 2 "
        "group keys. Scaled-long sums stay inside WholeStageCodegen."),
    "local_supplier_volume": (E.q_local_supplier_volume,
        "Six-way join: fact scan + five broadcast joins incl. the "
        "local-supplier residual on c_nationkey=s_nationkey — no "
        "shuffle until the final 5-group aggregate."),
    "multi_join": (E.q_multi_join,
        "Three BroadcastHashJoins (customer/nation/region dims), 2-column "
        "pruned fact scan, one exchange for the final aggregate."),
    "filter": (E.q_filter,
        "All three predicates reach the parquet reader (PushedFilters) and "
        "only the 4 projected columns are read (ReadSchema)."),
    "asof_join": (E.q_asof_join,
        "Union-tag + running last_value window: ONE shuffle on (key, time); "
        "no range explosion, no per-row rescans."),
    "minhash_lsh_pairs": (E.q_minhash_lsh_pairs,
        "Band-bucket self-join on band signatures — candidate generation "
        "never forms the full pair matrix."),
    "hypertable_rollup": (E.q_hypertable_rollup,
        "Partition-pruned rollup read unioned with raw-tail partials, one "
        "final merge aggregate — cost O(buckets), not O(raw rows)."),
    "late_shipment_priority": (E.q_late_shipment_priority,
        "Decorrelated EXISTS: LeftSemi join with the non-equi residual "
        "evaluated inside the join — one pass over lineitem, no per-order "
        "rescans; orders date filter pushed to the scan."),
    "large_orders": (E.q_large_orders,
        "Aggregate-subquery semi join: lineitem pre-aggregated to "
        "qualifying orderkeys, broadcast to orders — the fact table is "
        "never shuffled on the join key."),
    "simhash_near_dup": (E.q_simhash_near_dup,
        "Pigeonhole blocking: segment-bucket self-join (4 segment keys per "
        "doc) — candidate generation is an equi-join, never a cartesian "
        "Hamming scan."),
    "simhash_grouped": (E.q_simhash_grouped,
        "Grouped consumption form: the same distinct-signature segment "
        "join, but output is one row per rep pair + per-group self rows — "
        "no O(g^2) member-pair expansion stage; output volume follows "
        "distinct signatures (sf1: 61K rows vs 8.5M expanded)."),
    "video_features": (E.q_video_features,
        "Map-only end to end: payload construction is pure Column "
        "expressions over the scan, decode runs in one Arrow-batched "
        "mapInPandas — zero exchanges, no driver collection."),
    "chunk_docs": (E.q_chunk_docs,
        "Map-only chunking: tokenize → sequence → slice → explode as one "
        "projection over the scan — zero exchanges; 100 TB chunking is "
        "embarrassingly parallel."),
    "pack_sequences": (E.q_pack_sequences,
        "One exchange on the shard key, window cumsum within shards, one "
        "final aggregate — the sequential region is bounded to 1/shards "
        "of the corpus."),
    "decontaminate": (E.q_decontaminate,
        "Eval n-gram set is BroadcastExchange'd into a broadcast hash join "
        "against the train posting list — the corpus is scanned once and "
        "never shuffled on the gram key."),
    "bm25_topk": (E.q_bm25_topk,
        "Postings-only shuffle: the IN-filter on query terms runs before "
        "the exchange; df stats and corpus stats are broadcast; top-k is "
        "TakeOrderedAndProject, not a global sort."),
    "span_dup": (E.q_span_dup,
        "Two-pass shape (like surprisal/BM25): pass 1 aggregates window "
        "hashes to the dup set, pass 2 rebuilds windows and joins the "
        "broadcast dup set — recomputing beats caching a table with one "
        "row per corpus token; int64 hash keys, no pair enumeration."),
    "temperature_sample": (E.q_temperature_sample,
        "Counts aggregate to |groups| rows, broadcast back; acceptance is "
        "a map-only ppm hash filter over the scan — no corpus shuffle."),
    "redact_pii": (E.q_redact_pii,
        "A single Project of chained regex passes over the scan — zero "
        "exchanges; scrubbing is scan-bound at any scale."),
    "kmv_merge": (E.q_kmv_merge,
        "Sharded bottom-k: per-group distinct hashes are the only "
        "corpus-cardinality exchange; both rank passes are bounded "
        "windows (salt cells, then <= shards*k survivors); the merge "
        "input is <= 2k rows per group."),
    "cm_heavy_hitters": (E.q_cm_heavy_hitters,
        "Count-min: one explode into a bounded-key (depth x width) "
        "hash aggregate; estimates join vocabulary-cardinality probes "
        "against the cell table — reduce side never scales with the "
        "corpus."),
    "hist_quantiles": (E.q_hist_quantiles,
        "Equi-width histogram: map-side bucket assignment into a "
        "<= buckets-per-group aggregate; the quantile window runs over "
        "the bounded cell set, never the data."),
    "bloom_prefilter": (E.q_bloom_prefilter,
        "Bloom build is an explode into a <= bits/32-row bit_or "
        "aggregate; membership is a probe-cardinality hash join "
        "against the bounded word table."),
    "forecast_revenue": (E.q_forecast_revenue,
        "TPC-H Q6: all five predicate bounds in PushedFilters, 4-column "
        "ReadSchema, one partial+final global aggregate — the scan IS "
        "the query."),
    "market_share": (E.q_market_share,
        "TPC-H Q8: the fact table joins part/orders/customer-region/"
        "supplier-nation entirely via BroadcastHashJoin — zero "
        "sort-merge joins; numerator and denominator share one scan "
        "as a conditional aggregate."),
    "gapfill_locf": (E.q_gapfill_locf,
        "Hourly aggregate is the only data-sized stage; the generated "
        "hour x type grid and the LOCF window run on dashboard-sized "
        "rows (|types| x 24)."),
    "fuzzy_join": (E.q_fuzzy_join,
        "Similarity on the DISTINCT-name dictionary: HashAggregate "
        "below a broadcast non-equi self-join — the fact table "
        "contributes one distinct aggregate, never a pair join."),
    "zscore_outliers": (E.q_zscore_outliers,
        "Grouped integer moments broadcast back onto the scan; the "
        "exceedance count is a second map-side aggregate — two scans, "
        "no window, no sort."),
    "event_funnel_windowed": (E.q_event_funnel_windowed,
        "Min-cascade with the 24 h conversion bound as a join residual "
        "— per-stage shuffle volume is still only that step's events."),
    "copurchase_pairs": (E.q_copurchase_pairs,
        "Pair self-join keyed on l_orderkey (quadratic in order size "
        "only); top-20 is TakeOrderedAndProject, never a global sort."),
    "salted_join_agg": (E.q_salted_join_agg,
        "Catastrophic 3-key skew: the salt-replicated dim broadcasts, "
        "hot keys shard over 16 sub-keys — no sort-merge shuffle of "
        "the fact, and the oracle proves salting is result-invisible."),
    "range_frame_agg": (E.q_range_frame_agg,
        "One shuffle on event_type; the trailing-hour RANGE frame is "
        "integer-microsecond arithmetic inside the window sort."),
    "min_cost_supplier": (E.q_min_cost_supplier,
        "TPC-H Q2: the lineitem-derived supply aggregate is the only "
        "data-sized exchange; part and EUROPE-supplier dims broadcast; "
        "the per-part correlated MIN is a window on the filtered rows, "
        "never a second scan; top-100 is TakeOrderedAndProject."),
    "excess_supply": (E.q_excess_supply,
        "TPC-H Q20: both the 1997 and all-time quantity sums come out "
        "of ONE grouped pass (conditional sum) — no self-join of "
        "lineitem; the supplier filter is a left-semi join."),
    "hll_merge": (E.q_hll_merge,
        "HLL: per-half register tables are bounded (<= 256 rows per "
        "group); merge and estimate aggregate those, so the only "
        "corpus-cardinality work is the two hash passes."),
    "sessionize": (E.q_sessionize,
        "ONE exchange keyed by user feeds the lag window, the running "
        "sum, and the final session aggregate — Catalyst reuses the "
        "partitioning across all three."),
    "scd2": (E.q_scd2,
        "Tie-dedup, change-collapse, and valid_to lead all ride one "
        "user-keyed sort — no self-joins, no second exchange."),
    "ewma": (E.q_ewma,
        "Eight lag terms share one window sort per user; the weight "
        "chain is a single Project — no extra exchanges per term."),
    "pagerank": (E.q_pagerank,
        "Per iteration: src-keyed join, dst-keyed sum, left join onto "
        "the node list; localCheckpoint truncates lineage so the plan "
        "stays iteration-sized."),
    "gapfill_interp": (E.q_gapfill_interp,
        "Same shape as LOCF: the hourly aggregate is the only "
        "data-sized stage; both IGNORE NULLS bracket scans run on the "
        "|types| x 24 grid."),
    "mad_outliers": (E.q_mad_outliers,
        "Two group-keyed sorts (cents, then deviations); medians come "
        "from explicit rank positions and broadcast back — no "
        "percentile UDAF, no global sort."),
    "skyline": (E.q_skyline,
        "2D Pareto frontier without the quadratic dominance anti-join: "
        "min-per-distinct-x aggregate, strict-prefix running-min window "
        "over distinct x only, one join back. No cartesian anywhere."),
    "token_budget": (E.q_token_budget,
        "Hash-cell subtotals (|groups| x cells) broadcast back to "
        "classify cells; only the one boundary cell per group pays the "
        "per-doc cumulative window."),
    "keywords_tfidf": (E.q_keywords_tfidf,
        "tf aggregate on the distinct (doc, term) set, vocab-sized df "
        "stats broadcast back, per-doc rank window — shuffled volume is "
        "the pair set, not the token stream."),
    "centroid_outliers": (E.q_centroid_outliers,
        "(group, component) scaled-BIGINT aggregate, centroids "
        "broadcast onto a single distance scan, per-group rank window. "
        "No pairwise step exists in the plan."),
    "psi_drift": (E.q_psi_drift,
        "Two pruned histogram scans; the bucket-spine joins and totals "
        "broadcast — everything after the scans runs on 16 rows."),
    "kmv_set_ops": (E.q_kmv_set_ops,
        "Two sharded bottom-k sketch builds; the merge/membership/rank "
        "stages all run on <= 2k rows per group."),
    "jaccard_join": (E.q_jaccard_join,
        "Prefix-filtered exact set-similarity join: shingle-df count, "
        "per-doc rarity-rank window, prefix-on-shingle self-join, "
        "pair-keyed intersection count. No all-pairs stage; candidate "
        "volume follows rare-shingle frequencies."),
    "mmr_rerank": (E.q_mmr_rerank,
        "k greedy rounds over the bounded ANN candidate list; each "
        "round a remaining-x-selected pairwise join capped at "
        "|cand|*k rows, then per-query struct-argmax. localCheckpoint "
        "keeps the plan round-sized; the corpus never re-enters."),
    "weighted_sample": (E.q_weighted_sample,
        "Map-only A-ES key computation then TakeOrderedAndProject — "
        "per-partition heaps, k rows to one reducer, no global sort."),
    "curate_corpus": (E.q_curate_corpus,
        "The end-to-end recipe: two map-only gates and a broadcast "
        "semi-join shrink the corpus before the LSH band join runs; "
        "the dedup stages shuffle only survivor-derived keys."),
    "dedup_keep_best": (E.q_dedup_keep_best,
        "Same LSH/components plan as dedup_corpus plus one "
        "membership-sized quality join and a cluster-keyed struct-max "
        "— selection never touches the corpus scan."),
    "skipgram_counts": (E.q_skipgram_counts,
        "Positions assigned once, center side explodes map-only into 2w "
        "targets, ONE (doc, position) equi-join — O(tokens*2w), no "
        "nested-loop pair enumeration."),
    "seasonal_decompose": (E.q_seasonal_decompose,
        "Trend window sums scaled BIGINTs inside the ROWS frame; the "
        "decomposition runs on the |types x hours| series - the hourly "
        "aggregate is the only data-sized stage."),
    "dq_report": (E.q_dq_report,
        "All row-local rules fold into ONE conditional-aggregate scan "
        "(exploded back to per-rule rows); unique is one hash "
        "aggregate; the FK check is a broadcast anti-join count."),
    "interval_join": (E.q_interval_join,
        "Both interval sides explode into covering bins, equi-join on "
        "(custkey, bin), first-shared-bin predicate dedups long "
        "overlaps with no distinct exchange."),
    "hashed_features": (E.q_hashed_features,
        "Map-only explode into one (doc, index) aggregate - no "
        "vocabulary state anywhere in the plan."),
    "importance_sample": (E.q_importance_sample,
        "Map-only: the quality rate and the ppm threshold fold into a "
        "single Filter over the scan — no exchange, no join, no window."),
    "attribution": (E.q_attribution,
        "One per-user window pass carrying the touch struct "
        "(ignorenulls, strictly-before frame) — NO join operator "
        "anywhere; the aggregate runs on conversion rows only."),
    "linreg": (E.q_linreg,
        "Grouped OLS = ONE partial+final hash aggregate of five "
        "DECIMAL(38) moment sums; the slope/R2 finale is a projection "
        "on |groups| rows. No second scan, no centering pass."),
    "hybrid_rrf": (E.q_hybrid_rrf,
        "Both rankers keep their own scale shapes (BM25 postings join "
        "+ TakeOrderedAndProject; cosine scan + broadcast query); "
        "fusion is a union + hash agg + rank window over <= 40 rows."),
    "cusum": (E.q_cusum,
        "Change detection as two window passes over the aggregated "
        "series (cumsum, then running min) after a broadcast "
        "|keys|-row target join — no fold, no iteration."),
    "kcore": (E.q_kcore,
        "Fixed-round peeling: the final plan is round-3's degree "
        "filter + two semi-joins over the (checkpointed) shrunken "
        "edge list — earlier rounds are truncated by localCheckpoint."),
    "winnow_spans": (E.q_winnow_spans,
        "Passage alignment with NO dynamic programming: anchors come "
        "from the fingerprint-blocked occurrence join (df-capped, "
        "plan-cached hits table), and the (pair, diagonal) island "
        "merge is one lag + running-sum window — verbatim runs keep "
        "a constant diagonal, so alignment is linear in anchors."),
    "pca_project": (E.q_pca_project,
        "Linear algebra as three bounded stages: double-Generate outer "
        "product (map-only, no self-join), ONE exchange at dim^2 "
        "cardinality (corpus-independent), exact bigint power "
        "iteration on the collected model-sized moments, then a "
        "map-only literal-dot projection."),
    "classifier_score": (E.q_classifier_score,
        "Model application at 100 TB: the dim-bounded weight table "
        "BroadcastExchange's into the hashed-feature stream (map-only "
        "unigram+bigram explode), one doc-keyed aggregate ends the "
        "plan — the corpus is never shuffled on a model key."),
    "mjpeg_features": (E.q_mjpeg_features,
        "Compressed-video decode as a 100 TB join shape: the 256-row "
        "MJPEG-AVI lookup BroadcastExchange's onto the scan (one BHJ, "
        "zero fact shuffles) and the JPEG Huffman+IDCT decode runs in "
        "one Arrow-batched mapInPandas — payloads never leave the "
        "executors."),
    "nb_train": (E.q_nb_train,
        "In-engine model TRAINING at 100 TB: one map-only n-gram "
        "explode into a single aggregate at feature-bucket (dim) "
        "cardinality; the fixed-point integer log2 is 11 chained "
        "projections over the dim-sized counts — the corpus is "
        "scanned once and never shuffled on anything wider than the "
        "bucket id."),
    "pca_topk": (E.q_pca_topk,
        "Same distributed shape as pca_project regardless of k: ONE "
        "dim^2-cardinality exchange for the moments, deflation "
        "driver-side on the model-sized matrix, then one map-only "
        "projection pass emitting all k columns (three literal-dot "
        "aggregates over a single explode)."),
    "winnow_cut": (E.q_winnow_cut,
        "Detect-then-cut composition: the winnow_spans subplan feeds "
        "a SPAN-cardinality interval-merge window, one join against "
        "the corpus, and an (id) aggregate whose per-group state is "
        "the document's segment list — removal adds no corpus-sized "
        "shuffle beyond the detection it consumes."),
    "pq_topk": (E.q_pq_topk,
        "PQ/ADC: k-means assignment is a BROADCAST codebook join at "
        "component cardinality (the inherent k-means FLOPs); search "
        "joins corpus CODES (m rows per vector) against broadcast "
        "per-query distance tables and sums m lookups — the raw "
        "embeddings never re-enter the plan after encoding."),
    "ivfpq_topk": (E.q_ivfpq_topk,
        "IVFADC composition: the coarse assignment is one broadcast "
        "centroid cross join + per-vector argmax window; residuals "
        "are a BIGINT subtraction inside the component join (never a "
        "float fold); the shared residual codebook trains at "
        "component x n_codes cardinality, and search joins probed-"
        "cell CODES against broadcast (query, cell) distance tables "
        "— every exchange is at code/model cardinality, the raw "
        "embeddings are read once."),
    "winnow_probe": (E.q_winnow_probe,
        "Incremental probe: the corpus side is a parquet scan of the "
        "persisted (id, fingerprint, pos) hits — NO text column in "
        "any ReadSchema — joined per fingerprint against the delta "
        "batch's freshly-computed hits; the span merge windows run "
        "at anchor cardinality partitioned by (pair, diagonal)."),
    "pq_sampled": (E.q_pq_sampled,
        "Bounded-sample training: the pick is ONE TakeOrdered (top-n "
        "heap on the salted id-hash — no global sort "
        "materialization) broadcast into a semi-join; the k-means "
        "chain then runs at SAMPLE component cardinality while "
        "encode/ADC still cover the full corpus."),
    "curate_corpus_v2": (E.q_curate_corpus_v2,
        "Six-stage composition with lineage truncated at the two "
        "stage boundaries (localCheckpoint = the natural "
        "materialization points): normalize + NB-train + classifier "
        "gate are map passes plus one dim-bounded aggregate and a "
        "broadcast model join; decontamination a broadcast semi-"
        "join; the winnow cut and LSH dedup run their blocked joins "
        "on the already-shrunk survivor checkpoint."),
    "pq_subspace_var": (E.q_pq_subspace_var,
        "OPQ-lite diagnostic: one Generate (component explode) into "
        "ONE exchange at (subspace, pos) cardinality — dim rows, "
        "corpus-independent — then a dim-row window for the share "
        "division. Nothing corpus-sized ever shuffles."),
}


def main():
    spark = get_spark(app_name="plans", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = [
        "# PLANS — physical-plan evidence for headline + custom operators",
        "",
        "Generated by `scripts/dump_plans.py` at sf0.01 (plans are scale-",
        "invariant in shape; only statistics change). Things to look for:",
        "`PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` for dims,",
        "single `Exchange` per aggregation, `WholeStageCodegen` spans.", "",
    ]
    for name, (fn, note) in PICKS.items():
        df = fn(spark, d)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree.strip(), "```", ""]
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PLANS.md")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print("wrote", dest)


if __name__ == "__main__":
    main()
