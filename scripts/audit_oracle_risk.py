"""Static sweep of every (engine query, oracle SQL) pair for the
cross-engine fragility class that bit `json_agg` in round 7: the two
sides using *different functions* that agree only on clean inputs.

For each registry key it scans BOTH the engine builder's Python source
(`inspect.getsource(q_<key>)`) and the oracle SQL string for function
families whose semantics are engine- or locale-dependent, then
cross-references two mitigations:

- **adversarial net** — the key has a dirty-fixture parity test in
  `tests/test_oracle_adversarial.py` (both engines run on deliberately
  messy data, driver-gate compare);
- **doctrine pins** — the repo-wide parity rules from
  `.claude/skills/verify/SKILL.md` (scaled-BIGINT float folds, dyadic
  literals, `div`/`//` integer division, TRY_CAST, restricted regex
  subset, interval-based datetime arithmetic, −0.0 normalization).

Output: `docs/ORACLE_RISK.md` — one row per (key, family) hit with its
mitigation status. Keys hitting a risky family with NEITHER mitigation
are listed first as REVIEW items; the goal is an empty REVIEW section.

Usage::

    python scripts/audit_oracle_risk.py          # writes docs/ORACLE_RISK.md
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family -> (pattern over oracle SQL, pattern over engine source, why risky)
FAMILIES: dict[str, tuple[str, str, str]] = {
    "json": (
        r"json_extract|json_valid|->>",
        r"get_json_object|from_json|json_tuple",
        "parse/extract semantics differ on quoted numbers, floats, "
        "malformed docs (the r7 json_agg driver failure)",
    ),
    "regex": (
        r"regexp_matches|regexp_replace|regexp_extract|regexp_split|similar to",
        r"regexp_extract_all|regexp_extract|regexp_replace|regexp_count|\brlike\b",
        "DuckDB RE2 vs Java regex dialect: lookaround, shorthand "
        "classes, anchors and unicode classes diverge",
    ),
    "case_locale": (
        r"\b(?:upper|lower|initcap)\s*\(",
        r"F\.(?:upper|lower|initcap)\(",
        "non-ASCII case mapping is locale/ICU-dependent",
    ),
    "datetime": (
        # datediff / epoch_us // 1e6 / INTERVAL arithmetic are the
        # PINNED forms (see skill doc) — only format-string parsing and
        # part extraction are dialect-risky.
        r"strftime|strptime|date_part\s*\(\s*'(?:week|dow|doy|era)'|make_timestamp",
        r"to_timestamp\(|date_format\(|unix_timestamp\(",
        "format tokens, week/era rules and TZ handling differ; "
        "TIMESTAMP_NTZ vs LTZ promotion drags the session zone in",
    ),
    "float_agg": (
        r"\bavg\s*\(|\bstddev|\bcorr\s*\(|\bvar_pop|list_sum\s*\(",
        r"F\.(?:avg|mean|stddev|variance|corr|covar)\(",
        "float accumulation order differs between engines unless terms "
        "are pre-rounded into scaled BIGINT",
    ),
    "libm": (
        r"\b(?:ln|log|log2|log10|exp|pow|power)\s*\(",
        r"F\.(?:log|log2|log10|exp|pow|power)\(",
        "libm implementations differ in the last ulp",
    ),
    "string_cast": (
        # only casts whose argument involves a free-text column are
        # risky (numeric-column casts are semantics-identical); Spark
        # side NULLs on failure with ANSI off, so the erroring side is
        # the DuckDB oracle — detect SQL only.
        r"(?<!TRY_)CAST\s*\((?:[^()]|\([^()]*\))*?(?:text|props|comment)(?:[^()]|\([^()]*\))*?AS\s+(?:BIGINT|INTEGER|DOUBLE)",
        r"(?!x)x",  # never matches
        "CAST of malformed free-text errors on DuckDB but NULLs on "
        "Spark (ANSI off) — TRY_CAST is the pinned form",
    ),
}

# Doctrine-pin detectors: evidence in either side that the pinned form
# is in use for a family (from .claude/skills/verify/SKILL.md).
PINS: dict[str, tuple[str, str]] = {
    "json": (
        r"TRY_CAST[\s\S]*json_extract_string|json_valid",
        r"rlike|when\(.*json",
    ),
    "float_agg": (
        # scaled-BIGINT fold on the SQL side / exact_sum or an explicit
        # long-cast accumulation on the engine side
        r"AS\s+BIGINT|list_sum\s*\(\s*list_transform[\s\S]*?round",
        r"exact_sum|\.cast\(['\"]long['\"]\)|F\.round\(",
    ),
    "libm": (
        # integer-unit literal tables or nano-unit folds instead of
        # query-time libm (benford/entropy pattern); log of an integer
        # ratio compared at fixed digits is also pinned by round(x, d)
        r"AS\s+BIGINT|_ppb|_nano|round\s*\([\s\S]*?,\s*\d+\s*\)",
        r"\.cast\(['\"]long['\"]\)|F\.round\(",
    ),
    "string_cast": (r"TRY_CAST", r"(?!x)x"),
    "case_locale": (
        # ASCII-restricted token alphabet right next to the lowercase:
        # the shared tokenizer lowercases then keeps [a-z...] classes
        # only, so non-ASCII mapping differences are filtered out on
        # both sides ('' is the SQL-escaped quote inside the class)
        r"\[a-z|\[A-Z",
        r"\[a-z|\[A-Z",
    ),
    "regex": (
        # the repo restricts oracle/engine regexes to the shared-safe
        # subset (literal ASCII char classes, greedy quantifiers, \s —
        # identical in RE2 and Java); detect those literal classes
        r"\[a-z|\[A-Z|\[0-9|\\\\s\+",
        r"\[a-z|\[A-Z|\[0-9|\\s\+",
    ),
}

# Reviewed (key, family) pairs with a manual same-semantics argument —
# each entry is a waiver with its justification, surfaced in the report.
WAIVERS: dict[tuple[str, str], str] = {
    ("projection", "case_locale"):
        "upper() on o_orderpriority — a TPC-H generator domain column "
        "(ASCII '1-URGENT'..'5-LOW'); ASCII upper is byte-identical in "
        "both engines and version-stable",
    ("correlated_subquery", "float_agg"):
        "AVG of integer-valued l_quantity: partial sums are exact "
        "integers < 2^53 in double, so accumulation order cannot "
        "change the sum; one final divide on both engines",
    ("gapfill_interp", "datetime"):
        "to_timestamp of a CONSTANT fully-specified ISO literal — no "
        "format tokens, no TZ (NTZ column), engine-identical parse",
    ("gapfill_locf", "datetime"):
        "same constant ISO-literal parse as gapfill_interp",
    ("dedup_exact", "regex"):
        "fingerprint whitespace is the explicit class "
        "[ \\t\\n\\x0B\\f\\r]+ on BOTH sides (Java's \\s exactly; RE2 "
        "reads the same escapes identically) — pinned r8 after the "
        "audit found Java \\s vs RE2 \\s disagree on vertical tab",
    ("dedup_keep_best", "regex"):
        "same pinned fingerprint class as dedup_exact",
}

# ---------------------------------------------------------------------------
# int_sum_overflow family (r9, from the diagnosed r8 json_agg failure):
# Spark sums BIGINT in int64 — ANSI off WRAPS silently, ANSI on THROWS —
# while DuckDB promotes SUM(BIGINT) to HUGEINT, so the engines diverge
# the moment the TRUE sum exceeds 2^63 even though every input row is
# legal. The sweep extracts every SUM(...) argument from every oracle
# (balanced-paren, comment-stripped) and requires each to fall in a
# class with a proven bound, be DECIMAL(38,0)-pinned, or carry a per-key
# written bound below.
# ---------------------------------------------------------------------------

# Per-key value bounds for SUM arguments the classifier cannot prove
# automatically. Each is a reviewed argument for why the true int64 sum
# stays far below 2^63 at any realistic scale (100 TB ~ 1e14 rows/tokens).
INT_SUM_BOUNDS: dict[str, str] = {
    "pca_project": "all folds are DECIMAL(38,0)/HUGEINT, never int64: "
                   "clamped terms reach 1e12, pair products 1e24, and "
                   "the (i,j) sums are cast to DECIMAL(38,0) BEFORE "
                   "the multiply on the Spark side and HUGEINT on the "
                   "oracle side — exact to ~1e38, i.e. ~1e14 rows at "
                   "the adversarial clamp and ~1e26 rows at real "
                   "unit-normalized magnitudes; the driver-side "
                   "iteration is python-bigint (unbounded) with the "
                   "C' matrix renormalized to <= 1e17 so the HUGEINT "
                   "oracle replay stays in range",
    "pca_topk": "same doctrine as pca_project (all folds HUGEINT/"
                "DECIMAL(38,0), never int64) plus the deflation chain: "
                "y = C*w <= dim*1e17*1e9 = 6.4e27, renormalized to "
                "<= 1e17 before s = w^T y <= dim*1e9*1e17 = 6.4e27; "
                "the rank-1 quotient (y_i*y_j)//s <= 1e34/s with the "
                "g (<= 6.4e10) multiply applied AFTER the divide, so "
                "every intermediate stays far inside HUGEINT",
    "classifier_score": "w is ppm-scaled and range-bounded by "
                        "construction: |w| <= 10000 (hash % 20001 - "
                        "10000), summed per DOCUMENT over its "
                        "unigram+bigram features (< 2 * doc tokens) — "
                        "a 1e12-token document would be needed to "
                        "approach int64; general weights are the "
                        "caller's model, ppm-integer by contract with "
                        "|w_ppm| ~ 1e7 for a +-10 logit, bound ~1e7 * "
                        "doc tokens << 2^63",
    "pq_topk": "all folds are DECIMAL(38,0)/HUGEINT, never int64: "
               "clamped scaled components reach 1e12, diffs 2e12, "
               "squares 4e24 (cast to DECIMAL(38,0)/HUGEINT BEFORE "
               "the multiply), per-subspace sums <= dim*4e24 ~ 2.6e26 "
               "and ADC sums <= m*2.6e26 ~ 1e27 — exact to 1e38; the "
               "centroid mean SUM(x) <= n*1e12 holds to n ~ 1e26 rows "
               "and its truncating-division quotient <= 1e12 is "
               "int64-safe on both engines (Spark div verified exact "
               "for in-range quotients)",
    "ivfpq_topk": "pq_topk's doctrine with one extra doubling per "
                  "subtraction: clamped scaled components reach 1e12, "
                  "residuals (x - cx) 2e12, residual codewords "
                  "(truncating means of residuals) 2e12, diffs vs "
                  "codewords 4e12, squares 1.6e25 — every square is "
                  "cast to DECIMAL(38,0)/HUGEINT BEFORE the multiply; "
                  "per-subspace sums <= dim*1.6e25 ~ 1e27 and ADC "
                  "sums <= m*1e27 ~ 4e27, exact to 1e38. The k-means "
                  "mean SUM(x) <= n*2e12 folds in HUGEINT (exact to "
                  "n ~ 1e25) and its truncating-division quotient "
                  "<= 2e12 is int64-safe on both engines",
    "pq_sampled": "identical chains to pq_topk (same components, "
                  "k-means, ADC — see its bound); sampling only "
                  "SHRINKS the training n, never widens any term",
    "l2_topk": "pq_topk's component doctrine with m=1: clamped scaled "
               "components reach 1e12, diffs 2e12, squares 4e24 cast "
               "to HUGEINT BEFORE the multiply; the per-pair sum is "
               "<= dim * 4e24 ~ 2.6e26 — exact to 1e38",
    "ivfpq_recall": "composes the l2_topk and ivfpq_topk oracles "
                    "(see their bounds); its own aggregates are "
                    "COUNT(*) over <= k rows per query",
    "pq_index_topk": "oracle IS pq_topk's (persisted search is "
                     "bit-identical to one-shot; the alias at "
                     "oracle_sql) — see pq_topk's bound",
    "ivfpq_index_topk": "oracle IS ivfpq_topk's (persisted search is "
                        "bit-identical to one-shot; the alias at "
                        "oracle_sql) — see ivfpq_topk's bound",
    "pq_subspace_var": "n*s2 - s*s folded in DECIMAL(38,0)/HUGEINT: "
                       "s2 <= n*(clamp*scale)^2; at the adversarial "
                       "clamp (|x_s| = 1e12) exact to n ~ 1e7 rows "
                       "per dimension, at real unit-normalized "
                       "embedding magnitudes (|x_s| <= ~1e6, x^2 <= "
                       "1e12) exact to n ~ 1e13 — the docstring "
                       "states the bound; shares are scale-free so a "
                       "smaller `scale` extends n a million-fold if "
                       "ever needed",
    "curate_corpus_v2": "a composition of already-bounded SUM "
                        "families, each inside its own stage: the NB "
                        "0/1 class-indicator counts (nb_train bound), "
                        "the per-document w_ppm fold (classifier_score "
                        "bound: |w_ppm| * 2*doc tokens << 2^63), the "
                        "winnow char-offset running sums (<= "
                        "length(text) per document), and SUM(e - s + "
                        "1) chars removed (winnow_cut bound, <= "
                        "length(text)); no stage introduces a new "
                        "unbounded fold",
    "winnow_cut": "SUM(e - s + 1) is total characters removed per "
                  "document: merged disjoint ranges clipped to the "
                  "document, so the sum <= length(text) — per-doc "
                  "char-count bounded, << 2^63 for any storable text",
    "nb_train": "both SUM args are 0/1 class indicators (CASE WHEN lab "
                "THEN 1 ELSE 0); a per-bucket sum is bounded by that "
                "bucket's feature occurrences <= corpus tokens * 2 "
                "(unigrams+bigrams) ~ 2e14 at 100 TB << 2^63, and the "
                "downstream fixed-point log consumes bitlen only",
    "json_agg": "the DESIGN of the key (r11 canonical lanes form): k "
                "matches -?[0-9]{1,18} so |k| <= 1e18-1; each lane "
                "term k//1e9 and k%1e9 is < 1e9 in magnitude, so a "
                "lane sum is < 1e9 * group rows — int64-safe to ~9e9 "
                "rows per bucket (events buckets are <<1e9 at every "
                "fixture scale; at 100 TB the lane split would widen "
                "to three lanes before the bound binds)",
    "cusum": "cents = round(value*100), |value| <= ~1e4 in events; "
             "t0 is their per-key mean; deviations sum <= rows * 1e6 "
             "(1e14 rows -> 1e20? No: per-KEY windows, key cardinality "
             "bounds each group to <<1e9 rows -> <=1e15)",
    "twap": "vc*dur: cents (<=1e6) x gap seconds (<=1e5 per step); "
            "per-key sum <= group rows * 1e11 — groups are per-series, "
            "<<1e7 rows each -> <=1e18, within int64 for the "
            "per-series windows this op contracts (docs/SCALE.md)",
    "rolling_corr": "xs/ys = round(x*100) <= 1e6; SUM runs over a "
                    "FIXED ROWS frame (window w), so each sum is "
                    "frame_len(<=32) * 1e12 (for xs*xs) <= 3.2e13",
    "seasonal_decompose": "vc = round(value*100) <= 1e6 per row, "
                          "summed over a fixed seasonal frame -> "
                          "frame_len * 1e6",
    "seasonal_anomalies": "vc and r3 are scaled-cents residues over "
                          "fixed frames; r3*r3 <= 1e12 * frame_len",
    "centroid_outliers": "s6 = micro-unit (1e6) scaled per-dimension "
                         "moments; documented contract |x| < 9e12 "
                         "(micro-fold doctrine), dims*rows bounded "
                         "per cell group",
    "important_stock": "v_c = scaled cents of per-order values summed "
                       "per part; group rows <<1e9 * 1e7 <= 1e16",
    "ivf_rbo": "wn = integer rank weights <= k (top-k list length, "
               "<=100); sum <= k^2",
    "pagerank": "contrib is ppb-scaled rank/out-degree; per-node "
                "in-neighbor sums <= 1e9 * nodes(<<1e9) = 1e18 "
                "boundary documented in docs/SCALE.md graph tier",
    "ppr": "same ppb-scaled contribution fold as pagerank",
    "cm_join_size": "ac.c * bc.c: per-bucket count product; CM sketch "
                    "buckets hold <= rows counts, but the product sum "
                    "estimates |A join B| <= |A|*|B| — bounded by "
                    "design to sketch width (2048 buckets) with "
                    "per-bucket counts <= rows/width; at 1e14 rows "
                    "the estimate itself would need HUGEINT — "
                    "documented as a >=1e10-row caveat in SCALE.md",
    "kmv_set_ops": "ina/inb are 0/1 membership flags (max over group); "
                   "ina*inb in {0,1} -> sum <= k (KMV synopsis size)",
    "dq_report": "n - 1 where n is a per-value duplicate count; "
                 "SUM(n-1) <= total rows",
    "window_funcs": "SUM(o_totalprice) OVER w is a DOUBLE running sum "
                    "— float fold (float_agg family), int64 overflow "
                    "not applicable; frame order is ORDER BY-pinned "
                    "identically on both engines",
    "collocations": "cw / greatest(len(toks)-1,0) are per-doc token "
                    "counts; total <= corpus tokens (~1e14 at 100 TB) "
                    "<< 2^63",
    "hybrid_rrf": "len(toks) and t are token counts — corpus-token "
                  "bounded",
    "bm25_topk": "len(toks) is a per-doc token count — corpus-token "
                 "bounded",
    "scalar_subquery": "SUM over DECIMAL(12,2): DuckDB widens decimal "
                       "sums; Spark sum(decimal(12,2)) -> "
                       "decimal(22,2) = 10 digits of headroom over "
                       "1e12-max terms -> exact to 1e9 rows; TPC-H "
                       "order counts per customer are far below",
    "stats_agg": "SUM over DECIMAL(12,2)/(18,2): same decimal-widening "
                 "headroom argument (Spark adds 10 digits, DuckDB "
                 "more); group sizes bounded by lineitem rows per flag",
    "bigram_surprisal": "b = bit-length of a count ratio (<= 63); "
                        "bc = per-bigram count — both corpus-token "
                        "bounded (sum <= 63 * distinct bigrams)",
    "unigram_surprisal": "same bit-length-of-count-ratio fold as "
                         "bigram_surprisal",
    "psi_drift": "nr/nc = COALESCE(per-bucket count, 0) — corpus-row "
                 "bounded; tn is the nano-scaled probability fold "
                 "(terms <= 1e9)",
    "corpus_stats": "n_tokens is a per-doc token-count column; "
                    "SUM <= corpus tokens (~1e14 at 100 TB) << 2^63",
    "token_budget": "nt = per-doc token count — corpus-token bounded",
    "ivf_kmeans_topk": "u.s = round(x*1e6) micro-scaled embedding "
                       "components (centroid_outliers' micro-fold "
                       "contract: |x| < 9e12, unit-normalized in "
                       "practice); per-(cell,dim) sum <= cell rows * "
                       "1e6 * |x|max — <=1e15 at 1e9 vectors/cell on "
                       "unit vectors",
    "semantic_dedup": "same Lloyd-chain fold as ivf_kmeans_topk "
                      "(u.s = round(x*1e6) micro-scaled components; "
                      "per-(cell,dim) sum bounded by cell rows * 1e6 "
                      "* |x|max); the perturbed copies add +-0.03 to "
                      "each component, leaving the bound unchanged",
}

# SUM args that are structurally bounded without a per-key argument.
_IND_INLINE = re.compile(
    r"^\s*(?:DISTINCT\s+)?(?:CASE\b[\s\S]*THEN\s+1\b[\s\S]*"
    r"(?:ELSE\s+0\s+)?END|1)\s*$", re.IGNORECASE)
_COUNT_INLINE = re.compile(r"\b(?:count|len|length|cardinality)\s*\(",
                           re.IGNORECASE)
_SCALED_INLINE = re.compile(r"\bround\s*\(", re.IGNORECASE)
_DEC_TYPED = re.compile(r"AS\s+DECIMAL\s*\(\s*\d+", re.IGNORECASE)


def _strip_sql_comments(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def _sum_sites(sql: str) -> list[tuple[str, bool]]:
    """Yield (argument, decimal38_wrapped) for every SUM( in the SQL."""
    out = []
    for m in re.finditer(r"\bSUM\s*\(", sql, re.IGNORECASE):
        i, depth, j = m.end(), 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        arg = sql[i:j - 1].strip()
        # CAST(SUM(...) AS DECIMAL(38,..)) wrapper (the json_agg pin)
        prefix = sql[max(0, m.start() - 40):m.start()]
        wrapped = bool(re.search(r"CAST\s*\(\s*$", prefix, re.IGNORECASE)
                       and re.search(r"AS\s+DECIMAL\s*\(\s*38", sql[j:j + 40],
                                     re.IGNORECASE))
        out.append((arg, wrapped))
    return out


def _ident_class(sql: str, ident: str) -> str:
    """Classify a bare identifier SUM arg by its defining expression."""
    name = ident.split(".")[-1]
    if not re.fullmatch(r"\w+", name):
        return "unknown"
    # indicator: CASE ... THEN 1 ELSE 0 END AS <name> (either order)
    if re.search(rf"THEN\s+[01]\s+ELSE\s+[01]\s+END\s*\)?\s*AS\s+{name}\b",
                 sql, re.IGNORECASE):
        return "indicator"
    # count: count(...)/len(...) [cast] AS <name>
    if re.search(rf"(?:count|len|length)\s*\((?:[^()]|\([^()]*\))*\)\s*"
                 rf"(?:AS\s+BIGINT\s*\)\s*)?AS\s+{name}\b",
                 sql, re.IGNORECASE):
        return "count"
    # scaled: CAST(round(...) AS BIGINT) AS <name> (doctrine form)
    if re.search(rf"round\s*\((?:[^()]|\([^()]*\))*\)\s*AS\s+BIGINT\s*\)\s*"
                 rf"AS\s+{name}\b", sql, re.IGNORECASE):
        return "scaled"
    # nano-scaled: CAST(<expr> * 1e9 AS BIGINT) AS <name> (the entropy/
    # chi2 nano-unit fold — terms bounded by 1e9 * |expr| with |expr|
    # <= 1 for the probability ratios this form is used on)
    if re.search(rf"\*\s*1e\d+\s*\)*\s*AS\s+BIGINT\s*\)\s*AS\s+{name}\b",
                 sql, re.IGNORECASE):
        return "scaled"
    return "unknown"


def int_sum_rows(queries, oracles):
    """One row per registry key with >=1 SUM site: (key, classes,
    pinned). pinned=False only when a site is unclassified AND the key
    has no written bound in INT_SUM_BOUNDS."""
    out = []
    for key in queries:
        sql = _strip_sql_comments(oracles.get(key, ""))
        sites = _sum_sites(sql)
        if not sites:
            continue
        classes = []
        unproven = False
        for arg, wrapped in sites:
            if wrapped or "DECIMAL(38" in arg.upper():
                classes.append("decimal38")
            elif _DEC_TYPED.search(arg):
                classes.append("decimal")
            elif _IND_INLINE.match(arg):
                classes.append("indicator")
            elif _COUNT_INLINE.search(arg):
                classes.append("count")
            elif _SCALED_INLINE.search(arg):
                classes.append("scaled")
            elif re.search(r"power\s*\(|\d+\.\d|::DOUBLE|\d+e-\d",
                           arg, re.IGNORECASE):
                # float-typed sum (HLL's dyadic 2^-z etc.): int64
                # overflow not applicable — parity owned by the
                # float_agg/libm families
                classes.append("double")
            else:
                kls = _ident_class(sql, arg)
                classes.append(kls)
                if kls == "unknown":
                    unproven = True
        bounded = key in INT_SUM_BOUNDS
        out.append((key, classes, (not unproven) or bounded))
    return out


# Engine-side helpers whose cross-engine parity is itself verified by
# the adversarial net (dirty unicode/empty/NULL text through
# text_stats/normalize_text/explode_tokens/chunk_docs + their oracles):
# any query built on them inherits the verified tokenizer semantics.
NETTED_HELPERS = re.compile(
    r"shingle_table|shingles\(|_grams_of|_toks|tokenize|text_stats|"
    r"normalize_text|quality_rules|minhash_signature|simhash")


def _adversarial_keys() -> set[str]:
    path = os.path.join(REPO, "tests", "test_oracle_adversarial.py")
    with open(path) as fh:
        src = fh.read()
    keys = set(re.findall(
        r"_assert_engines_agree\(\s*spark,\s*dirty_dir,\s*['\"](\w+)['\"]", src))
    # parametrized nets: @pytest.mark.parametrize("key", [...]) lists
    # feeding _assert_engines_agree(spark, dirty_dir, key)
    for block in re.findall(
            r"parametrize\(\s*\"key\",\s*\[(.*?)\]", src, re.S):
        keys.update(re.findall(r"['\"](\w+)['\"]", block))
    return keys


def compute_rows():
    """The full sweep, importable by tests: returns (queries, oracles,
    netted, rows) where rows = [(key, family, where, netted, pinned)].
    tests/test_oracle_risk_audit.py gates on this so a new registry key
    with an unmitigated fragile-family hit (or an unbounded integer
    SUM) fails CI instead of surfacing as a driver hash-fail."""
    oracles = E.oracle_sql()
    queries = E.queries()
    netted = _adversarial_keys()

    rows = []  # (key, family, where, netted, pinned)
    for key in queries:
        sql = oracles.get(key, "")
        try:
            src = inspect.getsource(queries[key])
        except (OSError, TypeError):
            src = ""
        for fam, (sql_pat, src_pat, _why) in FAMILIES.items():
            hit_sql = bool(re.search(sql_pat, sql, re.IGNORECASE))
            hit_src = bool(re.search(src_pat, src))
            if not (hit_sql or hit_src):
                continue
            where = "both" if (hit_sql and hit_src) else (
                "oracle" if hit_sql else "engine")
            pinned = False
            if fam in PINS:
                p_sql, p_src = PINS[fam]
                pinned = bool(re.search(p_sql, sql, re.IGNORECASE)
                              or re.search(p_src, src))
            if (not pinned and fam in ("case_locale", "regex")
                    and NETTED_HELPERS.search(src)):
                pinned = True  # inherited from the netted tokenizer tier
            if (key, fam) in WAIVERS:
                pinned = True
            rows.append((key, fam, where, key in netted, pinned))
    return queries, oracles, netted, rows


def main() -> None:
    queries, oracles, netted, rows = compute_rows()
    sum_rows = int_sum_rows(queries, oracles)
    sum_review = [(k, c) for k, c, ok in sum_rows if not ok]

    review = [r for r in rows if not (r[3] or r[4])]
    covered = [r for r in rows if r[3] or r[4]]

    out = [
        "# ORACLE_RISK — cross-engine fragility sweep",
        "",
        "Generated by `scripts/audit_oracle_risk.py`. One row per",
        "(registry key, risky function family) hit in the engine builder",
        "source or its oracle SQL. Mitigations: **net** = dirty-fixture",
        "parity test in `tests/test_oracle_adversarial.py`; **pin** =",
        "the doctrine-pinned identical-semantics form is detected",
        "(scaled-BIGINT folds, TRY_CAST, fixed-digit round, guarded",
        "JSON extraction). A REVIEW row has neither — each needs a",
        "manual same-semantics argument or a new net entry.",
        "",
        f"Registry keys scanned: {len(queries)}; family hits: {len(rows)};",
        f"netted keys: {len(netted)}; REVIEW rows: "
        f"{len(review) + len(sum_review)}.",
        "",
        "## REVIEW (no mitigation detected)",
        "",
    ]
    if review or sum_review:
        out += ["| key | family | where | why risky |", "|---|---|---|---|"]
        for key, fam, where, _n, _p in sorted(review):
            out.append(f"| {key} | {fam} | {where} | {FAMILIES[fam][2]} |")
        for key, classes in sorted(sum_review):
            out.append(
                f"| {key} | int_sum_overflow | oracle | unclassified SUM "
                f"arg ({'/'.join(classes)}) with no written bound — "
                f"Spark int64 sum wraps/throws where DuckDB promotes to "
                f"HUGEINT |")
    else:
        out.append("*(none — every hit is netted or doctrine-pinned)*")
    out += [
        "",
        "## Covered hits",
        "",
        "| key | family | where | net | pin |",
        "|---|---|---|---|---|",
    ]
    for key, fam, where, n, p in sorted(covered):
        out.append(
            f"| {key} | {fam} | {where} | {'y' if n else ''} |"
            f" {'y' if p else ''} |")
    out += [
        "",
        "## Waivers (manual same-semantics arguments)",
        "",
        "| key | family | justification |",
        "|---|---|---|",
    ]
    for (key, fam), why in sorted(WAIVERS.items()):
        out.append(f"| {key} | {fam} | {why} |")
    out += [
        "",
        "## int_sum_overflow sweep (r9)",
        "",
        "Spark sums BIGINT in int64 (ANSI off wraps silently, ANSI on",
        "throws) while DuckDB promotes SUM(BIGINT) to HUGEINT — engines",
        "diverge once the TRUE sum exceeds 2^63 even with per-row-legal",
        "inputs (the diagnosed r8 `json_agg` driver failure). Every",
        "SUM argument in every oracle, classified; `bound` quotes the",
        "written overflow-impossibility argument for keys the classifier",
        "can't prove structurally. Classes: decimal38 = width-pinned;",
        "decimal = DECIMAL-typed operand (widening headroom); indicator =",
        "0/1 terms (sum <= rows); count = count/len terms (sum <= corpus",
        "cardinality); scaled = round(x*10^d) doctrine terms.",
        "",
        "| key | SUM arg classes | bound argument |",
        "|---|---|---|",
    ]
    for key, classes, ok in sorted(sum_rows):
        bound = INT_SUM_BOUNDS.get(key, "" if ok else "**MISSING**")
        out.append(f"| {key} | {'/'.join(classes)} | "
                   f"{bound.replace('|', '&#124;')} |")
    out += [
        "",
        "## Families considered and dismissed",
        "",
        "- **window NULL ordering** (Spark sorts NULLS FIRST ascending,",
        "  DuckDB NULLS LAST): swept every `ORDER BY` column inside every",
        "  oracle window/rank clause (r9) — all are non-null by",
        "  construction (ids, event timestamps, computed distances/scores",
        "  from guarded non-null inputs, TPC-H NOT NULL columns). The",
        "  dirty fixtures route NULL text/value rows through the netted",
        "  window queries, so a regression here fails the adversarial",
        "  suite, not the driver gate.",
        "- **negative division/modulo** (sign conventions): both engines",
        "  truncate toward zero for `%` and the doctrine mandates",
        "  `div`/`//` (never float-divide-then-cast) for quotients; the",
        "  `{\"k\": -42}` dirty-props row exercises the one negative-mod",
        "  bucket computation (json_agg).",
        "- **round() tie behavior**: DuckDB round on DOUBLE is",
        "  half-away-from-zero, same as Spark's HALF_UP — scaled-long",
        "  rounding ties are safe on both sides (verified r3, doctrine).",
        "",
        "## Family definitions",
        "",
        "| family | why risky |",
        "|---|---|",
    ]
    for fam, (_s, _e, why) in FAMILIES.items():
        out.append(f"| {fam} | {why} |")
    out.append("")

    dest = os.path.join(REPO, "docs", "ORACLE_RISK.md")
    with open(dest, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {dest}: {len(rows)} family hits, {len(sum_rows)} "
          f"int-sum keys, {len(review) + len(sum_review)} review rows")


if __name__ == "__main__":
    main()
