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
    ("mvcc_cdc", "regex"):
        "same pinned fingerprint class as dedup_exact",
}

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


def main() -> None:
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
        f"netted keys: {len(netted)}; REVIEW rows: {len(review)}.",
        "",
        "## REVIEW (no mitigation detected)",
        "",
    ]
    if review:
        out += ["| key | family | where | why risky |", "|---|---|---|---|"]
        for key, fam, where, _n, _p in sorted(review):
            out.append(f"| {key} | {fam} | {where} | {FAMILIES[fam][2]} |")
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
    print(f"wrote {dest}: {len(rows)} hits, {len(review)} review rows")


if __name__ == "__main__":
    main()
