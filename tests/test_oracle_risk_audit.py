"""CI gate over the oracle-fragility sweep (scripts/audit_oracle_risk.py).

The sweep itself is a generated report; this test makes it a GATE: a
new registry key that hits a cross-engine-fragile function family with
no dirty-fixture net, doctrine pin, or written waiver — or that sums an
integer the classifier can't bound (the r8 ``json_agg`` int64-overflow
class) — fails here instead of surfacing rounds later as a driver
hash-fail. Also keeps the manual waiver/bound tables honest: an entry
naming a key that no longer exists (or no longer hits the family) is
flagged as stale.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import audit_oracle_risk as audit


def _swept():
    queries, oracles, netted, rows = audit.compute_rows()
    sum_rows = audit.int_sum_rows(queries, oracles)
    return queries, rows, sum_rows


def test_no_unmitigated_family_hits():
    _queries, rows, _sum_rows = _swept()
    review = [(k, fam, where) for k, fam, where, n, p in rows
              if not (n or p)]
    assert not review, (
        "unmitigated fragile-family hits — add a dirty-fixture parity "
        f"test, a doctrine pin, or a written waiver: {review}")


def test_every_integer_sum_is_bounded_or_pinned():
    _queries, _rows, sum_rows = _swept()
    unproven = [(k, classes) for k, classes, ok in sum_rows if not ok]
    assert not unproven, (
        "SUM arguments with no structural class and no written bound "
        "in INT_SUM_BOUNDS — Spark sums int64 where DuckDB promotes to "
        f"HUGEINT (the r8 json_agg failure class): {unproven}")


def test_waivers_and_bounds_reference_live_keys():
    queries, rows, sum_rows = _swept()
    stale_waivers = [kf for kf in audit.WAIVERS
                     if kf[0] not in queries
                     or not any(r[0] == kf[0] and r[1] == kf[1]
                                for r in rows)]
    assert not stale_waivers, f"waivers no longer matching a hit: {stale_waivers}"
    sum_keys = {k for k, _c, _ok in sum_rows}
    stale_bounds = [k for k in audit.INT_SUM_BOUNDS if k not in sum_keys]
    assert not stale_bounds, f"bounds for keys with no SUM site: {stale_bounds}"
