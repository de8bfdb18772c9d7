"""Incrementally-maintained aggregate views over MVCC collections.

The reference's log-structured model (SURVEY §1, §3.3) makes deltas
cheap; this module is the downstream payoff: a grouped SUM/COUNT/AVG
view that refreshes from the log delta instead of recomputing the
aggregate from scratch — the standard incremental view-maintenance
shape (delta processing per Blakeley et al. 1986, "Efficiently updating
materialized views"). Deltas are tracked by LOG POSITION (immutable
prefix, `Collection.scan_at_position`) rather than txid so nil-txid
(pre-committed) writes — the streaming-ingestion pattern — are tracked
too. Compaction (`compact()` / `optimize()` / `optimize_zorder()`)
rewrites live rows at a fresh `_batch` and deletes the old log files —
the prefix the last refresh was based on no longer replays, so a delta
there is undefined (the old-image scan would come back empty and the
new-image pass would double-count onto the stored state). The
collection persists a `compaction_watermark()`; `refresh()` compares
its stored position against it and falls back to a from-scratch state
rebuild whenever the baseline predates the watermark.

Scale accounting (the reason this exists at 100 TB):

- a full recompute shuffles the *entire* table on the group key every
  refresh;
- an incremental refresh shuffles only the changed rows: the CDC id set
  (delta cardinality) semi-joins the two bounding snapshots, and the
  correction aggregates are delta-sized. The snapshot scans themselves
  prune with parquet min/max on `_id` after `Collection.optimize`, and
  the *exchange* — the expensive part — is O(delta) regardless.

Determinism: sums accumulate in scaled BIGINT (same discipline as
`db_spark.functions.exact_sum`), so an incrementally-maintained state is
bit-identical to a direct aggregate over the final snapshot — associative
integer addition, no float drift. That identity is the correctness
contract (asserted in tests and by the `matview_incremental` oracle
query).

State is versioned: each refresh writes `state-{epoch}` then atomically
updates the meta pointer; the immediately-previous epoch directory is
retained (only epoch-2 is deleted), so a `read()` DataFrame obtained
before a refresh still evaluates lazily afterwards. Hold results across
more than one refresh by materializing them (collect/write).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalAggView:
    """Grouped sum/count/avg over one value column of a Collection,
    maintained incrementally from MVCC change-data-capture."""

    def __init__(self, collection, group_col: str, value_col: str,
                 path: str, scale: int = 2):
        self.collection = collection
        self.group_col = group_col
        self.value_col = value_col
        self.path = path
        self.scale = scale  # decimal places kept exactly in the BIGINT sum
        os.makedirs(path, exist_ok=True)

    # -- state plumbing -----------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_view_meta.json")

    def _meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as fh:
            return json.load(fh)

    def _state_dir(self, epoch: int) -> str:
        return os.path.join(self.path, f"state-{epoch}")

    def _write_state(self, state: DataFrame, pos: int, epoch: int) -> None:
        out = self._state_dir(epoch)
        state.write.mode("overwrite").parquet(out)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"pos": pos, "epoch": epoch}, fh)
        os.replace(tmp, self._meta_path)  # atomic pointer swap
        # Retain epoch-1 so DataFrames read before this refresh still
        # evaluate (lazy plans hold the old path); reap epoch-2 and any
        # older stragglers a crashed refresh may have left behind.
        for d in os.listdir(self.path):
            if d.startswith("state-") and d[6:].isdigit() and int(d[6:]) <= epoch - 2:
                shutil.rmtree(os.path.join(self.path, d))

    # -- aggregation --------------------------------------------------------
    def _contrib(self, snap: DataFrame, sign: int) -> DataFrame:
        """Signed (group, scaled-sum, count) contribution of a row set.
        Scaled-BIGINT sums keep incremental state bit-identical to a
        direct aggregate (integer addition is associative; doubles are
        not)."""
        m = 10 ** self.scale
        return snap.groupBy(F.col(self.group_col).alias("_g")).agg(
            (F.lit(sign) * F.coalesce(
                F.sum(F.round(F.col(self.value_col) * m).cast("long")),
                F.lit(0))).cast("long").alias("_ssum"),
            (F.lit(sign) * F.count(F.col(self.value_col)))
            .cast("long").alias("_cnt"),
        )

    def refresh(self) -> int:
        """Advance the view to the collection's current state. First call
        is a full build; later calls apply only the delta since the
        previous refresh: new-image contributions minus old-image
        contributions for the changed ids, merged into the stored state.
        Returns the log position the view now reflects.

        Deltas are computed from LOG POSITIONS, not txids: a log prefix
        is immutable, so ``scan_at_position`` gives a stable baseline —
        txid-based CDC would silently miss nil-txid (pre-committed)
        writes, which are visible in *every* txid snapshot including
        past ones (this is exactly how streaming ingestion writes). An
        id's visibility changes only if (a) a U/D entry for it landed in
        the interval, or (b) a commit marker for its transaction landed
        in the interval — the changed-id set is the union of both.

        Exception: compaction destroys the log prefix (live rows are
        rewritten at a fresh position and their original files deleted),
        so when the stored position predates the collection's
        ``compaction_watermark()`` the old-image baseline is gone — the
        delta is undefined and the state is rebuilt from scratch. This
        costs one full aggregate, same as the initial build; schedule
        refreshes before compaction to keep every refresh delta-sized."""
        now_pos = self.collection.log_position()
        meta = self._meta()
        if meta is None:
            state = self._contrib(
                self.collection.scan_at_position(now_pos), 1)
            state = state.filter(F.col("_cnt") > 0)
            self._write_state(state, now_pos, 0)
            return now_pos
        last = meta["pos"]
        if now_pos == last:
            return last  # nothing appended; state already current
        if self.collection.compaction_watermark() > last:
            # Log prefix at `last` no longer replays: scan_at_position
            # (last) would be empty, the old-image correction would
            # subtract nothing, and merging the full new image onto the
            # stored state would double-count. Rebuild instead.
            state = self._contrib(
                self.collection.scan_at_position(now_pos), 1)
            state = state.filter(F.col("_cnt") > 0)
            self._write_state(state, now_pos, meta["epoch"] + 1)
            return now_pos
        log = self.collection.log_entries()
        interval = log.filter(
            (F.col("_batch") > last) & (F.col("_batch") <= now_pos))
        newly_committed = (
            interval.filter(F.col("_kind") == "C")
            .select("_txid").distinct()
        )
        changed = (
            interval.filter(F.col("_kind").isin("U", "D")).select("_id")
            .unionByName(
                log.filter((F.col("_batch") <= F.lit(now_pos))
                           & F.col("_kind").isin("U", "D"))
                .join(F.broadcast(newly_committed), "_txid", "left_semi")
                .select("_id"))
            .distinct()
        )
        old_rows = (
            self.collection.scan_at_position(last)
            .join(changed, "_id", "left_semi")
        )
        new_rows = (
            self.collection.scan_at_position(now_pos)
            .join(changed, "_id", "left_semi")
        )
        prev = self.collection.spark.read.parquet(
            self._state_dir(meta["epoch"]))
        state = (
            prev
            .unionByName(self._contrib(new_rows, 1))
            .unionByName(self._contrib(old_rows, -1))
            .groupBy("_g")
            .agg(F.sum("_ssum").cast("long").alias("_ssum"),
                 F.sum("_cnt").cast("long").alias("_cnt"))
            .filter(F.col("_cnt") > 0)
        )
        self._write_state(state, now_pos, meta["epoch"] + 1)
        return now_pos

    def read(self) -> DataFrame:
        """The maintained aggregate: (group, n_rows, sum_value,
        avg_value). Raises if the view was never refreshed."""
        meta = self._meta()
        if meta is None:
            raise RuntimeError("view has no state yet — call refresh()")
        m = float(10 ** self.scale)
        st = self.collection.spark.read.parquet(self._state_dir(meta["epoch"]))
        return st.select(
            F.col("_g").alias(self.group_col),
            F.col("_cnt").alias("n_rows"),
            (F.col("_ssum").cast("double") / m).alias("sum_value"),
            F.round(F.col("_ssum").cast("double") / m
                    / F.col("_cnt").cast("double"), 6).alias("avg_value"),
        )
