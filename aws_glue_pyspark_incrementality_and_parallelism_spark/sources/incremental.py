"""Incremental scans — job-bookmark semantics as an explicit HWM store.

The reference relies on Glue Job Bookmarks: per-source monotonic
high-water-marks on declared key columns, with ``jobBookmarkKeys`` +
``jobBookmarkKeysSortOrder="asc"``
(/root/reference/glue_rds_to_redshift.py:31,35,40). Glue manages the
state service-side and (when the job commits) only re-reads rows with
key > last bookmark. The reference never commits (SURVEY §8 B10) and
reuses one transformation_ctx for three sources (B8) — both fixed here.

Spark-first rebuild: the bookmark is an ordinary filter predicate
``col(key) > lit(hwm)`` that Catalyst pushes into the parquet/JDBC scan
(visible as PushedFilters in .explain), plus a tiny JSON state store
committed only AFTER the sink succeeds. Crash between write and commit
⇒ rerun re-processes the same slice; pair with an idempotent sink
(overwrite a deterministic output path / partition) for exactly-once
output.

Known semantic (same as Glue, documented in SURVEY §7): an in-place
UPDATE to an already-seen key is skipped. Callers that need update
capture should bookmark on a monotonic ``last_modified`` column instead.

At 100 TB the predicate prunes at the source: on a partitioned/bucketed
table, ``key > hwm`` eliminates whole files/partitions via parquet
min-max statistics, so incremental cost is O(new data), not O(table).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BookmarkStore:
    """Per-source high-water-mark state, one JSON file.

    Unlike the reference (shared transformation_ctx, SURVEY §8 B8), state
    is keyed by source name. Commit is atomic (write temp + rename).
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def _load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, source: str) -> Any | None:
        return self._load().get(source)

    def commit(self, source: str, hwm: Any) -> None:
        state = self._load()
        state[source] = hwm
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def reset(self, source: str | None = None) -> None:
        if source is None:
            if os.path.exists(self.path):
                os.remove(self.path)
            return
        state = self._load()
        state.pop(source, None)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


@dataclass
class IncrementalBatch:
    """One incremental slice plus the HWM to commit after the sink succeeds.

    ``key`` is a column name or a list of column names (composite
    bookmark — Glue's ``jobBookmarkKeys`` is a list, ordered
    lexicographically)."""

    df: DataFrame
    source: str
    key: str | list[str]
    store: BookmarkStore
    _pending_hwm: Any = None

    def pending_hwm(self) -> Any:
        """Max key in this batch (one small agg job; None for empty batch).

        For composite keys, ``max(struct(k1, k2, ...))`` — Spark orders
        structs lexicographically, so one aggregate yields the composite
        HWM without a sort."""
        if self._pending_hwm is None:
            if isinstance(self.key, str):
                row = self.df.agg(F.max(self.key).alias("hwm")).collect()[0]
                self._pending_hwm = row["hwm"]
            else:
                row = self.df.agg(F.max(F.struct(*self.key)).alias("hwm")).collect()[0]
                self._pending_hwm = None if row["hwm"] is None else list(row["hwm"])
        return self._pending_hwm

    def commit(self) -> Any:
        """Advance the bookmark. Call ONLY after the sink commit succeeds."""
        hwm = self.pending_hwm()
        if hwm is not None:
            self.store.commit(self.source, hwm)
        return hwm


def composite_gt(keys: list[str], hwm: list[Any]):
    """Lexicographic strictly-greater predicate over ``keys``:
    (k1 > h1) OR (k1 = h1 AND (k2 > h2 OR ...)). Catalyst pushes the
    OR-of-ANDs into the parquet scan, where row-group min/max stats on
    the leading key prune files exactly like the single-key case."""
    if not keys:
        raise ValueError("composite_gt: keys must be non-empty")
    if isinstance(hwm, (str, bytes)) or not isinstance(hwm, (list, tuple)):
        raise ValueError(
            f"composite_gt: hwm must be a list matching keys={keys}, got "
            f"{type(hwm).__name__} — a scalar bookmark committed by an "
            "earlier single-key run cannot drive a composite-key read "
            "(bookmark key set changed; reset the bookmark)"
        )
    if len(keys) != len(hwm):
        raise ValueError(
            f"composite_gt: {len(keys)} keys but {len(hwm)} HWM components "
            "(bookmark key set changed; reset the bookmark)"
        )
    pred = F.col(keys[-1]) > F.lit(hwm[-1])
    for k, h in zip(reversed(keys[:-1]), reversed(hwm[:-1])):
        pred = (F.col(k) > F.lit(h)) | ((F.col(k) == F.lit(h)) & pred)
    return pred


def incremental_read(
    df: DataFrame,
    key: str | list[str],
    store: BookmarkStore,
    source: str,
) -> IncrementalBatch:
    """Bookmark-filtered view of ``df`` (rows with key > committed HWM).

    The filter is a plain Catalyst predicate, so it is pushed down into
    the parquet scan (PushedFilters: [GreaterThan(key, hwm)]). A list
    ``key`` gives Glue's composite-``jobBookmarkKeys`` semantic via the
    lexicographic predicate."""
    hwm = store.get(source)
    if hwm is None:
        sliced = df
    elif isinstance(key, str):
        sliced = df.filter(F.col(key) > F.lit(hwm))
    else:
        # Pass the stored HWM through unchanged: composite_gt rejects a
        # legacy scalar bookmark with a clear "key set changed" error
        # rather than list('abc') silently exploding it into characters.
        sliced = df.filter(
            composite_gt(list(key), list(hwm) if isinstance(hwm, (list, tuple)) else hwm)
        )
    return IncrementalBatch(df=sliced, source=source, key=key, store=store)


def run_incremental(
    batch: IncrementalBatch,
    write_fn,
) -> Any:
    """filter → write → commit-HWM, in that order (fixes SURVEY §8 B10).

    ``write_fn(df)`` must be idempotent (e.g. overwrite a deterministic
    path) so a crash after write but before commit is safe to rerun.
    Returns the committed HWM (None if the batch was empty).
    """
    hwm = batch.pending_hwm()
    if hwm is None:
        return None
    write_fn(batch.df)
    return batch.commit()
