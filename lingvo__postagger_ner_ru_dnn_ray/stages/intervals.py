"""Interval (range) join: events against overlapping time windows.

Ray Data has no range join; the reference engine has none either (its
joins are hash lookups — SURVEY.md §2.4). This is the canonical
broadcast-side interval join every event pipeline needs: match each fact
row to EVERY window whose [start, end) contains its timestamp, where
windows overlap (so it is a genuine 1-to-many range join, not a bucket
groupby).

Window derivation is itself distributed: per-batch (day, count) partials
over *error* events → a tiny groupby (one row per distinct day) → the
strictly-above-average days become "incident windows" [day−6h, day+30h).
Adjacent busy days overlap by 12 h, so a purchase can land in 1 or 2
windows.

Scale shape:
- The day-count table is O(distinct days) — a few thousand rows even for
  a decade of data — so pulling it to the driver and broadcasting the
  sorted window-start array is the textbook small-side broadcast
  (`ray.put` once, read per task), NOT a shuffle join.
- The probe is ONE zero-shuffle ``map_batches``: ``np.searchsorted``
  against the sorted starts, then a constant number of candidate checks.
  Windows are ≥24 h apart and 36 h long, so a timestamp lies in at most
  ceil(36/24) = 2 windows — candidates ``idx-1`` and ``idx-2`` are
  exhaustive. For general window tables the same stage takes
  ``max_overlap`` as the scan depth.
- If the window table ever outgrew broadcast (it would have to be tens of
  millions of intervals), the fallback is day-bucket co-partitioning:
  replicate each window to the day buckets it touches and join inside the
  bucket — same shape as events_window_sliding's ×4 replication.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

US_PER_DAY = 86_400_000_000
_WIN_LEAD_US = 21_600_000_000   # window opens 6 h before the busy day
_WIN_LEN_US = 129_600_000_000   # 36 h total


def _busy_window_starts(sf_dir: str) -> np.ndarray:
    """Distinct error-days with strictly-above-average error counts →
    sorted window-start array (µs). Driver pull bounded by the number of
    DISTINCT DAYS in the stream, never by event count."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def day_partials(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "error"))
        ts_us = np.asarray(
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        )
        days, counts = np.unique(ts_us // US_PER_DAY, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(days.astype(np.int64)), pa.array(counts.astype(np.int64))],
            names=["day", "n"],
        )

    per_day = (
        ev.map_batches(day_partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct days) rows — see docstring
    )
    if per_day.empty:
        return np.array([], dtype=np.int64)
    total = int(per_day["n"].sum())
    nd = len(per_day)
    busy = per_day.loc[per_day["n"] * nd > total, "day"].to_numpy(np.int64)
    return np.sort(busy * US_PER_DAY - _WIN_LEAD_US)


_OUT_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()),
     ("ts_us", pa.int64()), ("window_start_us", pa.int64())]
)


def events_interval_join(sf_dir: str) -> ray.data.Dataset:
    """Each *purchase* event joined to every incident window containing
    it (possibly several — windows overlap). See module docstring for the
    distributed shape."""
    starts_ref = ray.put(_busy_window_starts(sf_dir))
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def probe(batch: pa.Table) -> pa.Table:
        starts = ray.get(starts_ref)
        t = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        if t.num_rows == 0 or len(starts) == 0:
            return _OUT_SCHEMA.empty_table()
        ts_us = np.asarray(
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        )
        idx = np.searchsorted(starts, ts_us, side="right")
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        chunks = []
        # starts are ≥24 h apart, windows 36 h → ≤2 candidates per event
        for back in (1, 2):
            j = idx - back
            ok = j >= 0
            jj = np.where(ok, j, 0)
            ws = starts[jj]
            hit = ok & (ts_us < ws + _WIN_LEN_US)  # ws <= ts by searchsorted
            if hit.any():
                chunks.append(
                    pa.Table.from_arrays(
                        [pa.array(eid[hit]), pa.array(uid[hit]),
                         pa.array(ts_us[hit]), pa.array(ws[hit])],
                        schema=_OUT_SCHEMA,
                    )
                )
        if not chunks:
            return _OUT_SCHEMA.empty_table()
        return pa.concat_tables(chunks)

    return ev.map_batches(probe, batch_format="pyarrow")


EVENTS_INTERVAL_ORACLE_SQL = f"""
WITH w AS (
  SELECT epoch_us(ts) // {US_PER_DAY} AS day, count(*) AS c
  FROM events WHERE event_type = 'error' GROUP BY 1
), tot AS (SELECT sum(c) AS t, count(*) AS nd FROM w),
win AS (
  SELECT (day * {US_PER_DAY} - {_WIN_LEAD_US})::BIGINT AS ws
  FROM w, tot WHERE c * nd > t
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, win.ws AS window_start_us
FROM events e JOIN win
  ON epoch_us(e.ts) >= win.ws AND epoch_us(e.ts) < win.ws + {_WIN_LEN_US}
WHERE e.event_type = 'purchase'
"""
