"""Salted two-phase aggregation for skew-heavy keys.

The pipeline's default skew defense is the per-batch partial combine
(stages/conflate.py) — one row per key per batch regardless of skew. This
utility is the explicit SALTED variant for shuffling operations where the
combine isn't applicable (e.g. ``map_groups`` that needs all rows of a
key): phase 1 groups on (key, salt) with salt = row_hash % S so a hot
key's rows spread over S reducers; phase 2 merges the S partials per key.
Used when a single conversation / entity would otherwise overflow one
reducer at 10^12-turn scale (SURVEY.md §4 skew row).
"""
from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def salted_groupby_sum(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    num_salts: int = 16,
) -> ray.data.Dataset:
    """SUM(value) GROUP BY key, executed as two shuffles none of which
    sees more than ~1/num_salts of a hot key's rows."""

    def add_salt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # salt from the VALUE position, not the key — a hot key's rows get
        # uniformly distributed salts
        vals = batch.column(value)
        salts = pc.bit_wise_and(
            pc.cast(pc.multiply(pc.cast(vals, pa.int64()), 2654435761), pa.int64()),
            num_salts - 1,
        )
        return batch.select([key, value]).append_column("salt", pc.cast(salts, pa.int32()))

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "salt"])
        .aggregate(Sum(value, alias_name=value))
    )
    return phase1.groupby(key).aggregate(Sum(value, alias_name=value))
