"""Bloom-filter build + Bloom-prefiltered exact semi-join.

The scale story: a shuffle semi-join moves EVERY probe row to its hash
partition, even the ~all of them that can't possibly match. A Bloom
filter over the build side is O(m) bits (here 64 Kbit = 8 KB), broadcast
once with ``ray.put``, and drops non-matching probe rows INSIDE the
zero-shuffle probe ``map_batches`` — only bloom survivors (true matches
plus the small false-positive tail) enter the exchange. The final result
stays EXACT because the survivors still go through the engine's salted
co-partitioned merge against the real key set; the bloom only shrinks the
shuffle payload. This is the classic runtime-filter / sideways-
information-passing pattern (cf. SparkSQL/Presto runtime bloom filters).

Everything is integer-exact and oracle-checkable: the k=4 hash functions
are 64-bit multiply-shift (``(x * Ai mod 2^64) >> 48`` → 16-bit register
index), which DuckDB reproduces bit-for-bit in HUGEINT arithmetic — the
same trick as doc_sample / the HLL and CMS register sketches. Three
driver queries:

- ``orders_bloom_registers`` — the filter itself (distinct set bits over
  urgent-order keys), value-hash-checked.
- ``lineitem_bloom_semijoin`` — revenue per ship-month of lineitems
  belonging to urgent orders; bloom-prefiltered, exact salted semi-join,
  plain-SQL semi-join oracle (the bloom is invisible in the answer —
  that's the point).
- ``lineitem_bloom_fp_stats`` — (n_probe, n_pass_bloom, n_true_match,
  n_false_pos) — the filter's measured selectivity and false-positive
  count, reproduced EXACTLY in SQL by re-deriving the register table and
  membership test per probe row.

Filter build is distributed: per-batch distinct bit positions (bounded by
m per batch) → tiny groupby → O(m)-row driver pull. At any build-side
cardinality the pull stays ≤ m = 65,536 rows.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .dataops import _cents, _key_salt

_BLOOM_BITS = 16                       # register index bits
_BLOOM_M = 1 << _BLOOM_BITS            # 65,536 bits = 8 KB broadcast
_BLOOM_SHIFT = 64 - _BLOOM_BITS        # multiply-shift: take top 16 bits
# odd 64-bit multipliers (golden ratio + xxhash primes)
_BLOOM_A = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)
_BUILD_PRIORITY = "1-URGENT"


def _bit_positions(keys: np.ndarray) -> np.ndarray:
    """k hash positions per key, flattened (vectorized multiply-shift)."""
    x = keys.astype(np.uint64)
    return np.concatenate(
        [(x * np.uint64(a)) >> np.uint64(_BLOOM_SHIFT) for a in _BLOOM_A]
    ).astype(np.int64)


def _urgent_orders(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.equal(batch.column("o_orderpriority"), _BUILD_PRIORITY)
        )
        return t.select(["o_orderkey"])

    return ds.map_batches(keep, batch_format="pyarrow")


def orders_bloom_registers(sf_dir: str) -> ray.data.Dataset:
    """Distinct Bloom bit positions set by urgent-order keys."""

    def partials(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        bits = np.unique(_bit_positions(k))
        return pa.Table.from_arrays([pa.array(bits)], names=["bit_pos"])

    return (
        _urgent_orders(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bit_pos")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["bit_pos"])
    )


def _bloom_array_ref(sf_dir: str):
    """Materialize the filter as an m-bool array and broadcast it.
    Driver pull is bounded by m rows regardless of build cardinality."""
    regs = orders_bloom_registers(sf_dir).to_pandas()  # ≤ _BLOOM_M rows
    bits = np.zeros(_BLOOM_M, dtype=bool)
    if len(regs):
        bits[regs["bit_pos"].to_numpy(np.int64)] = True
    return ray.put(bits)


def _bloom_pass(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    x = keys.astype(np.uint64)
    ok = np.ones(len(keys), dtype=bool)
    for a in _BLOOM_A:
        ok &= bits[((x * np.uint64(a)) >> np.uint64(_BLOOM_SHIFT)).astype(np.int64)]
    return ok


_SEMI_SCHEMA = pa.schema(
    [("k", pa.int64()), ("salt", pa.int64()), ("kind", pa.int8()),
     ("ship_month", pa.int64()), ("cents", pa.int64()), ("n", pa.int64())]
)
_OUT_SCHEMA = pa.schema(
    [("ship_month", pa.int64()), ("revenue_cents", pa.int64()),
     ("n_items", pa.int64())]
)


def lineitem_bloom_semijoin(sf_dir: str) -> ray.data.Dataset:
    """Revenue (integer cents) per ship-month over lineitems of urgent
    orders: bloom-prefilter (zero-shuffle) → per-batch partial agg by
    (orderkey, month) → salted co-partitioned EXACT semi-join → per-
    partition partials → tiny final month groupby."""
    bits_ref = _bloom_array_ref(sf_dir)

    def tag_build(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch.column("o_orderkey"), dtype=np.int64))
        n = len(k)
        z = np.zeros(n, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array(np.zeros(n, dtype=np.int8)),
             pa.array(z), pa.array(z), pa.array(z)],
            schema=_SEMI_SCHEMA,
        )

    def tag_probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        k = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        surv = pa.array(_bloom_pass(bits, k))
        t = batch.filter(surv)
        if t.num_rows == 0:
            return _SEMI_SCHEMA.empty_table()
        d = t.column("l_shipdate")
        month = pc.add(
            pc.multiply(pc.cast(pc.year(d), pa.int64()), 100),
            pc.cast(pc.month(d), pa.int64()),
        )
        pre = pa.Table.from_arrays(
            [t.column("l_orderkey"), month, _cents(t.column("l_extendedprice"))],
            names=["k", "ship_month", "cents"],
        )
        g = pre.group_by(["k", "ship_month"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        ).rename_columns(["k", "ship_month", "cents", "n"])
        kk = np.asarray(g.column("k"), dtype=np.int64)
        return pa.Table.from_arrays(
            [g.column("k"), pa.array(_key_salt(kk)),
             pa.array(np.ones(len(kk), dtype=np.int8)),
             g.column("ship_month"), g.column("cents"), g.column("n")],
            schema=_SEMI_SCHEMA,
        )

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["kind"] == 0, "k"].unique()
        p = g.loc[(g["kind"] == 1) & g["k"].isin(have)]
        out = p.groupby("ship_month", as_index=False).agg(
            revenue_cents=("cents", "sum"), n_items=("n", "sum")
        )
        return out.astype("int64")

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        return batch.select(_OUT_SCHEMA.names).cast(_OUT_SCHEMA)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_shipdate"],
    )
    both = _urgent_orders(sf_dir).map_batches(
        tag_build, batch_format="pyarrow"
    ).union(li.map_batches(tag_probe, batch_format="pyarrow"))
    partial = (
        both.groupby("salt")
        .map_groups(semi, batch_format="pandas")
        .map_batches(stamp, batch_format="pyarrow")
    )
    return partial.groupby("ship_month").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    )


_FP_SCHEMA = pa.schema(
    [("k", pa.int64()), ("salt", pa.int64()), ("kind", pa.int8()),
     ("n_rows", pa.int64()), ("n_pass", pa.int64())]
)
_FP_OUT = pa.schema(
    [("n_probe", pa.int64()), ("n_pass_bloom", pa.int64()),
     ("n_true_match", pa.int64()), ("n_false_pos", pa.int64())]
)


def lineitem_bloom_fp_stats(sf_dir: str) -> ray.data.Dataset:
    """Measured bloom selectivity, one exact row: probe rows, bloom
    passes, true matches, false positives. Needs the real key set for
    truth, so it rides the same salted merge; per-partition partial sums
    → one 4-column global sum."""
    bits_ref = _bloom_array_ref(sf_dir)

    def tag_build(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch.column("o_orderkey"), dtype=np.int64))
        n = len(k)
        z = np.zeros(n, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array(np.zeros(n, dtype=np.int8)), pa.array(z), pa.array(z)],
            schema=_FP_SCHEMA,
        )

    def tag_probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        k = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        if len(k) == 0:
            return _FP_SCHEMA.empty_table()
        ok = _bloom_pass(bits, k)
        df = pd.DataFrame({"k": k, "n_rows": 1, "n_pass": ok.astype(np.int64)})
        g = df.groupby("k", as_index=False).sum()
        kk = g["k"].to_numpy(np.int64)
        return pa.Table.from_arrays(
            [pa.array(kk), pa.array(_key_salt(kk)),
             pa.array(np.ones(len(kk), dtype=np.int8)),
             pa.array(g["n_rows"].to_numpy(np.int64)),
             pa.array(g["n_pass"].to_numpy(np.int64))],
            schema=_FP_SCHEMA,
        )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        have = set(g.loc[g["kind"] == 0, "k"].to_numpy())
        p = g[g["kind"] == 1]
        hit = p["k"].isin(have)
        return pd.DataFrame(
            {
                "n_probe": [int(p["n_rows"].sum())],
                "n_pass_bloom": [int(p["n_pass"].sum())],
                "n_true_match": [int(p.loc[hit, "n_rows"].sum())],
                # bloom has no false negatives: every true match passes,
                # so FP rows = passes − true-match rows
                "n_false_pos": [
                    int(p["n_pass"].sum()) - int(p.loc[hit, "n_rows"].sum())
                ],
            }
        )

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _FP_OUT.empty_table()
        return batch.select(_FP_OUT.names).cast(_FP_OUT)

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    both = _urgent_orders(sf_dir).map_batches(
        tag_build, batch_format="pyarrow"
    ).union(li.map_batches(tag_probe, batch_format="pyarrow"))
    partial = (
        both.groupby("salt")
        .map_groups(stats, batch_format="pandas")
        .map_batches(stamp, batch_format="pyarrow")
    )

    def combine(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array([int(pc.sum(batch.column(c)).as_py() or 0)])
             for c in _FP_OUT.names],
            schema=_FP_OUT,
        )

    # 4-int rows, one per non-empty partition → a single map over the
    # (tiny) concatenated partials; repartition(1) keeps it one block
    return partial.repartition(1).map_batches(combine, batch_format="pyarrow")


def _h_sql(col: str, a: int) -> str:
    return (
        f"((({col}::HUGEINT * {a}) % 18446744073709551616) "
        f"// {1 << _BLOOM_SHIFT})::BIGINT"
    )


def bloom_registers_oracle_sql() -> str:
    parts = [
        f"SELECT {_h_sql('o_orderkey', a)} AS bit_pos FROM orders "
        f"WHERE o_orderpriority = '{_BUILD_PRIORITY}'"
        for a in _BLOOM_A
    ]
    return "SELECT DISTINCT bit_pos FROM (" + " UNION ALL ".join(parts) + ")"


def bloom_semijoin_oracle_sql() -> str:
    return (
        "SELECT (year(l_shipdate)*100 + month(l_shipdate))::BIGINT AS ship_month, "
        "sum(cast(round(l_extendedprice*100) AS BIGINT))::BIGINT AS revenue_cents, "
        "count(*)::BIGINT AS n_items "
        "FROM lineitem WHERE l_orderkey IN "
        f"(SELECT o_orderkey FROM orders WHERE o_orderpriority = '{_BUILD_PRIORITY}') "
        "GROUP BY 1"
    )


def bloom_fp_stats_oracle_sql() -> str:
    regs = bloom_registers_oracle_sql()
    joins = " ".join(
        f"LEFT JOIN b b{i} ON b{i}.bit_pos = {_h_sql('li.x', a)}"
        for i, a in enumerate(_BLOOM_A)
    )
    passes = " AND ".join(f"b{i}.bit_pos IS NOT NULL" for i in range(len(_BLOOM_A)))
    return (
        f"WITH b AS ({regs}), "
        "k AS (SELECT DISTINCT o_orderkey AS x FROM orders "
        f"WHERE o_orderpriority = '{_BUILD_PRIORITY}'), "
        "t AS (SELECT (k.x IS NOT NULL) AS hit, "
        f"({passes}) AS pass "
        "FROM (SELECT l_orderkey AS x FROM lineitem) li "
        f"LEFT JOIN k ON k.x = li.x {joins}) "
        "SELECT count(*)::BIGINT AS n_probe, "
        "sum(pass::BIGINT)::BIGINT AS n_pass_bloom, "
        "sum(hit::BIGINT)::BIGINT AS n_true_match, "
        "sum((pass AND NOT hit)::BIGINT)::BIGINT AS n_false_pos FROM t"
    )
