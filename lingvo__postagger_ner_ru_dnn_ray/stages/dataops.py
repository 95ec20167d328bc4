"""Large-scale training-data operations over the driver's generic tables
(documents / embeddings / events / TPC-H-ish star schema).

These are the first-class data-pipeline operators a 100 TB corpus engine
needs beyond the reference's NLP stages: deduplication (exact, n-gram
Jaccard, MinHash+LSH, SimHash), similarity search (brute-force cosine
top-k + the LSH-bucketed scale path), text analysis (language-ID, quality
scoring, token counting, fingerprinting), windowed/sessionized event
aggregation, and the relational basics (group-agg, broadcast join,
sort/limit). Every operator is a streaming ``map_batches`` composition with
explicit partial-aggregation before any shuffle; small sides are broadcast
with ``ray.put``.
"""
from __future__ import annotations

import hashlib
import math
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

# --------------------------------------------------------------------------- #
# helpers

def _docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _cents(x) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(x, 100.0)), pa.int64())


# --------------------------------------------------------------------------- #
# exact dedup: hash-partition on content hash + per-group representative

_TEXT_MD5_MEMO: dict[str, str] = {}  # per-worker; duplicate-heavy corpora hit it


def _text_md5(t: str) -> str:
    h = _TEXT_MD5_MEMO.get(t)
    if h is None:
        if len(_TEXT_MD5_MEMO) > 100_000:  # bound worker heap (keys are texts)
            _TEXT_MD5_MEMO.clear()
        h = _TEXT_MD5_MEMO[t] = hashlib.md5(t.encode()).hexdigest()
    return h


def doc_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keep min(doc_id) per exact text duplicate group.
    Oracle: GROUP BY md5(text). The hash is only the shuffle key — grouping
    is identical for any collision-free hash, so values match the oracle.
    (md5 itself can't be vectorized from Python; the per-worker memo
    absorbs the duplicate mass, which is exactly the hot case here.)"""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [_text_md5(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(h, pa.string())], names=["doc_id", "h"]
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(add_hash, batch_format="pyarrow")
    out = ds.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return out.select_columns(["doc_id", "n_dups"])


# --------------------------------------------------------------------------- #
# token counting / quality scoring / language id — pure vectorized maps

_STOPWORDS = ("the", "a", "of", "and", "to")


def doc_token_count(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n_ws = pc.list_value_length(toks)
        # BPE-ish regex token count (words + isolated non-word chars) —
        # Arrow's RE2 kernel, the same engine the DuckDB oracle uses
        # (Python re's Unicode \w would diverge on non-ASCII text)
        n_rx = pc.cast(
            pc.count_substring_regex(batch.column("text"), r"\w+|[^\w\s]"), pa.int64()
        )
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pc.cast(n_ws, pa.int64()), n_rx,
             pc.cast(pc.utf8_length(batch.column("text")), pa.int64())],
            names=["doc_id", "n_ws_tokens", "n_rx_tokens", "n_chars"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Integer quality signals (word count, stopword count, max word length)
    — integer-valued so the DuckDB comparison is exact."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_words, n_stop, max_wl = [], [], []
        stop = set(_STOPWORDS)
        for t in texts:
            ws = t.split(" ")
            n_words.append(len(ws))
            n_stop.append(sum(1 for w in ws if w in stop))
            max_wl.append(max((len(w) for w in ws), default=0))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(n_words, pa.int64()),
             pa.array(n_stop, pa.int64()), pa.array(max_wl, pa.int64())],
            names=["doc_id", "n_words", "n_stop", "max_word_len"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_langid(sf_dir: str) -> ray.data.Dataset:
    """Script-ratio language heuristic: cyrillic vs latin letter counts —
    two Arrow count_substring_regex kernels, no Python per-row loop."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cyr = pc.count_substring_regex(text, "[а-яА-ЯёЁ]")
        lat = pc.count_substring_regex(text, "[a-zA-Z]")
        preds = pc.if_else(pc.greater(cyr, lat), "ru", "en")
        return pa.Table.from_arrays(
            [batch.column("doc_id"), preds], names=["doc_id", "lang_pred"]
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_len_histogram(sf_dir: str, bucket_chars: int = 100) -> ray.data.Dataset:
    """Document-length histogram (len//100 buckets) — the Corpus.cs:210-316
    token-length-histogram analogue as a partial-count → groupby-sum."""

    def partials(batch: pa.Table) -> pa.Table:
        b = pc.divide(pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                      bucket_chars)
        t = pa.Table.from_arrays([b], names=["len_bucket"])
        g = t.group_by(["len_bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["len_bucket", "n_docs"])

    part = _docs(sf_dir, ["text"]).map_batches(partials, batch_format="pyarrow")
    return part.groupby("len_bucket").aggregate(Sum("n_docs", alias_name="n_docs"))


# --------------------------------------------------------------------------- #
# token frequency (vocab build): partial counts per batch -> small groupby

def doc_token_freq(sf_dir: str, top_k: int = 100) -> ray.data.Dataset:
    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.Table.from_arrays([toks], names=["token"])
        g = t.group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "freq"])

    ds = _docs(sf_dir, ["text"]).map_batches(partials, batch_format="pyarrow")
    out = ds.groupby("token").aggregate(Sum("freq", alias_name="freq"))
    return out.sort(["freq", "token"], descending=[True, False]).limit(top_k)


# --------------------------------------------------------------------------- #
# n-gram Jaccard near-dup (exact, capped) — the SQL-checkable baseline

_JACCARD_CAP = 500  # doc_id < cap on both sides keeps the O(n²) pair space fixed


def _shingles(text: str, n: int = 3) -> frozenset:
    ws = text.split(" ")
    if len(ws) < n:
        return frozenset({" ".join(ws)})
    return frozenset(" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1))


def doc_jaccard_pairs(sf_dir: str, threshold_pct: int = 1) -> ray.data.Dataset:
    """All-pairs 3-gram Jaccard over doc_id < 500 (exact O(n²) baseline;
    the MinHash+LSH operator below is the at-scale path). The small side
    (all capped shingle sets) is broadcast via ray.put once."""
    tbl = (
        _docs(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id < {_JACCARD_CAP}")
        .to_pandas()
    )
    sets = {int(r.doc_id): _shingles(r.text) for r in tbl.itertuples()}
    ref = ray.put(sets)

    def pairs(batch: pa.Table) -> pa.Table:
        all_sets = ray.get(ref)
        a_out, b_out, j_out = [], [], []
        for a in batch.column("doc_id").to_pylist():
            sa = all_sets.get(a)
            if sa is None:
                continue
            for b, sb in all_sets.items():
                if b <= a:
                    continue
                inter = len(sa & sb)
                if inter == 0:
                    continue
                jac = (100 * inter) // (len(sa) + len(sb) - inter)
                if jac >= threshold_pct:
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(jac)
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()),
             pa.array(j_out, pa.int64())],
            names=["doc_a", "doc_b", "jaccard_pct"],
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .filter(expr=f"doc_id < {_JACCARD_CAP}")
        .map_batches(pairs, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# MinHash + LSH near-dup — the at-scale path (shingle→minhash→band→groupby)
#
# All hashing is md5-derived and the modulus is the Mersenne prime 2^31-1,
# so a*h+b stays below 2^62 and numpy-uint64 / DuckDB-BIGINT arithmetic
# agree EXACTLY — the driver oracle recomputes the identical pair set in
# pure SQL (md5_number_upper == little-endian first 8 bytes of md5).

_MH_PERMS = 64
_MH_BANDS = 32  # 32 bands × 2 rows: P(candidate | j=0.5) ≈ 0.9997
_MH_P = np.uint64((1 << 31) - 1)  # 2147483647
# LSH rows group on salt = hash(band, bucket) % N_SALTS: group size is a
# bounded 1/N_SALTS slice of the band rows (scale knob: set ≈ 32-64 ×
# cluster cores so groups stay block-sized), group COUNT is fixed so the
# per-group Python dispatch cost stays constant, and the duplicated-
# bucket scan inside each group is vectorized pandas.
_MH_N_SALTS = 1024

_MH_RNG = np.random.RandomState(1234)
_MH_A = _MH_RNG.randint(1, int(_MH_P), size=_MH_PERMS).astype(np.uint64)
_MH_B = _MH_RNG.randint(0, int(_MH_P), size=_MH_PERMS).astype(np.uint64)


def _md5_u64(s: str) -> int:
    """First 8 bytes of md5, little-endian == DuckDB md5_number_upper()."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


_JOIN_SALTS = 512  # scale knob: ≈ 16-32 × cluster cores


def _key_salt(k: np.ndarray) -> np.ndarray:
    """Multiply-hash int64 keys into _JOIN_SALTS bounded partitions
    (vectorized; the partition is the map_groups unit so per-group Python
    dispatch is O(partitions), never O(keys))."""
    return (
        ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
        % np.uint64(_JOIN_SALTS)
    ).astype(np.int64)


_EMPTY_MERGE_FRAME = pd.DataFrame({
    "k": pd.Series([], dtype="int64"), "salt": pd.Series([], dtype="int64"),
    "kind": pd.Series([], dtype="int8"), "other": pd.Series([], dtype="int64"),
    "payload": pd.Series([], dtype="object"),
})


_SHINGLE_HASH_MEMO: dict[str, int] = {}  # per-worker cache (Zipfian shingles)


def _shingle_hash(s: str) -> int:
    """md5-derived shingle hash mod 2^31-1, memoized per worker — the
    per-shingle Python md5 is the minhash family's wall-clock dominator
    and md5 itself is load-bearing for the SQL oracle, so memoization is
    the available lever (bounded + self-clearing like _word_hash)."""
    h = _SHINGLE_HASH_MEMO.get(s)
    if h is None:
        if len(_SHINGLE_HASH_MEMO) > 1_000_000:  # bound worker heap
            _SHINGLE_HASH_MEMO.clear()
        h = _SHINGLE_HASH_MEMO[s] = int(_md5_u64(s)) % 2147483647
    return h


def _minhash_sig(sh: frozenset) -> np.ndarray:
    if not sh:
        return np.zeros(_MH_PERMS, dtype=np.uint64)
    hv = np.fromiter((_shingle_hash(s) for s in sh), dtype=np.uint64, count=len(sh))
    # universal hashing (a*x + b) mod p — products < 2^62, no uint64 wrap
    return ((_MH_A[:, None] * hv[None, :] + _MH_B[:, None]) % _MH_P).min(axis=1)


def _mh_to_bands(batch: pa.Table) -> pa.Table:
    """Per doc, _MH_BANDS rows (doc_id, band, bucket, salt) where bucket is
    the EXACT (s0<<31 | s1) encoding of the band's two 31-bit signature
    rows and salt = hash(band, bucket) % _MH_N_SALTS."""
    n = batch.num_rows
    ids = np.repeat(np.asarray(batch.column("doc_id"), dtype=np.int64), _MH_BANDS)
    bands = np.tile(np.arange(_MH_BANDS, dtype=np.int32), n)
    buckets = np.empty(n * _MH_BANDS, dtype=np.int64)
    for r, text in enumerate(batch.column("text").to_pylist()):
        sig = _minhash_sig(_shingles(text))
        packed = (sig[0::2].astype(np.int64) << 31) | sig[1::2].astype(np.int64)
        buckets[r * _MH_BANDS : (r + 1) * _MH_BANDS] = packed
    salt = (
        (buckets.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        ^ (bands.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
    ) % np.uint64(_MH_N_SALTS)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(bands), pa.array(buckets),
         pa.array(salt.astype(np.int64))],
        names=["doc_id", "band", "bucket", "salt"],
    )


# pair LISTING only: emit pairs among at most this many (sorted) docs per
# duplicated (band, bucket) — a web-scale duplicate cluster of 10^5 docs
# would otherwise emit C(m,2) ≈ 5·10^9 pairs from one bucket. Truncation
# is deterministic (lowest doc_ids win) and logged. The dedup operator
# does NOT go through pairs at all — it uses linear representative links.
_LSH_BUCKET_DOC_CAP = 256


def _distinct_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """DISTINCT (doc_a, doc_b) via salted hash partitions: a per-key
    groupby would dispatch Python per group (O(#pairs) groups); instead
    hash the pair into _JOIN_SALTS bounded partitions and drop_duplicates
    vectorized inside each — O(partitions) dispatch."""

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64())],
                names=["doc_a", "doc_b", "salt"],
            )
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        key = (a << np.int64(32)) ^ b  # doc ids fit 32 bits
        return pa.Table.from_arrays(
            [pa.array(a), pa.array(b), pa.array(_key_salt(key))],
            names=["doc_a", "doc_b", "salt"],
        )

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["doc_a", "doc_b"])
        return pd.DataFrame({
            "doc_a": pd.Series(out["doc_a"].to_numpy(), dtype="int64"),
            "doc_b": pd.Series(out["doc_b"].to_numpy(), dtype="int64"),
        })

    return (
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(distinct, batch_format="pandas")
    )


def _verify_candidate_pairs(
    docs: ray.data.Dataset, cand: ray.data.Dataset, verify_threshold_pct: int,
    emit: str = "pairs", dedup_cand: bool = False,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs via two
    reduce-side co-partitioned groupby merges (hash-partitioned on the doc
    id; nothing is ever materialized on the driver). Each partition
    receives every needed text ONCE per (partition, doc) — pair rows carry
    only ids; a-side texts ship as separate deduplicated payload rows —
    so the shuffle payload is linear in docs-per-partition, not in pairs.
    (groupby-on-salt rather than Dataset.join: Ray 2.49's join aggregator
    synthesizes schema-less tables for empty hash partitions and Acero
    then rejects the key field; salting keeps per-group Python dispatch
    at O(partitions).) ``emit="pairs"`` yields (doc_a, doc_b,
    jaccard_pct ≥ threshold); ``emit="keep"`` yields the DEDUP KEEP-LIST
    (doc_id) directly — pass 2 is co-partitioned on salt(doc_b) with
    EVERY doc's row present, so "this doc has no verified lower-id link"
    is a partition-local fact and the separate anti-join stage of the
    old keep-list construction disappears.

    ``dedup_cand=True`` makes candidate DISTINCT a pass-1 partition-local
    fact instead of a dedicated upstream shuffle: every copy of (a, b)
    carries k = a, so all copies land in the same salt group and a
    vectorized drop_duplicates there IS global distinct — one whole
    sort-shuffle cheaper than chaining _distinct_pairs in front."""

    def tag_docs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)), pa.array([0] * n, pa.int8()),
             pa.nulls(n, pa.int64()), batch.column("text")],
            names=["k", "salt", "kind", "other", "payload"],
        )

    def tag_cand(batch: pa.Table) -> pa.Table:
        # key on doc_a for the first merge
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int8()), pa.array([], pa.int64()),
                 pa.array([], pa.string())],
                names=["k", "salt", "kind", "other", "payload"],
            )
        n = batch.num_rows
        k = np.asarray(batch.column("doc_a"), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)), pa.array([1] * n, pa.int8()),
             batch.column("doc_b"), pa.nulls(n, pa.string())],
            names=["k", "salt", "kind", "other", "payload"],
        )

    def attach_text_a(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized hash-merge of all keys in this salt partition; re-key
        # pairs on doc_b for pass 2. text_a is NOT carried per pair: pair
        # rows (kind 1) are id-only, and one payload row (kind 2) per
        # distinct (target partition, doc_a) carries the text.
        docs_g = g[g["kind"] == 0][["k", "payload"]].rename(columns={"payload": "text_a"})
        c = g[g["kind"] == 1][["k", "other"]]
        if dedup_cand and not c.empty:
            # all copies of (a, b) share k = a → this group sees them all;
            # local drop_duplicates == global DISTINCT
            c = c.drop_duplicates(["k", "other"])
        if docs_g.empty or c.empty:
            return _EMPTY_MERGE_FRAME.copy()
        m = c.merge(docs_g, on="k", how="inner")
        k2 = m["other"].to_numpy(dtype=np.int64)
        salt2 = _key_salt(k2)
        pair_rows = pd.DataFrame({
            "k": pd.Series(k2, dtype="int64"),
            "salt": pd.Series(salt2, dtype="int64"),
            "kind": pd.Series([1] * len(m), dtype="int8"),
            "other": pd.Series(m["k"].to_numpy(), dtype="int64"),
            "payload": pd.Series([None] * len(m), dtype="object"),
        })
        pay = pd.DataFrame({
            "k": pd.Series(m["k"].to_numpy(), dtype="int64"),
            "salt": pd.Series(salt2, dtype="int64"),
            "kind": pd.Series([2] * len(m), dtype="int8"),
            "other": pd.Series([0] * len(m), dtype="int64"),
            "payload": pd.Series(m["text_a"].to_numpy(), dtype="object"),
        }).drop_duplicates(["salt", "k"])
        return pd.concat([pair_rows, pay], ignore_index=True)

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        docs_g = g[g["kind"] == 0]
        texts_b = dict(zip(docs_g["k"], docs_g["payload"]))
        texts_a_g = g[g["kind"] == 2]
        texts_a = dict(zip(texts_a_g["k"], texts_a_g["payload"]))
        c = g[g["kind"] == 1]
        a_out, b_out, j_out = [], [], []
        sh_memo: dict = {}  # doc id -> shingle set, both sides

        def sh_of(doc_id, texts):
            s = sh_memo.get(doc_id)
            if s is None:
                s = sh_memo[doc_id] = _shingles(texts[doc_id])
            return s

        dropped: set = set()
        for b_key, a_id in zip(c["k"], c["other"]):
            if b_key not in texts_b or a_id not in texts_a:
                continue
            if emit == "keep" and b_key in dropped:
                continue
            sa = sh_of(a_id, texts_a)
            sb = sh_of(b_key, texts_b)
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = (100 * inter) // (len(sa) + len(sb) - inter)
            if jac >= verify_threshold_pct:
                if emit == "keep":
                    dropped.add(b_key)
                else:
                    a_out.append(int(a_id))
                    b_out.append(int(b_key))
                    j_out.append(jac)
        if emit == "keep":
            keep = np.sort(
                np.array([k for k in texts_b if k not in dropped], dtype=np.int64)
            )
            return pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64")})
        return pd.DataFrame({
            "doc_a": pd.Series(a_out, dtype="int64"),
            "doc_b": pd.Series(b_out, dtype="int64"),
            "jaccard_pct": pd.Series(j_out, dtype="int64"),
        })

    union_schema = pa.schema(
        [("k", pa.int64()), ("salt", pa.int64()), ("kind", pa.int8()),
         ("other", pa.int64()), ("payload", pa.string())]
    )

    def to_arrow(batch: pa.Table) -> pa.Table:
        # unioned datasets must share one block type; re-stamp the pandas
        # map_groups output as schema'd Arrow
        if batch.num_columns == 0 or batch.num_rows == 0:
            return union_schema.empty_table()
        return batch.select(union_schema.names).cast(union_schema)

    docs_tagged = docs.map_batches(tag_docs, batch_format="pyarrow")
    cand_tagged = cand.map_batches(tag_cand, batch_format="pyarrow")
    with_a = (
        docs_tagged.union(cand_tagged)
        .groupby("salt")
        .map_groups(attach_text_a, batch_format="pandas")
        .map_batches(to_arrow, batch_format="pyarrow")
    )
    return docs_tagged.union(with_a).groupby("salt").map_groups(
        verify_partition, batch_format="pandas"
    )


def doc_minhash_pairs(sf_dir: str, verify_threshold_pct: int = 1) -> ray.data.Dataset:
    """MinHash(64) + LSH(32×2) near-duplicate PAIR LISTING, scale-safe:

    1. _mh_to_bands: per doc, 32 rows (doc_id, band, bucket) — bucket is
       the exact (s0<<31 | s1) signature encoding, so the candidate set is
       precisely signature equality (no hash collisions).
    2. candidates: groupby salt = hash(band, bucket) % N_SALTS — all rows
       of one (band, bucket) land in one bounded group; the duplicated-
       bucket pair scan inside each group is vectorized numpy
       (triu_indices), emission per bucket is CAPPED at
       C(_LSH_BUCKET_DOC_CAP, 2) with deterministic lowest-ids-win
       truncation (logged) so one giant duplicate cluster cannot emit a
       quadratic pair set; cross-band dedup happens inside verification
       pass 1 (dedup_cand — partition-local distinct == global
       distinct). (The dedup REMOVAL operator doc_dedup_minhash does not
       go through pairs at all — linear representative links.)
    3. verify: exact Jaccard via _verify_candidate_pairs (two reduce-side
       co-partitioned merges; texts cross the shuffle once per partition,
       not once per pair).

    Emits verified pairs (doc_a, doc_b, jaccard_pct). The SQL oracle
    reproduces the per-bucket cap exactly (row_number over doc_id), so
    Ray == oracle at ANY scale, including buckets past the cap."""
    rows_per_band = _MH_PERMS // _MH_BANDS
    assert rows_per_band == 2  # bucket packing assumes 2×31-bit rows

    def salted_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one group per salt: vectorized scan over its (band, bucket) runs
        g = group[group.duplicated(["band", "bucket"], keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        a_out, b_out = [], []
        dropped = 0
        for _, ids in g.groupby(["band", "bucket"], sort=False)["doc_id"]:
            u = np.unique(ids.to_numpy())
            if len(u) > _LSH_BUCKET_DOC_CAP:
                dropped += len(u) - _LSH_BUCKET_DOC_CAP
                u = u[:_LSH_BUCKET_DOC_CAP]
            ii, jj = np.triu_indices(len(u), k=1)
            a_out.append(u[ii])
            b_out.append(u[jj])
        if dropped:
            print(
                f"[doc_minhash_pairs] bucket cap {_LSH_BUCKET_DOC_CAP}: "
                f"dropped {dropped} docs from pair emission"
            )
        a = np.concatenate(a_out) if a_out else np.array([], dtype=np.int64)
        b = np.concatenate(b_out) if b_out else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {"doc_a": pd.Series(a, dtype="int64"), "doc_b": pd.Series(b, dtype="int64")}
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(_mh_to_bands, batch_format="pyarrow")
    cand = bands.groupby("salt").map_groups(salted_pairs, batch_format="pandas")
    # cross-band candidate dedup happens INSIDE verification pass 1
    # (dedup_cand: partition-local distinct == global distinct) — no
    # dedicated _distinct_pairs shuffle
    return _verify_candidate_pairs(docs, cand, verify_threshold_pct, dedup_cand=True)


def _mh_band_cte() -> str:
    """Shared WITH-prefix (shingles → md5 hashes → 64 permutations →
    32 packed band buckets) used by both minhash oracles — computes the
    identical bands the Ray side computes, bit for bit."""
    perm_vals = ", ".join(
        f"({i},{int(_MH_A[i])},{int(_MH_B[i])})" for i in range(_MH_PERMS)
    )
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), s AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(1, len(ws)-2)),
    i -> array_to_string(list_slice(ws, i, i+2), ' '))) AS sh
  FROM d
), hv AS (
  SELECT doc_id, (md5_number_upper(unnest(sh)) % 2147483647)::BIGINT AS h FROM s
), perms(i, a, b) AS (VALUES {perm_vals}),
sig AS (
  SELECT doc_id, i, min((a * h + b) % 2147483647) AS v FROM hv, perms GROUP BY doc_id, i
), band AS (
  SELECT doc_id, i // 2 AS band,
         (min(CASE WHEN i % 2 = 0 THEN v END) << 31)
         | min(CASE WHEN i % 2 = 1 THEN v END) AS bucket
  FROM sig GROUP BY doc_id, i // 2
)"""


def minhash_oracle_sql(verify_threshold_pct: int = 1) -> str:
    """DuckDB SQL that reproduces doc_minhash_pairs EXACTLY (same md5-based
    shingle hashes, same (a,b) permutation constants, same band equality,
    same integer Jaccard verification, same per-bucket doc cap — the Ray
    side keeps the _LSH_BUCKET_DOC_CAP lowest doc ids per (band, bucket),
    deterministic + logged, and the row_number cap below reproduces it)."""
    return f"""{_mh_band_cte()}, bandc AS (
  SELECT doc_id, band, bucket FROM (
    SELECT doc_id, band, bucket, row_number() OVER (
      PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM (SELECT DISTINCT doc_id, band, bucket FROM band))
  WHERE rn <= {_LSH_BUCKET_DOC_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandc a JOIN bandc b ON a.band = b.band AND a.bucket = b.bucket
                            AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
  100 * len(list_intersect(sa.sh, sb.sh)) //
  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard_pct
FROM cand c JOIN s sa ON c.doc_a = sa.doc_id JOIN s sb ON c.doc_b = sb.doc_id
WHERE len(list_intersect(sa.sh, sb.sh)) > 0
  AND 100 * len(list_intersect(sa.sh, sb.sh)) //
      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
      >= {verify_threshold_pct}
"""


# --------------------------------------------------------------------------- #
# SimHash fingerprints

_WORD_HASH_MEMO: dict[str, int] = {}  # per-worker Zipfian word-hash cache


def _word_hash(w: str) -> int:
    h = _WORD_HASH_MEMO.get(w)
    if h is None:
        if len(_WORD_HASH_MEMO) > 1_000_000:  # bound worker heap
            _WORD_HASH_MEMO.clear()
        h = _WORD_HASH_MEMO[w] = _md5_u64(w)
    return h


def _simhash_arr(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per text (int64, offset by -2^63 so it round-trips
    Arrow/DuckDB BIGINT). Word hashes memoized per worker; the bit-vote
    is one vectorized numpy reduction per document."""
    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)
    out = np.empty(len(texts), dtype=np.int64)
    for r, text in enumerate(texts):
        hs = np.array([_word_hash(w) for w in text.split(" ")], dtype=np.uint64)
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # [W, 64]
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        val = int(weights[acc > 0].sum(dtype=np.uint64))
        out[r] = val - (1 << 63)
    return out


def doc_simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash over whitespace tokens; the driver oracle recomputes
    the identical value in SQL via md5_number_upper."""

    def fn(batch: pa.Table) -> pa.Table:
        out = _simhash_arr(batch.column("text").to_pylist())
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(out)], names=["doc_id", "simhash"]
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


SIMHASH_ORACLE_SQL = """
WITH w AS (
  SELECT doc_id, md5_number_upper(unnest(string_split(text, ' '))) AS h FROM documents
), b AS (
  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM w, generate_series(0, 63) g(i) GROUP BY doc_id, i
)
SELECT doc_id,
  (sum(CASE WHEN acc > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0 END)
   - 9223372036854775808::HUGEINT)::BIGINT AS simhash
FROM b GROUP BY doc_id
"""


# --------------------------------------------------------------------------- #
# SimHash near-duplicate pairs — hamming-ball search via chunk buckets

_SIMHASH_CHUNKS = 4  # 4×16-bit chunks: hamming ≤ 3 => ≥1 chunk equal
_SIMHASH_MAX_HAMMING = _SIMHASH_CHUNKS - 1


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    b = np.unpackbits(np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8), axis=1)
    return b.sum(axis=1).astype(np.int64)


def doc_simhash_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """Near-duplicate pairs with SimHash hamming distance ≤ 3 — the
    hamming-ball companion to the Jaccard/MinHash family. The 64-bit
    simhash splits into 4×16-bit chunks; by pigeonhole any pair within
    hamming 3 agrees on ≥1 chunk, so candidates are exactly the
    chunk-equality buckets (groupby on salt(chunk_idx, chunk_val) bounded
    partitions, vectorized triu pair scan, per-bucket doc cap as in LSH).
    Unlike the text-verified MinHash path, verification needs only the
    two 64-bit signatures — they ride along with the bucket rows, so the
    hamming check happens inside the candidate group with one vectorized
    popcount; no second join. Output: (doc_a, doc_b, hamming)."""

    def to_chunks(batch: pa.Table) -> pa.Table:
        sims = _simhash_arr(batch.column("text").to_pylist())
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        u = sims.view(np.uint64)
        n = len(ids)
        ids_r = np.repeat(ids, _SIMHASH_CHUNKS)
        sims_r = np.repeat(sims, _SIMHASH_CHUNKS)
        chunk_idx = np.tile(np.arange(_SIMHASH_CHUNKS, dtype=np.int64), n)
        shifts = (chunk_idx.astype(np.uint64)) * np.uint64(16)
        chunk_val = (
            (np.repeat(u, _SIMHASH_CHUNKS) >> shifts) & np.uint64(0xFFFF)
        ).astype(np.int64)
        salt = (
            (chunk_val.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ (chunk_idx.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        ) % np.uint64(_MH_N_SALTS)
        return pa.Table.from_arrays(
            [pa.array(ids_r), pa.array(chunk_idx), pa.array(chunk_val),
             pa.array(sims_r), pa.array(salt.astype(np.int64))],
            names=["doc_id", "chunk_idx", "chunk_val", "simhash", "salt"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group.duplicated(["chunk_idx", "chunk_val"], keep=False)]
        empty = pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        })
        if g.empty:
            return empty
        a_out, b_out, h_out = [], [], []
        dropped = 0
        for _, sub in g.groupby(["chunk_idx", "chunk_val"], sort=False):
            sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
            ids = sub["doc_id"].to_numpy(dtype=np.int64)
            if len(ids) > _LSH_BUCKET_DOC_CAP:
                dropped += len(ids) - _LSH_BUCKET_DOC_CAP
                sub = sub.iloc[:_LSH_BUCKET_DOC_CAP]
                ids = ids[:_LSH_BUCKET_DOC_CAP]
            sims = sub["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            ii, jj = np.triu_indices(len(ids), k=1)
            ham = _popcount64(sims[ii] ^ sims[jj])
            keep = ham <= _SIMHASH_MAX_HAMMING
            a_out.append(ids[ii][keep])
            b_out.append(ids[jj][keep])
            h_out.append(ham[keep])
        if dropped:
            print(
                f"[doc_simhash_neardup_pairs] bucket cap {_LSH_BUCKET_DOC_CAP}: "
                f"dropped {dropped} docs from pair emission"
            )
        if not a_out:
            return empty
        return pd.DataFrame({
            "doc_a": pd.Series(np.concatenate(a_out), dtype="int64"),
            "doc_b": pd.Series(np.concatenate(b_out), dtype="int64"),
            "hamming": pd.Series(np.concatenate(h_out), dtype="int64"),
        })

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4,
                names=["doc_a", "doc_b", "hamming", "salt"],
            )
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        key = (a << np.int64(32)) ^ b
        return pa.Table.from_arrays(
            [batch.column("doc_a"), batch.column("doc_b"),
             batch.column("hamming"), pa.array(_key_salt(key))],
            names=["doc_a", "doc_b", "hamming", "salt"],
        )

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["doc_a", "doc_b"])
        return pd.DataFrame({
            "doc_a": pd.Series(out["doc_a"].to_numpy(), dtype="int64"),
            "doc_b": pd.Series(out["doc_b"].to_numpy(), dtype="int64"),
            "hamming": pd.Series(out["hamming"].to_numpy(), dtype="int64"),
        })

    cand = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(to_chunks, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return (
        cand.map_batches(tag, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(distinct, batch_format="pandas")
    )


SIMHASH_NEARDUP_ORACLE_SQL = f"""
WITH w AS (
  SELECT doc_id, md5_number_upper(unnest(string_split(text, ' '))) AS h FROM documents
), bts AS (
  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM w, generate_series(0, 63) g(i) GROUP BY doc_id, i
), sh AS (
  SELECT doc_id,
    (sum(CASE WHEN acc > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0 END)
     - 9223372036854775808::HUGEINT)::BIGINT AS simhash
  FROM bts GROUP BY doc_id
), chunks AS (
  SELECT doc_id, simhash, c AS chunk_idx,
    ((((simhash::HUGEINT + 9223372036854775808::HUGEINT)
       // (1::HUGEINT << (c * 16))) % 65536))::BIGINT AS chunk_val
  FROM sh, generate_series(0, {_SIMHASH_CHUNKS - 1}) g(c)
), capped AS (
  -- the Ray side caps each bucket at _LSH_BUCKET_DOC_CAP docs, lowest ids
  -- win (deterministic + logged); reproduce the cap exactly
  SELECT doc_id, simhash, chunk_idx, chunk_val FROM (
    SELECT *, row_number() OVER (
      PARTITION BY chunk_idx, chunk_val ORDER BY doc_id) AS rn
    FROM chunks) WHERE rn <= {_LSH_BUCKET_DOC_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM capped a JOIN capped b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {_SIMHASH_MAX_HAMMING}
"""


def doc_fingerprint(sf_dir: str, window: int = 4) -> ray.data.Dataset:
    """Winnowing document fingerprint: min rolling-hash per window; emits
    (doc_id, n_fingerprints, min_fp, max_fp). Shingle hashes are md5-based,
    shifted to signed int64 BEFORE the min so Python and the SQL oracle
    compare in the same (signed) domain."""
    off = 1 << 63

    def fn(batch: pa.Table) -> pa.Table:
        n_out, mn_out, mx_out = [], [], []
        for text in batch.column("text").to_pylist():
            ws = text.split(" ")
            hs = np.array(
                [_md5_u64(" ".join(ws[i : i + 3])) - off
                 for i in range(max(1, len(ws) - 2))],
                dtype=np.int64,
            )
            if len(hs) <= window:
                fps = np.array([hs.min()])
            else:
                mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
                fps = np.unique(mins)
            n_out.append(len(fps))
            mn_out.append(int(fps.min()))
            mx_out.append(int(fps.max()))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(n_out, pa.int64()),
             pa.array(mn_out, pa.int64()), pa.array(mx_out, pa.int64())],
            names=["doc_id", "n_fp", "min_fp", "max_fp"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


FINGERPRINT_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), hl AS (
  SELECT doc_id, list_transform(generate_series(1, greatest(1, len(ws)-2)),
    i -> (md5_number_upper(array_to_string(list_slice(ws, i, i+2), ' '))::HUGEINT
          - 9223372036854775808::HUGEINT)::BIGINT) AS hs
  FROM d
), s AS (
  SELECT doc_id, unnest(hs) AS h, unnest(generate_series(1, len(hs))) AS i,
         len(hs) AS nh
  FROM hl
), wmin AS (
  SELECT doc_id, i, nh,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM s
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= greatest(1, nh - 3)
)
SELECT doc_id, count(*)::BIGINT AS n_fp, min(fp) AS min_fp, max(fp) AS max_fp
FROM fps GROUP BY doc_id
"""


# --------------------------------------------------------------------------- #
# similarity search over embeddings

_ANN_N_QUERIES = 5
_ANN_K = 3


def emb_ann_topk(sf_dir: str) -> ray.data.Dataset:
    """Brute-force cosine top-k: query vectors (vec_id < 5) broadcast once;
    each batch computes a [Q, B] sim matrix (numpy matmul) and emits its
    per-batch top-k partials; a final tiny per-query group picks global
    top-k. Ties broken by neighbor id."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr=f"vec_id < {_ANN_N_QUERIES}").to_pandas()
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qdf["vec_id"].to_numpy()
    ref = ray.put((qids, Qn))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, Qn = ray.get(ref)
        vids = np.asarray(batch.column("vec_id"))
        keep = vids >= _ANN_N_QUERIES
        if not keep.any():
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["query_id", "neighbor_id", "sim"],
            )
        M = np.stack(batch.column("embedding").to_pandas().to_numpy()[keep]).astype(np.float64)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Qn @ Mn.T  # [Q, B]
        vkeep = vids[keep]
        q_out, n_out, s_out = [], [], []
        k = min(_ANN_K, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argsort(-sims[qi], kind="stable")[:k]
            for j in idx:
                q_out.append(int(qids[qi]))
                n_out.append(int(vkeep[j]))
                s_out.append(float(sims[qi, j]))
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()),
             pa.array(s_out, pa.float64())],
            names=["query_id", "neighbor_id", "sim"],
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(_ANN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {"query_id": g["query_id"], "rank": np.arange(1, len(g) + 1, dtype=np.int64),
             "neighbor_id": g["neighbor_id"]}
        )

    cand = emb.map_batches(partial_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


_NEARDUP_CAP = 2000
_NEARDUP_THRESH = 0.45


def emb_neardup_pairs(sf_dir: str) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (vec_id < 2000 cap): broadcast
    the capped normalized matrix, per-batch matmul, threshold."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    capped = emb.filter(expr=f"vec_id < {_NEARDUP_CAP}").to_pandas()
    M = np.stack(capped["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = capped["vec_id"].to_numpy()
    ref = ray.put((ids, Mn))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, Mn = ray.get(ref)
        vids = np.asarray(batch.column("vec_id"))
        keep = vids < _NEARDUP_CAP
        a_out, b_out = [], []
        if keep.any():
            idx = {int(v): i for i, v in enumerate(all_ids)}
            rows = np.array([idx[int(v)] for v in vids[keep]])
            sims = Mn[rows] @ Mn.T
            for r, a in zip(range(len(rows)), vids[keep]):
                hits = np.where(sims[r] >= _NEARDUP_THRESH)[0]
                for h in hits:
                    b = int(all_ids[h])
                    if b > int(a):
                        a_out.append(int(a))
                        b_out.append(b)
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64())],
            names=["vec_a", "vec_b"],
        )

    return emb.filter(expr=f"vec_id < {_NEARDUP_CAP}").map_batches(pairs, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# embedding near-dup at scale: random-hyperplane LSH (no cap, no broadcast
# of the corpus matrix)

_EMB_LSH_BITS = 16
_EMB_LSH_CHUNKS = 4  # 4×4-bit chunks: hamming ≤ 3 on the signature => candidate
_EMB_LSH_QUANT = 1_000_000  # embeddings quantized to ints so the sign of the
# plane dot product is EXACT integer arithmetic on both numpy and DuckDB
_EMB_LSH_RNG = np.random.RandomState(7)
_EMB_LSH_PLANES = _EMB_LSH_RNG.choice([-1, 1], size=(_EMB_LSH_BITS, 64)).astype(np.int64)

# production default: true near-duplicates (cosine >= 0.9). At this regime
# hyperplane LSH approaches full recall (bit-agreement prob 1 - theta/pi >=
# 0.856 per bit => P(>=1 of 4 chunk matches) ~ 0.95+, pinned by
# test_emb_lsh_recall_at_prod_threshold on planted near-dups). The 0.45
# test point (the only threshold with nonzero pairs on the synthetic
# vectors) stays available via the explicit parameter and is the
# documented low-recall regime.
_EMB_LSH_PROD_THRESH = 0.9


def emb_neardup_lsh(
    sf_dir: str, threshold: float = _EMB_LSH_PROD_THRESH
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH — the
    at-scale path (the brute-force emb_neardup_pairs broadcasts a capped
    matrix; this one never materializes or broadcasts the corpus):

    1. 16 sign bits per vector from ±1 hyperplanes over the 1e6-quantized
       embedding (integer dot products — numpy and DuckDB agree exactly,
       no float sign flips), split into 4×4-bit chunks.
    2. Candidates = chunk-equality buckets (pigeonhole: signature hamming
       ≤ 3 always collides) in salted bounded partitions, per-bucket doc
       cap as in the text LSH.
    3. Vectors ride along with the bucket rows, so verification
       (cosine ≥ threshold) is one matmul inside the candidate group.

    Approximate by design — recall vs the exact baseline is pinned by
    pytest (hyperplane LSH at the 0.45 threshold trades recall for
    never touching O(n²); at true near-dup thresholds (≥0.9) the same
    structure approaches full recall). The SQL oracle reproduces the
    identical approximate semantics."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        M = np.stack(batch.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        Q = np.round(M * _EMB_LSH_QUANT).astype(np.int64)
        bits = (Q @ _EMB_LSH_PLANES.T >= 0).astype(np.int64)  # [n, 16]
        n = len(ids)
        per = _EMB_LSH_BITS // _EMB_LSH_CHUNKS
        w = 1 << np.arange(per, dtype=np.int64)
        chunk_vals = np.stack(
            [(bits[:, c * per:(c + 1) * per] * w).sum(1) for c in range(_EMB_LSH_CHUNKS)],
            axis=1,
        )  # [n, chunks]
        ids_r = np.repeat(ids, _EMB_LSH_CHUNKS)
        chunk_idx = np.tile(np.arange(_EMB_LSH_CHUNKS, dtype=np.int64), n)
        cv = chunk_vals.reshape(-1)
        salt = (
            (cv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ (chunk_idx.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        ) % np.uint64(_MH_N_SALTS)
        # replicate the list column by take-indices
        emb_col = batch.column("embedding")
        take_idx = np.repeat(np.arange(n, dtype=np.int64), _EMB_LSH_CHUNKS)
        emb_rep = (
            emb_col.combine_chunks() if isinstance(emb_col, pa.ChunkedArray) else emb_col
        ).take(pa.array(take_idx))
        return pa.Table.from_arrays(
            [pa.array(ids_r), pa.array(chunk_idx), pa.array(cv),
             emb_rep, pa.array(salt.astype(np.int64))],
            names=["vec_id", "chunk_idx", "chunk_val", "embedding", "salt"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group.duplicated(["chunk_idx", "chunk_val"], keep=False)]
        empty = pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
        })
        if g.empty:
            return empty
        a_out, b_out = [], []
        dropped = 0
        for _, sub in g.groupby(["chunk_idx", "chunk_val"], sort=False):
            sub = sub.drop_duplicates("vec_id").sort_values("vec_id")
            if len(sub) > _LSH_BUCKET_DOC_CAP:
                dropped += len(sub) - _LSH_BUCKET_DOC_CAP
                sub = sub.iloc[:_LSH_BUCKET_DOC_CAP]
            ids = sub["vec_id"].to_numpy(dtype=np.int64)
            E = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = En @ En.T
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = sims[ii, jj] >= threshold
            a_out.append(ids[ii][keep])
            b_out.append(ids[jj][keep])
        if dropped:
            print(
                f"[emb_neardup_lsh] bucket cap {_LSH_BUCKET_DOC_CAP}: "
                f"dropped {dropped} vectors from pair emission"
            )
        if not a_out:
            return empty
        return pd.DataFrame({
            "doc_a": pd.Series(np.concatenate(a_out), dtype="int64"),
            "doc_b": pd.Series(np.concatenate(b_out), dtype="int64"),
        })

    cand = (
        emb.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    out_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        return batch.rename_columns(["vec_a", "vec_b"])

    # seed one typed empty block: with zero candidate pairs (the normal
    # case at the 0.9 production threshold on clean corpora) the groupby
    # inside _distinct_pairs emits zero blocks, and a zero-block dataset
    # loses its schema (to_pandas -> 0 columns, breaking the oracle's
    # column compare on the legitimate empty result)
    return (
        _distinct_pairs(cand)
        .map_batches(lambda b: rename(b), batch_format="pyarrow")
        .union(ray.data.from_arrow(out_schema.empty_table()))
    )


def emb_neardup_lsh_oracle_sql(threshold: float = _EMB_LSH_PROD_THRESH) -> str:
    # VALUES rows "(j, [1,-1,...])" — the hyperplane matrix as SQL literals
    rows = []
    for j in range(_EMB_LSH_BITS):
        vals = ",".join(str(int(v)) for v in _EMB_LSH_PLANES[j])
        rows.append(f"({j}, [{vals}])")
    planes = ", ".join(rows)
    per = _EMB_LSH_BITS // _EMB_LSH_CHUNKS
    return f"""
WITH q AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> round(x * {_EMB_LSH_QUANT})::BIGINT) AS qe
  FROM embeddings
), planes(j, h) AS (VALUES {planes}),
bits AS (
  SELECT vec_id, j,
         CASE WHEN list_dot_product(qe, h) >= 0 THEN 1 ELSE 0 END AS bit
  FROM q, planes
), chunks AS (
  SELECT vec_id, j // {per} AS chunk_idx,
         sum(bit * (1 << (j % {per})))::BIGINT AS chunk_val
  FROM bits GROUP BY vec_id, j // {per}
), capped AS (
  SELECT vec_id, chunk_idx, chunk_val FROM (
    SELECT *, row_number() OVER (
      PARTITION BY chunk_idx, chunk_val ORDER BY vec_id) AS rn
    FROM chunks) WHERE rn <= {_LSH_BUCKET_DOC_CAP}
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM capped a JOIN capped b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b
FROM cand c JOIN q ea ON c.vec_a = ea.vec_id JOIN q eb ON c.vec_b = eb.vec_id
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
"""


# --------------------------------------------------------------------------- #
# event-stream shaped: tumbling window + gap sessionization

def events_window(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per (user, event_type): count + value cents."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.Table.from_arrays(
            [batch.column("user_id"), batch.column("event_type"), hour,
             _cents(batch.column("value"))],
            names=["user_id", "event_type", "window_start", "cents"],
        )
        g = t.group_by(["user_id", "event_type", "window_start"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["user_id", "event_type", "window_start", "sum_cents", "n_events"]
        )

    part = ev.map_batches(partials, batch_format="pyarrow")
    return part.groupby(["user_id", "event_type", "window_start"]).aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_events", alias_name="n_events")
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000


_SESSION_BUCKET_US = 24 * 3600 * 1_000_000  # 1 day ≫ the 30-min gap


def _user_hash_salt(users, mix: np.ndarray | None = None) -> np.ndarray:
    """Deterministic salt for user keys (int64 multiply-hash),
    optionally mixed with a second int key (bucket)."""
    uh = np.asarray(users, dtype=np.int64).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    if mix is not None:
        uh = uh ^ mix.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    return ((uh >> np.uint64(17)) % np.uint64(_JOIN_SALTS)).astype(np.int64)


def events_sessions(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization (30 min) per user — scale-safe two-phase:

    Phase 1 sessionizes within (user_id, day-bucket) cells so no step ever
    holds a whole user's history (a hot bot with 10^8 events spreads over
    its days); cells are processed in _JOIN_SALTS hash partitions (the
    scale knob: ≈ 16-32 × cluster cores keeps a partition block-sized)
    with a fully VECTORIZED multi-cell sessionizer inside. Phase 2 merges
    bucket-boundary sessions per user; its input is SESSION rows, bounded
    by bucket_len/gap = 48 rows per user-day regardless of event volume.
    Interval-merging maximal within-bucket sessions under the same gap
    rule is exactly event-level sessionization: two adjacent sessions
    merge iff next.start − cur.end ≤ gap, the same predicate the
    event-level pass applies at that boundary."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.divide(ts_us, _SESSION_BUCKET_US)
        salt = _user_hash_salt(np.asarray(batch.column("user_id")), np.asarray(bucket))
        return pa.Table.from_arrays(
            [batch.column("user_id"), batch.column("ts"), bucket, pa.array(salt)],
            names=["user_id", "ts", "bucket", "salt"],
        )

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every (user, bucket) cell in this partition
        g = g.sort_values(["user_id", "bucket", "ts"]).reset_index(drop=True)
        ts_us = g["ts"].astype("int64").to_numpy()
        u = g["user_id"].to_numpy()
        b = g["bucket"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same_cell = (u[1:] == u[:-1]) & (b[1:] == b[:-1])
            brk[1:] = ~(same_cell & ((ts_us[1:] - ts_us[:-1]) <= _SESSION_GAP_US))
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n_events=("ts", "count"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index(drop=True)

    def add_user_salt(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("session_start", pa.timestamp("us")),
                 ("session_end", pa.timestamp("us")), ("n_events", pa.int64()),
                 ("salt", pa.int64())]
            ).empty_table()
        users = np.asarray(batch.column("user_id"))
        return batch.append_column("salt", pa.array(_user_hash_salt(users)))

    def merge_user_sessions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over every user in this partition: per-user running
        # max end, per-user shift, gap predicate
        g = g.sort_values(["user_id", "session_start"]).reset_index(drop=True)
        end_us = g["session_end"].astype("int64")
        cm = end_us.groupby(g["user_id"], sort=False).cummax()
        prev_end = cm.groupby(g["user_id"], sort=False).shift(1)
        start_us = g["session_start"].astype("int64")
        brk = (start_us - prev_end.fillna(-(1 << 62))) > _SESSION_GAP_US
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"), session_start=("session_start", "min"),
            session_end=("session_end", "max"), n_events=("n_events", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index(drop=True)

    part = (
        ev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(bucket_sessions, batch_format="pandas")
        .map_batches(add_user_salt, batch_format="pyarrow")
    )
    return (
        part.groupby("salt")
        .map_groups(merge_user_sessions, batch_format="pandas")
    )


# --------------------------------------------------------------------------- #
# relational basics over the star schema

def lineitem_pricing(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped aggregate; money kept in integer cents so the
    distributed sum is exact and order-independent."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("l_returnflag"), batch.column("l_linestatus"),
             pc.cast(batch.column("l_quantity"), pa.int64()),
             _cents(batch.column("l_extendedprice"))],
            names=["l_returnflag", "l_linestatus", "qty", "price_cents"],
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_rows"]
        )

    part = li.map_batches(partials, batch_format="pyarrow")
    return part.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("n_rows", alias_name="n_rows"),
    )


def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer ⋈ nation. Customer is fact-proportional (1.5M
    rows × sf), so the orders⋈customer leg is a HASH-PARTITIONED shuffle
    join on custkey — orders are pre-aggregated per custkey (partial
    combine before the shuffle) so the join input is one row per customer,
    and neither side ever touches the driver. Only the genuinely tiny
    nation table (25 rows) is broadcast."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def order_partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("o_custkey"), _cents(batch.column("o_totalprice"))],
            names=["o_custkey", "cents"],
        )
        g = t.group_by(["o_custkey"]).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_custkey", "sum_cents", "n_orders"])

    per_cust = (
        orders.map_batches(order_partials, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("sum_cents", alias_name="sum_cents"),
                   Sum("n_orders", alias_name="n_orders"))
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)) // 2)
    joined = per_cust.join(
        cust, "inner", n_parts, on=("o_custkey",), right_on=("c_custkey",)
    )

    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    n2name_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    def nation_partials(batch: pa.Table) -> pa.Table:
        n2name = ray.get(n2name_ref)
        names = [n2name.get(k, "UNKNOWN")
                 for k in batch.column("c_nationkey").to_pylist()]
        t = pa.Table.from_arrays(
            [pa.array(names, pa.string()), batch.column("sum_cents"),
             batch.column("n_orders")],
            names=["nation", "sum_cents", "n_orders"],
        )
        g = t.group_by(["nation"]).aggregate([("sum_cents", "sum"), ("n_orders", "sum")])
        return g.rename_columns(["nation", "sum_cents", "n_orders"])

    part = joined.map_batches(nation_partials, batch_format="pyarrow")
    return part.groupby("nation").aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_orders", alias_name="n_orders")
    )


def part_topk(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Global sort + limit (top-k by retail price, tie-broken by key)."""
    p = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("p_partkey"), _cents(batch.column("p_retailprice"))],
            names=["p_partkey", "price_cents"],
        )

    return (
        p.map_batches(to_cents, batch_format="pyarrow")
        .sort(["price_cents", "p_partkey"], descending=[True, False])
        .limit(k)
    )


# --------------------------------------------------------------------------- #
# IVF-bucketed ANN — the at-scale similarity-search path

_IVF_CLUSTERS = 16
_IVF_NPROBE = 4


def _ivf_centroids_distributed(
    emb: ray.data.Dataset, k: int = _IVF_CLUSTERS, iters: int = 3
) -> np.ndarray:
    """DISTRIBUTED spherical k-means over the full embedding table: each
    iteration is one streaming pass — per-batch assign + per-cluster
    (sum, count) partials, a k-group combine, and a k-row driver pull
    (the only driver materialization; bounded by k, never by the data).
    Partial rows carry the batch's min vec_id and the combine sums in
    that order, so the float reduction is deterministic regardless of
    block arrival order. Init = the k lowest vec_ids (bounded pull)."""
    head = emb.filter(expr=f"vec_id < {k}").to_pandas()  # k rows
    c = np.stack(head.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        ref = ray.put(c)

        def partials(batch: pa.Table) -> pa.Table:
            cent = ray.get(ref)
            kk, dim = cent.shape
            M = np.stack(batch.column("embedding").to_pandas().to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            assign = (Mn @ cent.T).argmax(1)
            sums = np.zeros((kk, dim))
            np.add.at(sums, assign, Mn)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            pk = int(np.asarray(batch.column("vec_id")).min())
            return pa.Table.from_arrays(
                [pa.array(np.arange(kk, dtype=np.int64)), pa.array(counts),
                 pa.array([r.tolist() for r in sums], pa.list_(pa.float64())),
                 pa.array([pk] * kk, pa.int64())],
                names=["cluster", "n", "vec_sum", "part_key"],
            )

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("part_key")  # deterministic float-sum order
            s = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
            return pd.DataFrame({
                "cluster": pd.Series([int(g["cluster"].iloc[0])], dtype="int64"),
                "n": pd.Series([int(g["n"].sum())], dtype="int64"),
                "vec_sum": pd.Series([s.tolist()], dtype="object"),
            })

        agg = (
            emb.map_batches(partials, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()  # k rows — bounded
        )
        newc = c.copy()
        for _, row in agg.iterrows():
            if row["n"] > 0:
                v = np.asarray(row["vec_sum"], dtype=np.float64) / row["n"]
                nv = np.linalg.norm(v)
                if nv > 0:
                    newc[int(row["cluster"])] = v / nv
        c = newc
    return c


def materialize_ivf_centroids(sf_dir: str, path: str) -> np.ndarray:
    """Train the IVF centroids once per (scale, code version) and pin them
    to Parquet (cluster, centroid). The materialized file is the SHARED
    FIXTURE of the emb_ann_ivf hash oracle: the Ray query and the SQL
    oracle both run the bucketed SEARCH from these exact float64 values,
    independently — the same trust model as the kg-family oracle tables
    (training state is a fixture; the distributed search is what the
    driver hash-checks)."""
    import os

    import pyarrow.parquet as _pq

    if not os.path.exists(f"{path}/_SUCCESS"):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        cent = _ivf_centroids_distributed(emb, _IVF_CLUSTERS)
        os.makedirs(path, exist_ok=True)
        t = pa.Table.from_arrays(
            [pa.array(np.arange(len(cent), dtype=np.int64)),
             pa.array([r.tolist() for r in cent], pa.list_(pa.float64()))],
            names=["cluster", "centroid"],
        )
        _pq.write_table(t, f"{path}/centroids.parquet")
        open(f"{path}/_SUCCESS", "w").close()
    t = _pq.read_table(f"{path}/centroids.parquet")
    order = np.argsort(np.asarray(t.column("cluster")))
    return np.stack(
        [np.asarray(t.column("centroid")[int(i)].as_py(), dtype=np.float64) for i in order]
    )


def emb_ann_ivf(sf_dir: str, centroids_path: str | None = None) -> ray.data.Dataset:
    """IVF top-k: corpus vectors bucketed by nearest centroid; each query
    probes its _IVF_NPROBE nearest buckets only. Centroids + query matrix
    broadcast once; per-batch work is two numpy matmuls over the probed
    subset. Approximate (recall tested vs the brute-force baseline).

    ``centroids_path``: materialize-once fixture dir (see
    materialize_ivf_centroids) — with it, the result is a pure function of
    (embeddings, pinned centroids) and ann_ivf_oracle_sql() hash-checks the
    whole search in SQL; without it, centroids are retrained in-process."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # centroids trained DISTRIBUTED (partial-sum k-means over the whole
    # table; only k rows ever reach the driver), then broadcast once
    if centroids_path is not None:
        cent = materialize_ivf_centroids(sf_dir, centroids_path)
    else:
        cent = _ivf_centroids_distributed(emb, _IVF_CLUSTERS)

    qdf = emb.filter(expr=f"vec_id < {_ANN_N_QUERIES}").to_pandas()
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qdf["vec_id"].to_numpy()
    # buckets each query probes — STABLE sort so a tie at the nprobe
    # boundary resolves cluster-ascending, the same (sim DESC, cluster)
    # order the direct hash oracle's row_number uses
    probes = np.argsort(-(Qn @ cent.T), axis=1, kind="stable")[:, :_IVF_NPROBE]
    ref = ray.put((qids, Qn, cent, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, Qn, cent, probes = ray.get(ref)
        vids = np.asarray(batch.column("vec_id"))
        keep = vids >= _ANN_N_QUERIES
        q_out, n_out, s_out = [], [], []
        if keep.any():
            M = np.stack(batch.column("embedding").to_pandas().to_numpy()[keep]).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            clusters = (Mn @ cent.T).argmax(1)
            vkeep = vids[keep]
            for qi in range(len(qids)):
                sel = np.isin(clusters, probes[qi])
                if not sel.any():
                    continue
                sims = Qn[qi] @ Mn[sel].T
                vs = vkeep[sel]
                k = min(_ANN_K, len(vs))
                # (sim desc, vec_id asc) — the same total order the final
                # combine and the SQL oracle use, so the per-batch cut is
                # independent of row order inside the block
                idx = np.lexsort((vs, -sims))[:k]
                for j in idx:
                    q_out.append(int(qids[qi]))
                    n_out.append(int(vs[j]))
                    s_out.append(float(sims[j]))
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()),
             pa.array(s_out, pa.float64())],
            names=["query_id", "neighbor_id", "sim"],
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(_ANN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {"query_id": g["query_id"], "rank": np.arange(1, len(g) + 1, dtype=np.int64),
             "neighbor_id": g["neighbor_id"]}
        )

    cand = emb.map_batches(partial_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def emb_ann_ivf_recall(
    sf_dir: str, ivf_path: str | None = None, centroids_path: str | None = None
) -> ray.data.Dataset:
    """Recall@k of the IVF path against the exact brute-force top-k,
    computed distributed: both result sets are joined per query and the
    hit count emitted as (query_id, n_hits, k). The driver oracle reads
    the MATERIALIZED ivf output (written here, deterministically) and
    recomputes the exact top-k independently in SQL — so the recall
    numbers are hash-checked against an independent exact baseline."""
    ivf = emb_ann_ivf(sf_dir, centroids_path=centroids_path)
    if ivf_path is not None:
        import os
        import shutil

        if not os.path.exists(f"{ivf_path}/_SUCCESS"):
            shutil.rmtree(ivf_path, ignore_errors=True)
            ivf.write_parquet(ivf_path)
            open(f"{ivf_path}/_SUCCESS", "w").close()
        ivf = ray.data.read_parquet(ivf_path, columns=["query_id", "rank", "neighbor_id"])

    def tag(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pc.cast(batch.column("query_id"), pa.int64()),
                 pc.cast(batch.column("neighbor_id"), pa.int64()),
                 pa.array([src] * batch.num_rows, pa.int8())],
                names=["query_id", "neighbor_id", "src"],
            )

        return fn

    both = ivf.map_batches(tag(0), batch_format="pyarrow").union(
        emb_ann_topk(sf_dir).map_batches(tag(1), batch_format="pyarrow")
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        a = set(g.loc[g["src"] == 0, "neighbor_id"])
        b = set(g.loc[g["src"] == 1, "neighbor_id"])
        return pd.DataFrame(
            {"query_id": [int(g["query_id"].iloc[0])],
             "n_hits": pd.Series([len(a & b)], dtype="int64"),
             "k": pd.Series([_ANN_K], dtype="int64")}
        )

    # bounded groups (2k rows per query) — union + per-query intersection
    return both.groupby("query_id").map_groups(hits, batch_format="pandas")


def ann_ivf_recall_oracle_sql(ivf_path: str) -> str:
    """Exact top-k recomputed in SQL; IVF side read from its materialized
    Parquet; per-query intersection count."""
    return f"""
WITH exact AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {_ANN_N_QUERIES} AND c.vec_id >= {_ANN_N_QUERIES}
  QUALIFY rnk <= {_ANN_K}
), ivf AS (
  SELECT query_id, neighbor_id FROM read_parquet('{ivf_path}/*.parquet')
)
SELECT e.query_id, count(i.neighbor_id)::BIGINT AS n_hits, {_ANN_K}::BIGINT AS k
FROM exact e LEFT JOIN ivf i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


def ann_ivf_oracle_sql(centroids_path: str) -> str:
    """DIRECT value oracle for emb_ann_ivf: the full IVF search re-derived
    in SQL from the materialized centroids — corpus-vector bucket
    assignment (argmax inner product; numpy argmax takes the FIRST max, so
    ties break cluster-ascending), per-query probe-set selection, and the
    cosine top-k inside probed buckets. Ordering by raw inner product
    equals the Ray side's normalized-vector dot ordering (positive scale
    per fixed vector)."""
    return f"""
WITH cent AS (
  SELECT cluster, centroid FROM read_parquet('{centroids_path}/centroids.parquet')
), assign AS (
  SELECT e.vec_id, c.cluster,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY
           list_inner_product(e.embedding::DOUBLE[], c.centroid) DESC, c.cluster) AS rn
  FROM embeddings e, cent c WHERE e.vec_id >= {_ANN_N_QUERIES}
), corpus AS (
  SELECT vec_id, cluster FROM assign WHERE rn = 1
), probes AS (
  SELECT q.vec_id AS query_id, c.cluster,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_inner_product(q.embedding::DOUBLE[], c.centroid) DESC, c.cluster) AS rn
  FROM embeddings q, cent c WHERE q.vec_id < {_ANN_N_QUERIES}
), probed AS (
  SELECT query_id, cluster FROM probes WHERE rn <= {_IVF_NPROBE}
)
SELECT p.query_id,
       row_number() OVER (PARTITION BY p.query_id ORDER BY
         list_cosine_similarity(q.embedding, e.embedding) DESC, co.vec_id) AS rank,
       co.vec_id AS neighbor_id
FROM probed p
JOIN corpus co ON co.cluster = p.cluster
JOIN embeddings q ON q.vec_id = p.query_id
JOIN embeddings e ON e.vec_id = co.vec_id
QUALIFY rank <= {_ANN_K}
"""


# --------------------------------------------------------------------------- #
# additional relational coverage (all integer-exact vs the SQL oracles)

def supplier_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-nation supplier account stats (min/max/count in cents)."""
    s = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("s_nationkey"), _cents(batch.column("s_acctbal"))],
            names=["s_nationkey", "bal_cents"],
        )
        g = t.group_by(["s_nationkey"]).aggregate(
            [("bal_cents", "min"), ("bal_cents", "max"), ("bal_cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["s_nationkey", "min_bal", "max_bal", "sum_bal", "n_suppliers"]
        )

    part = s.map_batches(partials, batch_format="pyarrow")
    return part.groupby("s_nationkey").aggregate(
        Min("min_bal", alias_name="min_bal"),
        Max("max_bal", alias_name="max_bal"),
        Sum("sum_bal", alias_name="sum_bal"),
        Sum("n_suppliers", alias_name="n_suppliers"),
    )


def orders_by_month(sf_dir: str) -> ray.data.Dataset:
    """Tumbling month window over o_orderdate with status breakdown."""
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus", "o_totalprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        if pa.types.is_date(d.type) or pa.types.is_timestamp(d.type):
            month = pc.floor_temporal(pc.cast(d, pa.timestamp("us")), unit="month")
        else:  # string dates: YYYY-MM-DD -> first of month
            month = pc.cast(
                pc.strptime(pc.binary_join_element_wise(pc.utf8_slice_codeunits(d, 0, 7), "-01", ""),
                            format="%Y-%m-%d", unit="us"),
                pa.timestamp("us"),
            )
        t = pa.Table.from_arrays(
            [month, batch.column("o_orderstatus"), _cents(batch.column("o_totalprice"))],
            names=["month", "o_orderstatus", "cents"],
        )
        g = t.group_by(["month", "o_orderstatus"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["month", "o_orderstatus", "sum_cents", "n_orders"])

    part = o.map_batches(partials, batch_format="pyarrow")
    return part.groupby(["month", "o_orderstatus"]).aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_orders", alias_name="n_orders")
    )


def region_nation_counts(sf_dir: str) -> ray.data.Dataset:
    """3-way dimension join region ⋈ nation ⋈ customer, all broadcast."""
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, r2name))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])

    def partials(batch: pa.Table) -> pa.Table:
        n2r, r2name = ray.get(ref)
        names = [r2name.get(n2r.get(k), "UNKNOWN") for k in batch.column("c_nationkey").to_pylist()]
        t = pa.Table.from_arrays([pa.array(names, pa.string())], names=["region"])
        g = t.group_by(["region"]).aggregate([([], "count_all")])
        return g.rename_columns(["region", "n_customers"])

    part = cust.map_batches(partials, batch_format="pyarrow")
    return part.groupby("region").aggregate(Sum("n_customers", alias_name="n_customers"))


def events_top_users(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Top-k users by event count (partial count -> groupby -> sort/limit)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n_events"])

    part = ev.map_batches(partials, batch_format="pyarrow")
    agg = part.groupby("user_id").aggregate(Sum("n_events", alias_name="n_events"))
    return agg.sort(["n_events", "user_id"], descending=[True, False]).limit(k)


_DEDUP_KEEP_THRESHOLD = 50  # jaccard % above which doc_b is dropped


def doc_dedup_minhash(sf_dir: str) -> ray.data.Dataset:
    """End-to-end near-duplicate REMOVAL (the operation a training-data
    pipeline actually runs) — LINEAR in bucket size, never O(m²):

    1. Representative links: inside each duplicated (band, bucket), every
       doc links to the bucket's min doc_id — one link per doc per band
       (≤32 links/doc after the cross-band dedup), fully vectorized
       (groupby.transform('min')). A 10^5-doc duplicate cluster emits
       10^5 links, not 5·10^9 pairs.
    2. Verify: exact Jaccard(doc, representative) ≥ 50 % via the same
       co-partitioned merge machinery as the pair listing (texts cross
       the shuffle once per partition, not per link).
    3. Keep-list: emitted directly by the verify pass (emit="keep") —
       pass 2 is co-partitioned on salt(doc_b) with every doc's row
       present, so "no verified lower-id link" is a partition-local fact
       and no separate anti-join stage is needed. A doc is dropped iff it
       shares a bucket with a lower-id representative it is ≥50 %-
       Jaccard-similar to; bucket minima themselves are always kept —
       the canonical min-rep dedup policy, reproduced exactly by the SQL
       oracle."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(_mh_to_bands, batch_format="pyarrow")

    def rep_links(group: pd.DataFrame) -> pd.DataFrame:
        # all (band, bucket) runs of this salt partition, vectorized:
        # doc -> min doc_id of its bucket (linear, no pair enumeration)
        g = group[group.duplicated(["band", "bucket"], keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        rep = g.groupby(["band", "bucket"], sort=False)["doc_id"].transform("min")
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        reps = rep.to_numpy(dtype=np.int64)
        mask = ids != reps
        return pd.DataFrame(
            {"doc_a": pd.Series(reps[mask], dtype="int64"),
             "doc_b": pd.Series(ids[mask], dtype="int64")}
        )

    links = bands.groupby("salt").map_groups(rep_links, batch_format="pandas")
    # cross-band (rep, doc) link dedup happens inside verification pass 1
    # (dedup_cand) — no dedicated shuffle; ≤ _MH_BANDS rows per doc either way
    # emit="keep": verification pass 2 is co-partitioned on salt(doc_b)
    # with every doc's row present, so the keep-list falls out of the
    # verify partitions directly — no separate anti-join stage
    return _verify_candidate_pairs(
        docs, links, _DEDUP_KEEP_THRESHOLD, emit="keep", dedup_cand=True
    )


_CLEAN_MIN_WORDS = 20


def doc_clean_corpus(sf_dir: str) -> ray.data.Dataset:
    """END-TO-END corpus cleaning — the composition a training-data
    pipeline actually ships: per-doc quality gate (word count ≥ 20,
    language == 'en' by the script-ratio heuristic) ∩ the MinHash
    near-dup keep-list. Signals compute in ONE vectorized map_batches
    over the documents; the intersection with the (distributed) dedup
    keep-list is the engine's salted co-partitioned semi-join — no
    driver materialization anywhere. Emits (doc_id, n_words) of the
    surviving corpus."""
    kept = doc_dedup_minhash(sf_dir)

    def signals(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_words = pc.add(
            pc.count_substring(text, " "), pa.scalar(1, pa.int32())
        )  # words = separators + 1 (documents are single-space joined)
        cyr = pc.count_substring_regex(text, "[а-яА-ЯёЁ]")
        lat = pc.count_substring_regex(text, "[a-zA-Z]")
        ok = pc.and_(
            pc.greater_equal(n_words, pa.scalar(_CLEAN_MIN_WORDS, pa.int32())),
            pc.less_equal(cyr, lat),  # 'en' by the doc_langid rule
        )
        t = pa.Table.from_arrays(
            [batch.column("doc_id"), pc.cast(n_words, pa.int64())],
            names=["doc_id", "n_words"],
        ).filter(ok)
        k = np.asarray(t.column("doc_id"), dtype=np.int64)
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("n_words"), pa.array(_key_salt(k)),
             pa.array([0] * len(t), pa.int8())],
            names=["doc_id", "n_words", "salt", "kind"],
        )

    def tag_kept(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.int8())],
                names=["doc_id", "n_words", "salt", "kind"],
            )
        k = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.nulls(len(k), pa.int64()),
             pa.array(_key_salt(k)), pa.array([1] * len(k), pa.int8())],
            names=["doc_id", "n_words", "salt", "kind"],
        )

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        keep_ids = set(g.loc[g["kind"] == 1, "doc_id"])
        q = g[g["kind"] == 0]
        out = q[q["doc_id"].isin(keep_ids)]
        return pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"].to_numpy(), dtype="int64"),
            "n_words": pd.Series(out["n_words"].to_numpy(), dtype="int64"),
        })

    both = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        signals, batch_format="pyarrow"
    ).union(kept.map_batches(tag_kept, batch_format="pyarrow"))
    return both.groupby("salt").map_groups(semi, batch_format="pandas")


def clean_corpus_oracle_sql() -> str:
    return (
        "SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_words "
        "FROM documents "
        f"WHERE len(string_split(text,' ')) >= {_CLEAN_MIN_WORDS} "
        "AND len(regexp_extract_all(text,'[а-яА-ЯёЁ]')) <= "
        "len(regexp_extract_all(text,'[a-zA-Z]')) "
        f"AND doc_id IN ({dedup_minhash_oracle_sql()})"
    )


def dedup_minhash_oracle_sql() -> str:
    """SQL mirror of the representative-link dedup: a doc is dropped iff
    some bucket it occupies has a lower min doc_id (its representative)
    AND exact Jaccard(doc, representative) ≥ threshold."""
    return f"""{_mh_band_cte()}, rep AS (
  SELECT band, bucket, min(doc_id) AS rep FROM band GROUP BY band, bucket
), link AS (
  SELECT DISTINCT b.doc_id AS doc_id, r.rep AS rep
  FROM band b JOIN rep r ON b.band = r.band AND b.bucket = r.bucket
  WHERE b.doc_id > r.rep
), dropped AS (
  SELECT l.doc_id FROM link l
  JOIN s sa ON l.rep = sa.doc_id JOIN s sb ON l.doc_id = sb.doc_id
  WHERE len(list_intersect(sa.sh, sb.sh)) > 0
    AND 100 * len(list_intersect(sa.sh, sb.sh)) //
        (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
        >= {_DEDUP_KEEP_THRESHOLD}
)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


# --------------------------------------------------------------------------- #
# sliding (hopping) windows — each event lands in window_len/hop windows

_SLIDE_WINDOW_US = 3600 * 1_000_000
_SLIDE_HOP_US = 900 * 1_000_000  # 15 min -> 4 windows per event


def events_window_sliding(sf_dir: str) -> ray.data.Dataset:
    """1-hour windows hopping every 15 min per event_type: map_batches
    REPLICATES each event into its window_len/hop = 4 windows (vectorized
    repeat + offset arithmetic), partial-aggregates per batch, then a
    small groupby — the standard stream-processing hop expansion with the
    combine still ahead of the shuffle."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    k = _SLIDE_WINDOW_US // _SLIDE_HOP_US

    def partials(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(pc.cast(batch.column("ts"), pa.int64()))
        cents = np.asarray(_cents(batch.column("value")))
        types = batch.column("event_type").to_pylist()
        # window starts: the k hop-aligned starts whose window covers ts
        base = (ts_us // _SLIDE_HOP_US) * _SLIDE_HOP_US
        offs = (np.arange(k, dtype=np.int64) * _SLIDE_HOP_US)[None, :]
        starts = (base[:, None] - offs).reshape(-1)  # [n*k]
        t = pa.Table.from_arrays(
            [pa.array(np.repeat(np.array(types, dtype=object), k)),
             pa.array(starts, pa.int64()),
             pa.array(np.repeat(cents, k), pa.int64())],
            names=["event_type", "window_start_us", "cents"],
        )
        g = t.group_by(["event_type", "window_start_us"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "window_start_us", "sum_cents", "n_events"])

    part = ev.map_batches(partials, batch_format="pyarrow")
    agg = part.groupby(["event_type", "window_start_us"]).aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_events", alias_name="n_events")
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = pc.cast(batch.column("window_start_us"), pa.timestamp("us"))
        return pa.Table.from_arrays(
            [batch.column("event_type"), ws, batch.column("sum_cents"),
             batch.column("n_events")],
            names=["event_type", "window_start", "sum_cents", "n_events"],
        )

    return agg.map_batches(to_ts, batch_format="pyarrow")


def lineitem_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUPING-SETS rollup: (returnflag, linestatus) → (returnflag) →
    grand total, all emitted from ONE pass — each batch pre-aggregates
    every grouping level locally (the level id disambiguates), so the
    shuffle carries three tiny partial tables instead of three scans."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_linestatus", "l_extendedprice"]
    )
    ALL = "(all)"

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("l_returnflag"), batch.column("l_linestatus"),
             _cents(batch.column("l_extendedprice"))],
            names=["l_returnflag", "l_linestatus", "cents"],
        )
        outs = []
        for lvl, keys in ((0, ["l_returnflag", "l_linestatus"]), (1, ["l_returnflag"]), (2, [])):
            if keys:
                g = t.group_by(keys).aggregate([("cents", "sum"), ([], "count_all")])
                g = g.rename_columns(keys + ["sum_cents", "n_rows"])
            else:
                g = pa.Table.from_arrays(
                    [pa.array([int(pc.sum(t.column("cents")).as_py() or 0)], pa.int64()),
                     pa.array([t.num_rows], pa.int64())],
                    names=["sum_cents", "n_rows"],
                )
            n = g.num_rows
            for col in ("l_returnflag", "l_linestatus"):
                if col not in g.column_names:
                    g = g.append_column(col, pa.array([ALL] * n, pa.string()))
            g = g.append_column("level", pa.array([lvl] * n, pa.int64()))
            outs.append(g.select(["level", "l_returnflag", "l_linestatus", "sum_cents", "n_rows"]))
        return pa.concat_tables(outs)

    part = li.map_batches(partials, batch_format="pyarrow")
    return part.groupby(["level", "l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n_rows", alias_name="n_rows")
    )


# --------------------------------------------------------------------------- #
# deterministic hash sampling — resumable, RNG-free corpus subsetting

_SAMPLE_PCT = 10


def doc_sample(sf_dir: str) -> ray.data.Dataset:
    """Keep ~10% of documents by a multiply-shift hash of doc_id — the
    deterministic sampling a resumable 100-TB pipeline uses instead of
    RNG state (same rows on re-run, no coordination, SQL-reproducible).
    The hash is one vectorized numpy expression (uint64 golden-ratio
    multiply >> 33, mod 100); DuckDB reproduces it exactly with HUGEINT
    arithmetic — no per-row Python/md5 in the hot path."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        h = (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ) % np.uint64(100)
        t = pa.Table.from_arrays(
            [batch.column("doc_id"),
             pc.cast(pc.utf8_length(batch.column("text")), pa.int64())],
            names=["doc_id", "n_chars"],
        )
        return t.filter(pa.array(h < _SAMPLE_PCT))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_sample_oracle_sql() -> str:
    # 11400714819323198485 = 0x9E3779B97F4A7C15; // 8589934592 = >> 33
    return (
        "SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents "
        "WHERE ((((doc_id::HUGEINT * 11400714819323198485) % 18446744073709551616)"
        f" // 8589934592) % 100)::BIGINT < {_SAMPLE_PCT}"
    )


# --------------------------------------------------------------------------- #
# per-group top-k ranking (window-function analogue)

def supplier_topk_per_nation(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k suppliers by account balance per nation: bounded
    groupby(nation).map_groups ranking (25 groups × suppliers-per-nation;
    at true scale this pre-filters with a per-batch partial top-k per
    nation before the shuffle, same shape as emb_ann_topk)."""
    s = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("s_nationkey"), batch.column("s_suppkey"),
             _cents(batch.column("s_acctbal"))],
            names=["s_nationkey", "s_suppkey", "bal_cents"],
        )

    def partial_topk(batch: pa.Table) -> pa.Table:
        # combine BEFORE the shuffle: only k rows per nation leave a batch
        df = batch.to_pandas()
        out = (
            df.sort_values(["bal_cents", "s_suppkey"], ascending=[False, True])
            .groupby("s_nationkey", sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bal_cents", "s_suppkey"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "s_nationkey": g["s_nationkey"],
            "rank": pd.Series(np.arange(1, len(g) + 1), dtype="int64"),
            "s_suppkey": g["s_suppkey"],
            "bal_cents": g["bal_cents"],
        })

    part = s.map_batches(to_cents, batch_format="pyarrow").map_batches(
        partial_topk, batch_format="pyarrow"
    )
    return part.groupby("s_nationkey").map_groups(final_topk, batch_format="pandas")


# --------------------------------------------------------------------------- #
# anti-join (set difference) via reduce-side co-partitioned merge

_ANTI_MONTH = ("1997-06-01", "1997-07-01")


def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Customers with zero orders in the _ANTI_MONTH window, June 1997
    (the inactive-cohort
    anti-join): both sides hash-partition on salt(custkey) — orders
    pre-deduped per batch so at most one row per (batch, custkey)
    shuffles — and each bounded partition runs one vectorized isin
    difference over all its keys."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("c_custkey"), dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array([0] * len(k), pa.int8())],
            names=["k", "salt", "kind"],
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        lo = pa.scalar(np.datetime64(_ANTI_MONTH[0], "us"))
        hi = pa.scalar(np.datetime64(_ANTI_MONTH[1], "us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        uniq = pc.unique(batch.filter(keep).column("o_custkey"))
        k = np.asarray(uniq, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(k), pa.array(_key_salt(k)),
             pa.array([1] * len(k), pa.int8())],
            names=["k", "salt", "kind"],
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["kind"] == 1, "k"].unique()
        out = g.loc[(g["kind"] == 0) & ~g["k"].isin(have), "k"]
        return pd.DataFrame({"c_custkey": pd.Series(out.to_numpy(), dtype="int64")})

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )
    out_schema = pa.schema([("c_custkey", pa.int64())])

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        return batch.select(out_schema.names).cast(out_schema)

    return (
        both.groupby("salt")
        .map_groups(anti, batch_format="pandas")
        .map_batches(stamp, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# distributed prefix sum: running per-user total ordered by time

def events_user_cumsum(sf_dir: str) -> ray.data.Dataset:
    """Cumulative value-cents per user ordered by ts — the distributed
    prefix-sum pattern: (1) aggregate per distinct (user, ts) and cumsum
    within each (user, day-bucket) cell; (2) per user, exclusive
    prefix-sum the per-bucket totals (input bounded by #buckets, not
    #events); (3) co-partitioned merge adds each bucket's offset back to
    its rows. Rows are aggregated at (user, ts) so ties in ts can't make
    the running total order-dependent. Every phase runs over _JOIN_SALTS
    hash partitions with a vectorized multi-cell interior — per-group
    Python dispatch is O(partitions)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.divide(ts_us, _SESSION_BUCKET_US)
        salt = _user_hash_salt(np.asarray(batch.column("user_id")), np.asarray(bucket))
        return pa.Table.from_arrays(
            [batch.column("user_id"), batch.column("ts"), bucket,
             _cents(batch.column("value")), pa.array(salt)],
            names=["user_id", "ts", "bucket", "cents", "salt"],
        )

    def bucket_cumsum(g: pd.DataFrame) -> pd.DataFrame:
        # all (user, bucket) cells of this partition, vectorized
        per_ts = (
            g.groupby(["user_id", "bucket", "ts"], sort=True)["cents"]
            .sum()
            .reset_index()
        )
        per_ts["in_bucket_cum"] = (
            per_ts.groupby(["user_id", "bucket"], sort=False)["cents"].cumsum()
        )
        return pd.DataFrame({
            "user_id": per_ts["user_id"],
            "bucket": per_ts["bucket"].astype("int64"),
            "ts": per_ts["ts"],
            "in_bucket_cum": per_ts["in_bucket_cum"].astype("int64"),
        })

    rows_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.int64()),
         ("ts", pa.timestamp("us")), ("in_bucket_cum", pa.int64())]
    )

    def rows_to_arrow(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return rows_schema.empty_table()
        return batch.select(rows_schema.names).cast(rows_schema)

    rows = (
        ev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(bucket_cumsum, batch_format="pandas")
        .map_batches(rows_to_arrow, batch_format="pyarrow")
    )

    # per-bucket totals (partial per batch) -> per-user exclusive prefix
    def bucket_totals(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tot = df.groupby(["user_id", "bucket"], sort=False)["in_bucket_cum"].max().reset_index()
        users = tot["user_id"].to_numpy(dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(users), pa.array(tot["bucket"], pa.int64()),
             pa.array(tot["in_bucket_cum"], pa.int64()),
             pa.array(_user_hash_salt(users))],
            names=["user_id", "bucket", "total", "salt"],
        )

    def user_offsets(g: pd.DataFrame) -> pd.DataFrame:
        # all users of this partition, vectorized per-user prefix.
        # bucket_totals emits PER-BATCH partial maxes, so a (user, bucket)
        # cell split across map_batches batches yields duplicate rows —
        # collapse to the true per-bucket max first (safe: the salt is by
        # user, so every partial of a user's bucket lands in this group).
        g = g.groupby(["user_id", "bucket"], as_index=False)["total"].max()
        t = g.sort_values(["user_id", "bucket"]).reset_index(drop=True)
        cum = t.groupby("user_id", sort=False)["total"].cumsum()
        off = (cum - t["total"]).astype("int64")  # exclusive prefix
        users = t["user_id"].to_numpy(dtype=np.int64)
        buckets = t["bucket"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "user_id": t["user_id"],
            "bucket": pd.Series(buckets, dtype="int64"),
            "offset": off,
            "salt2": pd.Series(
                _user_hash_salt(users, buckets), dtype="int64"
            ),
        })

    off_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.int64()), ("offset", pa.int64()),
         ("salt2", pa.int64())]
    )

    def off_to_arrow(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return off_schema.empty_table()
        return batch.select(off_schema.names).cast(off_schema)

    offsets = (
        rows.map_batches(bucket_totals, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(user_offsets, batch_format="pandas")
        .map_batches(off_to_arrow, batch_format="pyarrow")
    )

    # merge offset into rows, co-partitioned on salt(user, bucket)
    def tag_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        salt = _user_hash_salt(
            np.asarray(batch.column("user_id")), np.asarray(batch.column("bucket"))
        )
        return pa.Table.from_arrays(
            [batch.column("user_id"), batch.column("bucket"), pa.array(salt),
             pa.array([0] * n, pa.int8()), batch.column("ts"),
             batch.column("in_bucket_cum")],
            names=["user_id", "bucket", "salt", "kind", "ts", "val"],
        )

    def tag_offsets(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [batch.column("user_id"), batch.column("bucket"),
             batch.column("salt2"), pa.array([1] * n, pa.int8()),
             pa.nulls(n, pa.timestamp("us")), batch.column("offset")],
            names=["user_id", "bucket", "salt", "kind", "ts", "val"],
        )

    def add_offset(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized merge over all (user, bucket) cells of the partition
        off = g[g["kind"] == 1][["user_id", "bucket", "val"]].rename(
            columns={"val": "offset"}
        )
        r = g[g["kind"] == 0]
        if r.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "cum_cents": pd.Series([], dtype="int64"),
            })
        m = r.merge(off, on=["user_id", "bucket"], how="left")
        return pd.DataFrame({
            "user_id": m["user_id"],
            "ts": m["ts"],
            "cum_cents": (m["val"] + m["offset"].fillna(0)).astype("int64"),
        })

    both = rows.map_batches(tag_rows, batch_format="pyarrow").union(
        offsets.map_batches(tag_offsets, batch_format="pyarrow")
    )
    return both.groupby("salt").map_groups(add_offset, batch_format="pandas")


# --------------------------------------------------------------------------- #
# exact quantiles from a distributed value histogram (no global sort)

_QUANTILES = (50, 90, 99)


def events_value_quantiles(sf_dir: str) -> ray.data.Dataset:
    """p50/p90/p99 of value-cents per event_type, EXACTLY, without a
    global sort: per-batch (event_type, cents) partial counts → groupby
    sum (histogram; bounded by distinct cents per type) → per-type
    quantile walk over the sorted histogram. Matches DuckDB quantile_disc
    (element at index ceil(q·n)−1)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("event_type"), _cents(batch.column("value"))],
            names=["event_type", "cents"],
        )
        g = t.group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cents", "n"])

    hist = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents").reset_index(drop=True)
        counts = g["n"].to_numpy()
        cum = counts.cumsum()
        n = int(cum[-1])
        out = {"event_type": [g["event_type"].iloc[0]]}
        for q in _QUANTILES:
            idx = max(0, -(-q * n // 100) - 1)  # ceil(q*n/100) - 1
            pos = int(np.searchsorted(cum, idx + 1))
            out[f"p{q}_cents"] = [int(g["cents"].iloc[pos])]
        df = pd.DataFrame(out)
        for q in _QUANTILES:
            df[f"p{q}_cents"] = df[f"p{q}_cents"].astype("int64")
        return df

    return hist.groupby("event_type").map_groups(quantiles, batch_format="pandas")


def events_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """percent_rank() over every event row WITHOUT a global sort — the
    window-function emulation at scale: the same bounded value histogram
    events_value_quantiles builds becomes a broadcast (value → min-rank)
    table, and ranking is then a zero-shuffle per-batch merge. Driver
    pull is O(distinct (type, cents)) — price-like columns have bounded
    level sets, never O(rows). Integer-exact: pr_micro =
    (rank−1)·10⁶ // (n−1), ties share the min rank (SQL rank())."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("event_type"), _cents(batch.column("value"))],
            names=["event_type", "cents"],
        )
        g = t.group_by(["event_type", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cents", "n"])

    hist = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct (type, cents)) rows — see docstring
        .sort_values(["event_type", "cents"])
        .reset_index(drop=True)
    )
    cum = hist.groupby("event_type")["n"].cumsum() - hist["n"]
    tot = hist.groupby("event_type")["n"].transform("sum")
    lut = pd.DataFrame({
        "event_type": hist["event_type"], "cents": hist["cents"],
        "rank": (cum + 1).astype("int64"), "n_tot": tot.astype("int64"),
    })
    lut_ref = ray.put(lut)

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("cents", pa.int64()), ("pr_micro", pa.int64())]
    )

    def rank_batch(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = pd.DataFrame({
            "event_id": np.asarray(batch.column("event_id"), dtype=np.int64),
            "event_type": batch.column("event_type").to_pylist(),
            "cents": np.asarray(_cents(batch.column("value")), dtype=np.int64),
        })
        m = df.merge(lut, on=["event_type", "cents"], how="left")
        denom = np.maximum(m["n_tot"].to_numpy(np.int64) - 1, 1)
        pr = (m["rank"].to_numpy(np.int64) - 1) * 1_000_000 // denom
        return pa.Table.from_arrays(
            [pa.array(m["event_id"].to_numpy(np.int64)),
             pa.array(m["event_type"].to_numpy(dtype=object)),
             pa.array(m["cents"].to_numpy(np.int64)), pa.array(pr)],
            schema=out_schema,
        )

    return ev.map_batches(rank_batch, batch_format="pyarrow")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot the event log wide: one row per user, one count column per
    event type (fixed column set — schemas are static in a distributed
    pipeline). Conditional partial sums inside the batch, then one
    groupby over ≤|users| partial rows; no per-type passes."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    cols = [f"n_{t}" for t in _PIVOT_TYPES]

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        arrays = [batch.column("user_id")]
        for t in _PIVOT_TYPES:
            arrays.append(pc.cast(pc.equal(et, t), pa.int64()))
        arrays.append(pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        t = pa.Table.from_arrays(arrays, names=["user_id"] + cols + ["n_total"])
        return t.group_by(["user_id"]).aggregate(
            [(c, "sum") for c in cols + ["n_total"]]
        ).rename_columns(["user_id"] + cols + ["n_total"])

    return (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols + ["n_total"]])
    )


def pivot_oracle_sql() -> str:
    sums = ", ".join(
        f"sum((event_type = '{t}')::BIGINT)::BIGINT AS n_{t}" for t in _PIVOT_TYPES
    )
    return (
        f"SELECT user_id, {sums}, count(*)::BIGINT AS n_total "
        "FROM events GROUP BY user_id"
    )


PERCENT_RANK_ORACLE_SQL = """
SELECT event_id, event_type, cents,
  ((rank() OVER (PARTITION BY event_type ORDER BY cents) - 1) * 1000000
   // greatest(count(*) OVER (PARTITION BY event_type) - 1, 1))::BIGINT
    AS pr_micro
FROM (SELECT event_id, event_type,
             cast(round(value*100) AS BIGINT) AS cents FROM events)
"""


# --------------------------------------------------------------------------- #
# char-n-gram LM perplexity — CCNet/KenLM-style quality filtering

_LM_TRAIN_CAP = 100  # doc_id < cap trains the LM (fixed, broadcastable)
_LM_N = 3


def _charlm_counts(texts) -> tuple[dict, dict]:
    ctx: dict[str, int] = {}
    full: dict[str, int] = {}
    for t in texts:
        s = f"^^{t}$"
        for i in range(len(s) - _LM_N + 1):
            g = s[i : i + _LM_N]
            full[g] = full.get(g, 0) + 1
            c = g[:-1]
            ctx[c] = ctx.get(c, 0) + 1
    return ctx, full


def _charlm_counts_distributed(train: ray.data.Dataset) -> tuple[dict, dict]:
    """DISTRIBUTED trigram trainer: per-batch Counter partials → salted
    combine → one driver pull bounded by the DISTINCT-GRAM vocabulary
    (≈ charset³ worst case, thousands in practice), never by the number
    of training documents. Exact integer counts — identical model to the
    sequential _charlm_counts, any training-set size."""

    def partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            s = f"^^{t}$"
            for i in range(len(s) - _LM_N + 1):
                c[s[i : i + _LM_N]] += 1
        grams = list(c.keys())
        vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        salt = np.fromiter(
            ((zlib.crc32(g.encode()) % _JOIN_SALTS) for g in grams),
            dtype=np.int64, count=len(grams),
        )
        return pa.Table.from_arrays(
            [pa.array(grams, pa.string()), pa.array(vals), pa.array(salt)],
            names=["g", "c", "salt"],
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g", as_index=False)["c"].sum()
        return pd.DataFrame({
            "g": out["g"], "c": pd.Series(out["c"].to_numpy(), dtype="int64"),
        })

    agg = (
        train.map_batches(partials, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()  # bounded by distinct grams
    )
    full = dict(zip(agg["g"], agg["c"].astype(int)))
    ctx: dict[str, int] = {}
    for g, n in full.items():
        c = g[:-1]
        ctx[c] = ctx.get(c, 0) + n
    return ctx, full


def doc_charlm_ppl(sf_dir: str) -> ray.data.Dataset:
    """Per-doc char-trigram LM surprise with add-1 smoothing: emits
    (doc_id, n_grams, sum_millibits) where sum_millibits is the INTEGER sum
    of round(1000·-log2 P(c|prev2)) per trigram — per-trigram rounding
    before the sum keeps the distributed result bit-exact and lets the
    DuckDB oracle reproduce it (integer sums are order-independent; a
    float mean would drift by summation order). Mean millibits/gram =
    sum_millibits/n_grams for downstream filters. The LM trains on docs
    with doc_id < 100 via the DISTRIBUTED partial-count trainer
    (_charlm_counts_distributed — driver pull bounded by the distinct-
    gram vocabulary, never by training-doc count) and broadcasts the
    count tables once via ray.put."""
    import math

    train = _docs(sf_dir, ["doc_id", "text"]).filter(expr=f"doc_id < {_LM_TRAIN_CAP}")
    ctx, full = _charlm_counts_distributed(train)
    vocab_size = len({g[-1] for g in full}) + 1
    ref = ray.put((ctx, full, vocab_size))

    def score(batch: pa.Table) -> pa.Table:
        ctx, full, V = ray.get(ref)
        cost_memo: dict[str, int] = {}
        n_out, s_out = [], []
        for t in batch.column("text").to_pylist():
            s = f"^^{t}$"
            total = 0
            n = len(s) - _LM_N + 1
            for i in range(n):
                g = s[i : i + _LM_N]
                c = cost_memo.get(g)
                if c is None:
                    p = (full.get(g, 0) + 1) / (ctx.get(g[:-1], 0) + V)
                    # floor(x+0.5) == DuckDB round() for positive values
                    c = cost_memo[g] = int(math.floor(1000.0 * -math.log2(p) + 0.5))
                total += c
            n_out.append(n)
            s_out.append(total)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(n_out, pa.int64()),
             pa.array(s_out, pa.int64())],
            names=["doc_id", "n_grams", "sum_millibits"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


CHARLM_ORACLE_SQL = """
WITH tr AS (
  SELECT '^^' || text || '$' AS s FROM documents WHERE doc_id < 100
), tg AS (
  SELECT unnest(list_transform(generate_series(1, length(s) - 2),
                               i -> substr(s, i, 3))) AS g
  FROM tr
), fc AS (
  SELECT g, count(*)::BIGINT AS c FROM tg GROUP BY g
), cc AS (
  SELECT substr(g, 1, 2) AS cx, sum(c)::BIGINT AS c FROM fc GROUP BY cx
), vs AS (
  SELECT (count(DISTINCT substr(g, 3, 1)) + 1)::BIGINT AS v FROM fc
), dg AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, length('^^' || text || '$') - 2),
                          i -> substr('^^' || text || '$', i, 3))) AS g
  FROM documents
)
SELECT doc_id, count(*)::BIGINT AS n_grams,
  sum(round(1000.0 * -log2((coalesce(fc.c, 0) + 1)::DOUBLE
      / (coalesce(cc.c, 0) + (SELECT v FROM vs)))))::BIGINT AS sum_millibits
FROM dg LEFT JOIN fc USING (g) LEFT JOIN cc ON substr(dg.g, 1, 2) = cc.cx
GROUP BY doc_id
"""


# --------------------------------------------------------------------------- #
# as-of (temporal attribution) join — an operator Ray Data has no built-in for

def events_attribution(sf_dir: str) -> ray.data.Dataset:
    """Backward as-of join: each *purchase* event is matched to the most
    recent *click* of the same user STRICTLY before it (classic marketing
    attribution; the general shape is the financial tick as-of join).

    Ray Data has no as-of join, and a naive approach would global-sort
    the whole stream. Instead both sides are hash-co-partitioned on
    salt(user_id) — ONE bounded shuffle — and each partition runs a
    vectorized ``pd.merge_asof`` over its users (sorted within the
    partition only). Ties (two clicks at the same microsecond) break
    deterministically to the larger event_id, matching the SQL oracle's
    window ordering. At 100 TB the same pipeline adds a coarse time-range
    sub-key to the salt so a partition holds (user × time-slice), exactly
    like events_sessions' (user, day-bucket) cells."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(batch.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        )
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        return pa.Table.from_arrays(
            [t.column("event_id"),
             pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
             t.column("user_id"),
             pa.array(_key_salt(uid)),
             pc.equal(t.column("event_type"), "purchase")],
            names=["event_id", "ts_us", "user_id", "salt", "is_purchase"],
        )

    out_schema = pa.schema(
        [("purchase_event_id", pa.int64()), ("user_id", pa.int64()),
         ("purchase_ts_us", pa.int64()), ("click_event_id", pa.int64()),
         ("lag_us", pa.int64())]
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["purchase_event_id", "user_id", "purchase_ts_us",
                "click_event_id", "lag_us"]
        p = (
            g[g["is_purchase"]]
            .sort_values(["ts_us", "event_id"])
            .rename(columns={"event_id": "purchase_event_id",
                             "ts_us": "purchase_ts_us"})
            [["purchase_event_id", "user_id", "purchase_ts_us"]]
        )
        if p.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        c = (
            g[~g["is_purchase"]]
            .sort_values(["ts_us", "event_id"])  # ties -> last = max event_id
            .rename(columns={"event_id": "click_event_id",
                             "ts_us": "click_ts_us"})
            [["click_event_id", "user_id", "click_ts_us"]]
        )
        if c.empty:
            m = p.assign(click_event_id=np.nan, click_ts_us=np.nan)
        else:
            m = pd.merge_asof(
                p, c, left_on="purchase_ts_us", right_on="click_ts_us",
                by="user_id", direction="backward", allow_exact_matches=False,
            )
        m["lag_us"] = m["purchase_ts_us"] - m["click_ts_us"]
        for col in ("purchase_event_id", "user_id", "purchase_ts_us"):
            m[col] = m[col].astype("int64")
        for col in ("click_event_id", "lag_us"):
            m[col] = m[col].astype("Int64")  # nullable: purchases w/o click
        return m[cols]

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return out_schema.empty_table()
        return batch.select(out_schema.names).cast(out_schema)

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(asof, batch_format="pandas")
        .map_batches(stamp, batch_format="pyarrow")
    )


ATTRIBUTION_ORACLE_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         (event_type = 'purchase') AS isp
  FROM events WHERE event_type IN ('click', 'purchase')
), w AS (
  SELECT *,
    last_value(CASE WHEN NOT isp
                    THEN t::HUGEINT * 4294967296 + event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY t, isp DESC, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS enc
  FROM e
)
SELECT event_id AS purchase_event_id, user_id, t AS purchase_ts_us,
  (enc % 4294967296)::BIGINT AS click_event_id,
  (t - enc // 4294967296)::BIGINT AS lag_us
FROM w WHERE isp
"""


# --------------------------------------------------------------------------- #
# exact distinct count at scale: pre-dedup inside the batch BEFORE the shuffle

def events_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per event_type. The scale trick is
    the per-batch dedup: only distinct (event_type, user_id) pairs leave
    a batch, so the wide groupby sees at most |types|×|users| rows, not
    |events| — the exact-counting complement of the doc_token_hll sketch
    (which bounds memory when the distinct set itself is too large)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def dedup_batch(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        return g

    pairs = ev.map_batches(dedup_batch, batch_format="pyarrow")
    # distinct across batches, then count per type: two bounded groupbys
    distinct = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n")
    )

    count_schema = pa.schema([("event_type", pa.string()), ("n_users", pa.int64())])

    def count_partials(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return count_schema.empty_table()
        g = batch.group_by(["event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "n_users"]).cast(count_schema)

    return (
        distinct.map_batches(count_partials, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


# --------------------------------------------------------------------------- #
# stratified deterministic sampling — per-language rates over DETECTED language

_STRAT_RATES = {"ru": 20, "en": 5}  # keep % per detected language


def doc_sample_stratified(sf_dir: str) -> ray.data.Dataset:
    """Stratified deterministic sampling: language-ID (the doc_langid
    Arrow-kernel heuristic) picks the stratum, a multiply-shift hash of
    doc_id picks membership at that stratum's rate — 20 % of Russian
    docs, 5 % of English. RNG-free and coordination-free like
    doc_sample: the same rows survive any re-run/retry at any
    parallelism, which is what makes a 100 TB sampling job resumable.
    One fused map_batches — no shuffle at all."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        cyr = pc.count_substring_regex(text, "[а-яА-ЯёЁ]")
        lat = pc.count_substring_regex(text, "[a-zA-Z]")
        lang = pc.if_else(pc.greater(cyr, lat), "ru", "en")
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        h = (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ) % np.uint64(100)
        rate = np.where(
            np.asarray(pc.equal(lang, "ru")), _STRAT_RATES["ru"], _STRAT_RATES["en"]
        )
        t = pa.Table.from_arrays(
            [batch.column("doc_id"), lang,
             pc.cast(pc.utf8_length(text), pa.int64())],
            names=["doc_id", "lang_pred", "n_chars"],
        )
        return t.filter(pa.array(h < rate))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def stratified_sample_oracle_sql() -> str:
    ru, en = _STRAT_RATES["ru"], _STRAT_RATES["en"]
    return (
        "WITH l AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "CASE WHEN len(regexp_extract_all(text, '[а-яА-ЯёЁ]')) > "
        "len(regexp_extract_all(text, '[a-zA-Z]')) THEN 'ru' ELSE 'en' END AS lang_pred "
        "FROM documents) "
        "SELECT doc_id, lang_pred, n_chars FROM l "
        "WHERE ((((doc_id::HUGEINT * 11400714819323198485) % 18446744073709551616) "
        "// 8589934592) % 100)::BIGINT < "
        f"(CASE WHEN lang_pred = 'ru' THEN {ru} ELSE {en} END)"
    )


# --------------------------------------------------------------------------- #
# HyperLogLog distinct-count sketch — O(m) memory where exact counting can't fit

_HLL_B = 10                 # register index bits
_HLL_M = 1 << _HLL_B        # 1024 registers


def _hll_register_partials(batch: pa.Table) -> pa.Table:
    """Per-batch HLL register partial-max: tokens -> md5 hash -> (register,
    rho); only the 1024-bounded register maxima leave the batch."""
    toks = pc.unique(pc.list_flatten(pc.split_pattern(batch.column("text"), " ")))
    if len(toks) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["register", "max_rho"],
        )
    hs = np.fromiter(
        (_word_hash(w) for w in toks.to_pylist()), dtype=np.uint64, count=len(toks)
    )
    reg = (hs % np.uint64(_HLL_M)).astype(np.int64)
    v = ((hs >> np.uint64(_HLL_B)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    # rho = 32 - floor(log2(v)) for v>0 else 33; bit-exact via frexp
    # (v < 2^32 is exactly representable in float64, exponent == bit_length)
    rho = np.where(v > 0, 33 - np.frexp(v.astype(np.float64))[1], 33).astype(np.int64)
    maxima = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(maxima, reg, rho)
    used = np.nonzero(maxima)[0]
    return pa.Table.from_arrays(
        [pa.array(used.astype(np.int64)), pa.array(maxima[used])],
        names=["register", "max_rho"],
    )


def doc_token_hll_registers(sf_dir: str) -> ray.data.Dataset:
    """HyperLogLog(m=1024) register table over the corpus token stream —
    the mergeable sketch for COUNT DISTINCT when the distinct set itself
    is too large to shuffle (the exact complement: events_distinct_users).
    Register maxima are associative/commutative, so per-batch partials
    (≤1024 rows each) flow through one tiny groupby-max; duplicates never
    matter. Hashing is the engine's md5 word hash, reproduced exactly in
    SQL via md5_number_upper + bin()."""
    part = _docs(sf_dir, ["text"]).map_batches(
        _hll_register_partials, batch_format="pyarrow"
    )
    return part.groupby("register").aggregate(Max("max_rho", alias_name="max_rho"))


HLL_REGISTERS_ORACLE_SQL = """
WITH toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
), r AS (
  SELECT (md5_number_upper(tok) % 1024)::BIGINT AS register,
         ((md5_number_upper(tok) // 1024) % 4294967296) AS v
  FROM toks
)
SELECT register,
  max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END)::BIGINT AS max_rho
FROM r GROUP BY register
"""


def doc_token_hll_estimate(sf_dir: str) -> pd.DataFrame:
    """The HLL cardinality estimate from the register table. The harmonic
    sum is kept INTEGER-exact (Σ 2^(33-rho) scaled by 2^33, empty
    registers contribute 2^33) so the only float op is one final
    division, identical in numpy and DuckDB; the estimate is floored to
    millis. Driver pull is the ≤1024-row register table — bounded by the
    sketch size, never by the data."""
    regs = doc_token_hll_registers(sf_dir).to_pandas()  # ≤ _HLL_M rows
    rho = regs["max_rho"].to_numpy(dtype=np.int64)
    n_used = len(regs)
    sum_scaled = int((np.int64(1) << (np.int64(33) - rho)).sum()) + (
        (_HLL_M - n_used) << 33
    )
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    est = alpha * _HLL_M * _HLL_M * 8589934592.0 / sum_scaled
    n_empty = _HLL_M - n_used
    if est <= 2.5 * _HLL_M and n_empty > 0:
        # linear-counting small-range correction; math.log is libm's
        # double log — the same function DuckDB's ln() calls, so the
        # floats are bit-identical
        est = _HLL_M * math.log(_HLL_M / n_empty)
    return pd.DataFrame({
        "n_registers_used": pd.Series([n_used], dtype="int64"),
        "sum_scaled": pd.Series([sum_scaled], dtype="int64"),
        "est_millis": pd.Series([int(np.floor(est * 1000.0))], dtype="int64"),
    })


HLL_ESTIMATE_ORACLE_SQL = """
WITH toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
), r AS (
  SELECT (md5_number_upper(tok) % 1024)::BIGINT AS register,
         ((md5_number_upper(tok) // 1024) % 4294967296) AS v
  FROM toks
), regs AS (
  SELECT register,
    max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END)::BIGINT AS max_rho
  FROM r GROUP BY register
), agg AS (
  SELECT count(*)::BIGINT AS n_used,
    (sum((1::BIGINT << (33 - max_rho))) +
     (1024 - count(*))::BIGINT * 8589934592)::BIGINT AS sum_scaled
  FROM regs
), raw AS (
  SELECT n_used, sum_scaled,
    (0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024 * 8589934592.0
      / sum_scaled AS est
  FROM agg
)
SELECT n_used AS n_registers_used, sum_scaled,
  floor((CASE WHEN est <= 2.5 * 1024 AND n_used < 1024
              THEN 1024 * ln(1024 / (1024.0 - n_used))
              ELSE est END) * 1000.0)::BIGINT AS est_millis
FROM raw
"""


# --------------------------------------------------------------------------- #
# semi-structured extraction: parse a JSON-ish props column with Arrow's
# vectorized RE2, then the standard partial-agg + tiny-groupby pattern.
# The point at 100 TB: payload parsing stays a zero-shuffle Arrow kernel
# (no per-row json.loads Python loop), and only (type, bucket) partial
# rows enter the exchange.

def events_props_extract(sf_dir: str) -> ray.data.Dataset:
    """Extract the integer ``k`` field from the JSON ``props`` column and
    aggregate (event_type, k//10 bucket) → (n_events, sum_k)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.Table.from_arrays(
            [batch.column("event_type"),
             pc.divide(k, 10),  # integer floor division on int64
             k],
            names=["event_type", "k_bucket", "k"],
        )
        g = t.group_by(["event_type", "k_bucket"]).aggregate(
            [([], "count_all"), ("k", "sum")]
        )
        return g.rename_columns(["event_type", "k_bucket", "n_events", "sum_k"])

    return (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_k", alias_name="sum_k"))
    )


PROPS_EXTRACT_ORACLE_SQL = """
SELECT event_type,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) // 10 AS k_bucket,
       count(*)::BIGINT AS n_events,
       sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))::BIGINT AS sum_k
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# GROUPED HLL — one sketch per group key, merged by (group, register).
# Unlike the global doc_token_hll_* pair (driver reads the one 1024-row
# register table), the grouped form never touches the driver at all: the
# estimate runs inside map_groups and the result itself is O(groups).
# This is the "distinct users per day over a year of 100 TB logs" shape —
# groups × 1024 bounded rows through the only shuffle.

_DAY_US = 86_400_000_000


def _hll_int_partials(day: np.ndarray, uid: np.ndarray) -> pd.DataFrame:
    """(day, register, max_rho) partials for int64 keys — fully
    vectorized multiply-shift hashing (no per-item md5: integer keys get
    the HUGEINT-reproducible golden-ratio hash, cf. doc_sample)."""
    pairs = pd.DataFrame({"day": day, "uid": uid}).drop_duplicates()
    h = pairs["uid"].to_numpy(np.int64).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    reg = (h % np.uint64(_HLL_M)).astype(np.int64)
    v = ((h >> np.uint64(_HLL_B)) & np.uint64(0xFFFFFFFF)).astype(np.int64)
    rho = np.where(v > 0, 33 - np.frexp(v.astype(np.float64))[1], 33).astype(np.int64)
    g = pd.DataFrame({"day": pairs["day"].to_numpy(np.int64), "register": reg,
                      "max_rho": rho}).groupby(
        ["day", "register"], as_index=False
    )["max_rho"].max()
    return g


def events_daily_hll_registers(sf_dir: str) -> ray.data.Dataset:
    """Per-day HLL(m=1024) register tables over event user_ids."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def partials(batch: pa.Table) -> pa.Table:
        ts_us = np.asarray(
            pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")), pa.int64())
        )
        g = _hll_int_partials(
            ts_us // _DAY_US, np.asarray(batch.column("user_id"), dtype=np.int64)
        )
        return pa.Table.from_arrays(
            [pa.array(g["day"].to_numpy(np.int64)),
             pa.array(g["register"].to_numpy(np.int64)),
             pa.array(g["max_rho"].to_numpy(np.int64))],
            names=["day", "register", "max_rho"],
        )

    return (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["day", "register"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


_DAILY_HLL_SCHEMA = pa.schema(
    [("day", pa.int64()), ("n_registers_used", pa.int64()),
     ("sum_scaled", pa.int64()), ("est_millis", pa.int64())]
)


def events_daily_hll_estimate(sf_dir: str) -> ray.data.Dataset:
    """Per-day distinct-user estimates from the grouped register tables —
    the estimate math of doc_token_hll_estimate, run DISTRIBUTED inside
    map_groups (each group ≤ 1024 register rows; Python dispatch is
    O(days), the interior integer-exact with one IEEE division + libm
    log, identical to DuckDB)."""
    regs = events_daily_hll_registers(sf_dir)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        rho = g["max_rho"].to_numpy(np.int64)
        n_used = len(g)
        sum_scaled = int((np.int64(1) << (np.int64(33) - rho)).sum()) + (
            (_HLL_M - n_used) << 33
        )
        alpha = 0.7213 / (1 + 1.079 / _HLL_M)
        est = alpha * _HLL_M * _HLL_M * 8589934592.0 / sum_scaled
        n_empty = _HLL_M - n_used
        if est <= 2.5 * _HLL_M and n_empty > 0:
            est = _HLL_M * math.log(_HLL_M / n_empty)
        return pd.DataFrame({
            "day": pd.Series([int(g["day"].iloc[0])], dtype="int64"),
            "n_registers_used": pd.Series([n_used], dtype="int64"),
            "sum_scaled": pd.Series([sum_scaled], dtype="int64"),
            "est_millis": pd.Series([int(np.floor(est * 1000.0))], dtype="int64"),
        })

    def stamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return _DAILY_HLL_SCHEMA.empty_table()
        return batch.select(_DAILY_HLL_SCHEMA.names).cast(_DAILY_HLL_SCHEMA)

    return (
        regs.groupby("day")
        .map_groups(estimate, batch_format="pandas")
        .map_batches(stamp, batch_format="pyarrow")
    )


_DAILY_HLL_R_CTE = f"""
WITH p AS (
  SELECT DISTINCT epoch_us(ts) // {_DAY_US} AS day, user_id FROM events
), h AS (
  SELECT day,
    ((user_id::HUGEINT * 11400714819323198485) % 18446744073709551616) AS h
  FROM p
), r AS (
  SELECT day, (h % {_HLL_M})::BIGINT AS register,
         ((h // {_HLL_M}) % 4294967296)::BIGINT AS v
  FROM h
), regs AS (
  SELECT day, register,
    max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END)::BIGINT AS max_rho
  FROM r GROUP BY day, register
)"""

DAILY_HLL_REGISTERS_ORACLE_SQL = _DAILY_HLL_R_CTE + """
SELECT day, register, max_rho FROM regs
"""

DAILY_HLL_ESTIMATE_ORACLE_SQL = _DAILY_HLL_R_CTE + f"""
, agg AS (
  SELECT day, count(*)::BIGINT AS n_used,
    (sum((1::BIGINT << (33 - max_rho))) +
     ({_HLL_M} - count(*))::BIGINT * 8589934592)::BIGINT AS sum_scaled
  FROM regs GROUP BY day
), raw AS (
  SELECT day, n_used, sum_scaled,
    (0.7213 / (1 + 1.079 / {_HLL_M})) * {_HLL_M} * {_HLL_M} * 8589934592.0
      / sum_scaled AS est
  FROM agg
)
SELECT day, n_used AS n_registers_used, sum_scaled,
  floor((CASE WHEN est <= 2.5 * {_HLL_M} AND n_used < {_HLL_M}
              THEN {_HLL_M} * ln({_HLL_M} / ({_HLL_M}.0 - n_used))
              ELSE est END) * 1000.0)::BIGINT AS est_millis
FROM raw
"""


# --------------------------------------------------------------------------- #
# count-min sketch — the mergeable frequency sketch (complement of HLL's
# cardinality sketch): bounded-size register table, per-token overestimates

_CMS_W = 1024  # buckets per row
_CMS_D = 4  # independent hash rows
_CMS_RNG = np.random.RandomState(99)
_CMS_A = _CMS_RNG.randint(1, int(_MH_P), size=_CMS_D).astype(np.uint64)
_CMS_B = _CMS_RNG.randint(0, int(_MH_P), size=_CMS_D).astype(np.uint64)


def _cms_register_partials(batch: pa.Table) -> pa.Table:
    """Per-batch count-min partial counts: token occurrences -> md5 word
    hash -> _CMS_D universal-hash buckets; only the ≤ D·W nonzero
    register sums leave the batch."""
    toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
    if len(toks) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()),
             pa.array([], pa.int64())],
            names=["depth", "bucket", "cnt"],
        )
    vc = pa.Table.from_arrays([toks], names=["t"]).group_by(["t"]).aggregate(
        [([], "count_all")]
    )
    words = vc.column("t").to_pylist()
    counts = np.asarray(vc.column("count_all"), dtype=np.int64)
    wh = np.fromiter(
        (_word_hash(w) for w in words), dtype=np.uint64, count=len(words)
    ) % _MH_P
    grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for d in range(_CMS_D):
        b = ((_CMS_A[d] * wh + _CMS_B[d]) % _MH_P % np.uint64(_CMS_W)).astype(np.int64)
        np.add.at(grid[d], b, counts)
    dd, bb = np.nonzero(grid)
    return pa.Table.from_arrays(
        [pa.array(dd.astype(np.int64)), pa.array(bb.astype(np.int64)),
         pa.array(grid[dd, bb])],
        names=["depth", "bucket", "cnt"],
    )


def doc_token_cms_registers(sf_dir: str) -> ray.data.Dataset:
    """Count-min sketch (4×1024) register table over the corpus token
    stream. Register sums are associative, so per-batch partials (≤4096
    rows) flow through one tiny groupby-sum; the sketch answers point
    frequency queries with one-sided error cnt_est ≥ cnt_true. Hashing
    is the engine's md5 word hash mod 2^31-1 under the minhash-style
    (a·h+b) mod p universal family — BIGINT-safe, SQL-exact."""
    part = _docs(sf_dir, ["text"]).map_batches(
        _cms_register_partials, batch_format="pyarrow"
    )
    return part.groupby(["depth", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))


def _cms_hash_values_sql() -> str:
    return ", ".join(
        f"({d},{int(_CMS_A[d])},{int(_CMS_B[d])})" for d in range(_CMS_D)
    )


CMS_REGISTERS_ORACLE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), h AS (
  SELECT (md5_number_upper(tok) % 2147483647)::BIGINT AS wh FROM toks
), d(depth, a, b) AS (VALUES {_cms_hash_values_sql()})
SELECT depth, ((a * wh + b) % 2147483647) % {_CMS_W} AS bucket,
       count(*)::BIGINT AS cnt
FROM h, d GROUP BY depth, bucket
"""


def doc_token_cms_estimate(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Heavy-hitter audit: the true top-k tokens (distributed partial
    top-k) next to their count-min estimates (min over the 4 hash rows).
    Driver pull is the ≤4096-row register table + k rows — bounded by the
    sketch, never by the corpus. est ≥ freq always (one-sided error)."""
    top = doc_token_freq(sf_dir, top_k=k).to_pandas()  # k rows
    regs = doc_token_cms_registers(sf_dir).to_pandas()  # ≤ D·W rows
    grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    grid[regs["depth"].to_numpy(dtype=np.int64),
         regs["bucket"].to_numpy(dtype=np.int64)] = regs["cnt"].to_numpy(dtype=np.int64)
    wh = np.fromiter(
        (_word_hash(w) for w in top["token"]), dtype=np.uint64, count=len(top)
    ) % _MH_P
    ests = np.full(len(top), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(_CMS_D):
        b = ((_CMS_A[d] * wh + _CMS_B[d]) % _MH_P % np.uint64(_CMS_W)).astype(np.int64)
        ests = np.minimum(ests, grid[d, b])
    return pd.DataFrame({
        "token": top["token"].astype(str),
        "freq": top["freq"].astype("int64"),
        "est": pd.Series(ests, dtype="int64"),
    })


CMS_ESTIMATE_ORACLE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), top AS (
  SELECT tok AS token, count(*)::BIGINT AS freq FROM toks
  GROUP BY tok ORDER BY freq DESC, token LIMIT 20
), h AS (
  SELECT (md5_number_upper(tok) % 2147483647)::BIGINT AS wh FROM toks
), d(depth, a, b) AS (VALUES {_cms_hash_values_sql()}),
regs AS (
  SELECT depth, ((a * wh + b) % 2147483647) % {_CMS_W} AS bucket,
         count(*)::BIGINT AS cnt
  FROM h, d GROUP BY depth, bucket
), lk AS (
  SELECT t.token, t.freq, r.cnt
  FROM top t, d
  JOIN regs r ON r.depth = d.depth
    AND r.bucket = ((d.a * (md5_number_upper(t.token) % 2147483647)::BIGINT + d.b)
                    % 2147483647) % {_CMS_W}
)
SELECT token, freq, min(cnt)::BIGINT AS est FROM lk GROUP BY token, freq
"""


def _cms_grid(regs: pd.DataFrame) -> np.ndarray:
    grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    grid[regs["depth"].to_numpy(np.int64), regs["bucket"].to_numpy(np.int64)] = (
        regs["cnt"].to_numpy(np.int64)
    )
    return grid


def _cms_point_est(grid: np.ndarray, wh: np.ndarray) -> np.ndarray:
    ests = np.full(len(wh), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(_CMS_D):
        b = ((_CMS_A[d] * wh + _CMS_B[d]) % _MH_P % np.uint64(_CMS_W)).astype(np.int64)
        ests = np.minimum(ests, grid[d, b])
    return ests


def doc_token_heavy_hitters(sf_dir: str) -> ray.data.Dataset:
    """Sketch-guided EXACT heavy hitters: tokens whose count-min estimate
    is ≥ 1% of the token stream, with their exact frequencies.

    The 100-TB point: a full ``groupby(token)`` moves the whole
    vocabulary through the exchange; here the (4×1024)-register sketch —
    built distributed, pulled bounded, broadcast with ``ray.put`` — gates
    the second pass INSIDE ``map_batches``, so only candidate tokens'
    per-batch partial counts shuffle. CMS error is one-sided (est ≥
    freq), so no true heavy hitter is ever dropped; the ``est`` column
    records the bound that admitted each candidate (some may be
    collision-inflated false positives — their exact freq exposes them).
    Threshold = total_tokens // 100, derived from the sketch itself
    (row-0 register sum), so both sides compute it identically."""
    regs = doc_token_cms_registers(sf_dir).to_pandas()  # ≤ D·W rows
    grid = _cms_grid(regs)
    threshold = int(grid[0].sum()) // 100
    grid_ref = ray.put(grid)

    out_schema = pa.schema([("token", pa.string()), ("cnt", pa.int64())])

    def candidates(batch: pa.Table) -> pa.Table:
        grid = ray.get(grid_ref)
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        if len(toks) == 0:
            return out_schema.empty_table()
        vc = pa.Table.from_arrays([toks], names=["token"]).group_by(
            ["token"]
        ).aggregate([([], "count_all")])
        words = vc.column("token").to_pylist()
        wh = np.fromiter(
            (_word_hash(w) for w in words), dtype=np.uint64, count=len(words)
        ) % _MH_P
        keep = _cms_point_est(grid, wh) >= threshold
        return pa.Table.from_arrays(
            [vc.column("token").filter(pa.array(keep)),
             pc.cast(vc.column("count_all").filter(pa.array(keep)), pa.int64())],
            schema=out_schema,
        )

    freq = (
        _docs(sf_dir, ["text"])
        .map_batches(candidates, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="freq"))
    )

    est_schema = pa.schema(
        [("token", pa.string()), ("freq", pa.int64()), ("est", pa.int64())]
    )

    def attach_est(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return est_schema.empty_table()
        grid = ray.get(grid_ref)
        words = batch.column("token").to_pylist()
        wh = np.fromiter(
            (_word_hash(w) for w in words), dtype=np.uint64, count=len(words)
        ) % _MH_P
        return pa.Table.from_arrays(
            [batch.column("token"), pc.cast(batch.column("freq"), pa.int64()),
             pa.array(_cms_point_est(grid, wh))],
            schema=est_schema,
        )

    return freq.map_batches(attach_est, batch_format="pyarrow")


HEAVY_HITTERS_ORACLE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), d(depth, a, b) AS (VALUES {_cms_hash_values_sql()}),
regs AS (
  SELECT d.depth,
         ((d.a * (md5_number_upper(tok) % 2147483647)::BIGINT + d.b)
          % 2147483647) % {_CMS_W} AS bucket,
         count(*)::BIGINT AS cnt
  FROM toks, d GROUP BY d.depth, bucket
), thr AS (
  SELECT sum(cnt) // 100 AS t FROM regs WHERE depth = 0
), tf AS (
  SELECT tok AS token, count(*)::BIGINT AS freq FROM toks GROUP BY tok
), est AS (
  SELECT tf.token, tf.freq, min(r.cnt)::BIGINT AS est
  FROM tf, d
  JOIN regs r ON r.depth = d.depth
    AND r.bucket = ((d.a * (md5_number_upper(tf.token) % 2147483647)::BIGINT
                     + d.b) % 2147483647) % {_CMS_W}
  GROUP BY tf.token, tf.freq
)
SELECT token, freq, est FROM est, thr WHERE est >= thr.t
"""


# --------------------------------------------------------------------------- #
# prefix-filtered exact similarity join (PPJoin-style inverted index) — the
# recall-1 complement of MinHash LSH

_PFX_SH_DOC_CAP = 256  # max docs emitted per prefix-shingle posting list


def doc_jaccard_join_prefix(sf_dir: str, threshold_pct: int = 50) -> ray.data.Dataset:
    """EXACT Jaccard similarity join at threshold t via prefix filtering
    (PPJoin/AllPairs family) — unlike the MinHash LSH listing this has a
    RECALL-1 guarantee: order every doc's shingles by global rarity
    (document frequency, then hash); any two docs with Jaccard ≥ t must
    share at least one of each other's first ``n - ceil(t·n) + 1``
    shingles, so the candidate equi-join on prefix shingles misses
    nothing (proof: if the prefixes were disjoint, the intersection is
    confined to the ≤ ceil(t·n)−1 suffix elements of both, too few to
    reach t).

    Scale shape — three salted co-partitioned exchanges, each bounded:
    1. postings (shingle → doc) grouped by salt(shingle): ALL postings of
       a shingle share its partition, so document frequency is a
       partition-local vectorized count — no separate DF join.
    2. re-key by salt(doc): per-doc prefix selection is one sort +
       cumcount over the partition frame.
    3. re-key prefix rows by salt(shingle): per-shingle pair emission,
       capped at _PFX_SH_DOC_CAP docs per posting list (deterministic
       lowest-ids-win, logged) — rarity ordering keeps true posting
       lists short; only degenerate duplicate clusters hit the cap (the
       dedup operator handles those linearly).
    Then exact-Jaccard verification through _verify_candidate_pairs
    (texts cross the shuffle once per partition, not per pair)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for s in _shingles(text):
                ids.append(did)
                shs.append(_shingle_hash(s))
        sh = np.array(shs, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(sh), pa.array(np.array(ids, dtype=np.int64)),
             pa.array(_key_salt(sh))],
            names=["sh", "doc_id", "salt"],
        )

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # every posting of a shingle is in this partition -> global DF
        df = g.groupby("sh")["doc_id"].transform("size")
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "sh": g["sh"].astype("int64").reset_index(drop=True),
            "df": pd.Series(df.to_numpy(dtype=np.int64), dtype="int64"),
            "salt": pd.Series(_key_salt(ids), dtype="int64"),
        })

    def prefix_select(g: pd.DataFrame) -> pd.DataFrame:
        # rank each doc's shingles by (df, sh); keep n - ceil(t*n) + 1
        g = g.sort_values(["doc_id", "df", "sh"], kind="mergesort")
        n = g.groupby("doc_id")["sh"].transform("size").to_numpy(dtype=np.int64)
        rank = g.groupby("doc_id").cumcount().to_numpy(dtype=np.int64)
        pfx_len = n - (threshold_pct * n + 99) // 100 + 1
        keep = g[rank < pfx_len]
        sh = keep["sh"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "sh": pd.Series(sh, dtype="int64"),
            "doc_id": keep["doc_id"].astype("int64").reset_index(drop=True),
            "salt": pd.Series(_key_salt(sh), dtype="int64"),
        })

    def posting_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        dropped = 0
        dup = g[g.duplicated(["sh"], keep=False)]
        for _, ids in dup.groupby("sh", sort=False)["doc_id"]:
            u = np.unique(ids.to_numpy())
            if len(u) > _PFX_SH_DOC_CAP:
                dropped += len(u) - _PFX_SH_DOC_CAP
                u = u[:_PFX_SH_DOC_CAP]
            ii, jj = np.triu_indices(len(u), k=1)
            a_out.append(u[ii])
            b_out.append(u[jj])
        if dropped:
            print(
                f"[doc_jaccard_join_prefix] posting cap {_PFX_SH_DOC_CAP}: "
                f"dropped {dropped} docs from pair emission"
            )
        a = np.concatenate(a_out) if a_out else np.array([], dtype=np.int64)
        b = np.concatenate(b_out) if b_out else np.array([], dtype=np.int64)
        return pd.DataFrame({
            "doc_a": pd.Series(a, dtype="int64"), "doc_b": pd.Series(b, dtype="int64")
        })

    cand = (
        docs.map_batches(postings, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("salt")
        .map_groups(prefix_select, batch_format="pandas")
        .groupby("salt")
        .map_groups(posting_pairs, batch_format="pandas")
    )
    return _verify_candidate_pairs(docs, cand, threshold_pct, dedup_cand=True)


_TFIDF_K = 5
_TFIDF_IDF_SCALE = 1_000_000


def _term_salt(terms: pd.Series) -> np.ndarray:
    """Deterministic string-term → bounded partition router
    (hash_pandas_object uses a fixed default key → identical across
    worker processes)."""
    return (
        pd.util.hash_pandas_object(terms, index=False).to_numpy()
        % np.uint64(_JOIN_SALTS)
    ).astype(np.int64)


def doc_tfidf_topk(sf_dir: str, k: int = _TFIDF_K) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms, integer-exact: score =
    tf · ((N · 10^6) // df) — all floor arithmetic, so DuckDB reproduces
    ranks and scores bit-for-bit (no float log).

    Scale shape — two salted co-partitioned exchanges:
    1. per-batch (doc, term, tf) partials (a doc never spans batches, so
       tf is exact) PLUS per-batch df partials, both routed by
       salt(term): document frequency is summed partition-locally and
       attached to the term rows in the same pass — no separate DF join.
    2. re-key by salt(doc_id): per-doc top-k is one vectorized sort +
       cumcount per partition (partial top-k is already per-doc, so
       nothing quadratic).
    N (corpus size) is the only driver scalar. Emits
    (doc_id, rank, term, tf, df, score)."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def tf_partials(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[["doc_id"]].assign(term=df["text"].str.split(" ")).explode("term")
        g = ex.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        t_salt = _term_salt(g["term"])
        tf_rows = pd.DataFrame({
            "salt": pd.Series(t_salt, dtype="int64"),
            "kind": pd.Series(np.ones(len(g), dtype=np.int8), dtype="int8"),
            "term": g["term"].astype(str),
            "doc_id": g["doc_id"].astype("int64"),
            "val": g["tf"].astype("int64"),
        })
        d = g.groupby("term", sort=False).size().reset_index(name="dfp")
        df_rows = pd.DataFrame({
            "salt": pd.Series(_term_salt(d["term"]), dtype="int64"),
            "kind": pd.Series(np.zeros(len(d), dtype=np.int8), dtype="int8"),
            "term": d["term"].astype(str),
            "doc_id": pd.Series(np.zeros(len(d), dtype=np.int64), dtype="int64"),
            "val": d["dfp"].astype("int64"),
        })
        return pd.concat([tf_rows, df_rows], ignore_index=True)

    def join_df(g: pd.DataFrame) -> pd.DataFrame:
        # all partials of a term share this partition → global df
        dfs = g[g["kind"] == 0].groupby("term", sort=False)["val"].sum()
        tf = g[g["kind"] == 1]
        if tf.empty:
            return pd.DataFrame({
                "salt": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
            })
        ids = tf["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "salt": pd.Series(_key_salt(ids), dtype="int64"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "term": tf["term"].reset_index(drop=True),
            "tf": tf["val"].astype("int64").reset_index(drop=True),
            "df": pd.Series(
                tf["term"].map(dfs).to_numpy(dtype=np.int64), dtype="int64"
            ),
        })

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="int64"),
            })
        idf = (n_docs * _TFIDF_IDF_SCALE) // g["df"].to_numpy(dtype=np.int64)
        g = g.assign(score=g["tf"].to_numpy(dtype=np.int64) * idf)
        g = g.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        rank = g.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        g = g.assign(rank=rank.astype(np.int64))
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64").reset_index(drop=True),
            "rank": g["rank"].astype("int64").reset_index(drop=True),
            "term": g["term"].reset_index(drop=True),
            "tf": g["tf"].astype("int64").reset_index(drop=True),
            "df": g["df"].astype("int64").reset_index(drop=True),
            "score": g["score"].astype("int64").reset_index(drop=True),
        })

    return (
        docs.map_batches(tf_partials, batch_format="pandas")
        .groupby("salt")
        .map_groups(join_df, batch_format="pandas")
        .groupby("salt")
        .map_groups(topk, batch_format="pandas")
    )


def tfidf_oracle_sql(k: int = _TFIDF_K) -> str:
    """Reproduces doc_tfidf_topk exactly (same whitespace split, same
    integer idf scale, same (score DESC, term) tie order)."""
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY doc_id, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (((SELECT count(*) FROM documents) * {_TFIDF_IDF_SCALE}) // df.df)
           AS score
  FROM tf JOIN df USING (term)
)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank,
       term, tf, df, score::BIGINT AS score
FROM sc QUALIFY rank <= {k}"""


# --------------------------------------------------------------------------- #
# BM25 retrieval: inverted-index scoring for a fixed query workload

# (query_id, term) — the retrieval workload; a term may serve any number
# of queries. At scale this is the small side: stats for |terms| tokens.
_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "hash"), (0, "join"),
    (1, "window"), (1, "sort"), (1, "merge"),
    (2, "spark"), (2, "stream"),
)
_BM25_K = 10
_BM25_IDF_SCALE = 1_000_000


def _bm25_scores(tf: np.ndarray, dl: np.ndarray, idf: np.ndarray,
                 n: int, t: int) -> np.ndarray:
    """Integer-exact BM25(k1=1.2, b=0.75) per (doc, term).

    term = idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
    avgdl = T/N becomes, after multiplying through by 20·T,
        idf · 44·tf·T / (20·T·tf + 6·T + 18·dl·N)
    — an integer numerator/denominator. The one float64 division (and the
    fixed left-assoc multiply chain feeding it) is IEEE-deterministic, so
    DuckDB computes bit-identical doubles; flooring to int64 BEFORE the
    per-query sum makes the total order-independent. (Same
    quantize-before-decide discipline as emb_neardup_lsh / doc_sample.)"""
    den = 20 * t * tf + 6 * t + 18 * dl * n  # int64, exact
    num = ((idf.astype(np.float64) * 44.0) * tf.astype(np.float64)) * float(t)
    return np.floor(num / den.astype(np.float64)).astype(np.int64)


def doc_bm25_topk(sf_dir: str, k: int = _BM25_K) -> ray.data.Dataset:
    """Top-k documents per query under BM25 — the lexical-retrieval
    complement of emb_ann_topk (dense) and doc_tfidf_topk (per-doc terms).

    Scale shape:
    1. ONE stats pass, partial-aggregated: per-batch (term → per-doc df
       partial) for the |query terms| tokens only, plus corpus N and
       total-token T counters — a (key, val) partial table whose final
       groupby is O(|terms|+2); driver pull bounded by the same.
    2. ONE zero-shuffle scoring pass: tf per (doc, query-term) via
       Arrow list-flatten + is_in (never a full vocabulary explode),
       per-batch per-query partial top-k (a doc never spans batches).
    3. Final top-k over ≤ blocks × |queries| × k tiny partial rows.
    Emits (query_id, rank, doc_id, score)."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    terms = sorted({t for _, t in _BM25_QUERIES})
    terms_arr = pa.array(terms)

    def stats_partials(batch: pa.Table) -> pa.Table:
        ws = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(ws)
        parent = pc.list_parent_indices(ws)
        mask = pc.is_in(flat, value_set=terms_arr)
        hits = pa.Table.from_arrays(
            [flat.filter(mask), parent.filter(mask)], names=["term", "i"]
        )
        # df partial: docs-in-batch containing each term
        g = hits.group_by(["term", "i"]).aggregate([]).group_by("term").aggregate(
            [([], "count_all")]
        )
        keys = g.column("term").to_pylist() + ["__N__", "__T__"]
        vals = [int(v) for v in g.column("count_all").to_pylist()] + [
            batch.num_rows, int(pc.sum(pc.list_value_length(ws)).as_py() or 0)
        ]
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), pa.array(vals, pa.int64())],
            names=["key", "val"],
        )

    stats = (
        docs.map_batches(stats_partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("val", alias_name="val"))
        .to_pandas()  # ≤ |terms|+2 rows
    )
    sd = dict(zip(stats["key"], stats["val"]))
    n_docs, n_tokens = int(sd.pop("__N__")), int(sd.pop("__T__"))
    # integer idf with +1 smoothing (never ≤0, df=0 terms simply no-op)
    idf = {
        t: ((n_docs - int(sd.get(t, 0)) + 1) * _BM25_IDF_SCALE)
        // (int(sd.get(t, 0)) + 1)
        for t in terms
    }
    qmap = pd.DataFrame(_BM25_QUERIES, columns=["query_id", "term"])

    out_schema = pa.schema(
        [("query_id", pa.int64()), ("doc_id", pa.int64()), ("score", pa.int64())]
    )

    def score_partials(batch: pa.Table) -> pa.Table:
        ws = pc.split_pattern(batch.column("text"), " ")
        dl_all = np.asarray(pc.list_value_length(ws), dtype=np.int64)
        flat = pc.list_flatten(ws)
        parent = pc.list_parent_indices(ws)
        mask = pc.is_in(flat, value_set=terms_arr)
        if int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0) == 0:
            return out_schema.empty_table()
        hits = pa.Table.from_arrays(
            [flat.filter(mask), parent.filter(mask)], names=["term", "i"]
        )
        tf = (
            hits.group_by(["i", "term"]).aggregate([([], "count_all")])
            .rename_columns(["i", "term", "tf"]).to_pandas()
        )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        tf["score"] = _bm25_scores(
            tf["tf"].to_numpy(np.int64), dl_all[tf["i"].to_numpy()],
            tf["term"].map(idf).to_numpy(np.int64), n_docs, n_tokens,
        )
        sc = tf.merge(qmap, on="term").groupby(
            ["query_id", "i"], as_index=False
        )["score"].sum()
        sc["doc_id"] = ids[sc["i"].to_numpy()]
        # per-batch partial top-k (a doc never spans batches)
        sc = sc.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        sc = sc[sc.groupby("query_id", sort=False).cumcount() < k]
        return pa.Table.from_arrays(
            [pa.array(sc["query_id"].to_numpy(np.int64)),
             pa.array(sc["doc_id"].to_numpy(np.int64)),
             pa.array(sc["score"].to_numpy(np.int64))],
            schema=out_schema,
        )

    final_schema = pa.schema(
        [("query_id", pa.int64()), ("rank", pa.int64()),
         ("doc_id", pa.int64()), ("score", pa.int64())]
    )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        df = df[df["rank"] <= k]
        return df[["query_id", "rank", "doc_id", "score"]].astype("int64")

    partial = docs.map_batches(score_partials, batch_format="pyarrow")
    # ≤ blocks × |queries| × k partial rows → one block, one final sort
    return partial.repartition(1).map_batches(
        final_topk, batch_format="pandas", batch_size=None
    )


def bm25_oracle_sql(k: int = _BM25_K) -> str:
    """Reproduces doc_bm25_topk bit-for-bit: same integer idf, same
    left-assoc float64 multiply chain and single division (IEEE-identical
    in DuckDB), floor-to-int per term before the per-query sum."""
    qvals = ", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), dl AS (
  SELECT doc_id, len(ws)::BIGINT AS dl FROM d
), tot AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS t FROM dl
), q(query_id, term) AS (VALUES {qvals}),
tok AS (
  SELECT doc_id, unnest(ws) AS term FROM d
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
), df AS (
  SELECT q.term, count(DISTINCT tf.doc_id)::BIGINT AS df
  FROM (SELECT DISTINCT term FROM q) q LEFT JOIN tf USING (term) GROUP BY q.term
), sc AS (
  SELECT q.query_id, tf.doc_id,
    sum(floor(
      ((((((tot.n - df.df + 1) * {_BM25_IDF_SCALE}) // (df.df + 1))::DOUBLE
        * 44) * tf.tf) * tot.t)
      / (20 * tot.t * tf.tf + 6 * tot.t + 18 * dl.dl * tot.n)
    ))::BIGINT AS score
  FROM tf JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id), tot
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)
         AS rank,
       doc_id, score
FROM sc QUALIFY rank <= {k}"""


def prefix_join_oracle_sql(threshold_pct: int = 50) -> str:
    """Reproduces doc_jaccard_join_prefix exactly: same shingles, same
    md5-mod-2^31-1 rarity ordering, same integer prefix length, same
    integer Jaccard. Assumes no posting list exceeds _PFX_SH_DOC_CAP at
    test scale (the Ray side truncates deterministically and logs)."""
    t = threshold_pct
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), s AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(1, len(ws)-2)),
    i -> array_to_string(list_slice(ws, i, i+2), ' '))) AS sh
  FROM d
), h AS (
  SELECT doc_id, len(sh) AS n,
         (md5_number_upper(unnest(sh)) % 2147483647)::BIGINT AS hsh
  FROM s
), df AS (
  SELECT hsh, count(*)::BIGINT AS df FROM h GROUP BY hsh
), rk AS (
  SELECT h.doc_id, h.hsh,
         row_number() OVER (PARTITION BY h.doc_id ORDER BY df.df, h.hsh) AS rn,
         h.n - ({t} * h.n + 99) // 100 + 1 AS pfx
  FROM h JOIN df USING (hsh)
), pfx AS (
  SELECT doc_id, hsh FROM rk WHERE rn <= pfx
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pfx a JOIN pfx b ON a.hsh = b.hsh AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
  100 * len(list_intersect(sa.sh, sb.sh)) //
  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard_pct
FROM cand c JOIN s sa ON c.doc_a = sa.doc_id JOIN s sb ON c.doc_b = sb.doc_id
WHERE len(list_intersect(sa.sh, sb.sh)) > 0
  AND 100 * len(list_intersect(sa.sh, sb.sh)) //
      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= {t}
"""


# --------------------------------------------------------------------------- #
# Gopher-style repetition signals, benchmark decontamination, and corpus-level
# duplicate-window counting — the quality-filter trio a training-data pipeline
# runs before anything expensive (Rae et al. 2021 repetition heuristics;
# Lee et al. 2021 substring-level dedup; Brown et al. 2020 test-set
# decontamination). All signals are integer-valued so DuckDB reproduces them
# bit-for-bit.


def _batch_ngrams(doc: np.ndarray, w: np.ndarray, n: int):
    """Vectorized n-gram extraction over an exploded (doc_id, token) batch:
    returns (gram_doc_ids, gram_strings) for every n-token window that does
    not cross a document boundary. One pandas string concat per offset —
    no per-row Python loop."""
    m = len(doc) - n + 1
    if m <= 0:
        return doc[:0], np.array([], dtype=object)
    ok = np.ones(m, dtype=bool)
    for j in range(1, n):
        ok &= doc[:m] == doc[j:m + j]
    s = pd.Series(w[:m], dtype=object)
    for j in range(1, n):
        s = s + " " + pd.Series(w[j:m + j], dtype=object)
    return doc[:m][ok], s.to_numpy()[ok]


def _explode_tokens(df: pd.DataFrame):
    ex = (
        df[["doc_id"]]
        .assign(w=df["text"].str.split(" "))
        .explode("w")
        .reset_index(drop=True)
    )
    return ex["doc_id"].to_numpy(dtype=np.int64), ex["w"].to_numpy()


def doc_rep_ngram_signals(sf_dir: str) -> ray.data.Dataset:
    """Per-document n-gram repetition signals (the Gopher quality-filter
    family): total 2-gram positions, occurrences of the most frequent
    2-gram, total 3-gram positions, and positions covered by repeated
    3-grams. A row is a whole document, so one pure ``map_batches`` pass
    is exact — no shuffle at all. Downstream filters threshold the
    ratios (e.g. top2_cnt/n_2grams > 0.2 → drop)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc, w = _explode_tokens(df)
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        d2, g2 = _batch_ngrams(doc, w, 2)
        c2 = (
            pd.DataFrame({"d": d2, "g": g2})
            .groupby(["d", "g"], sort=False).size().reset_index(name="c")
        )
        a2 = c2.groupby("d", sort=False)["c"].agg(["sum", "max"])
        d3, g3 = _batch_ngrams(doc, w, 3)
        c3 = (
            pd.DataFrame({"d": d3, "g": g3})
            .groupby(["d", "g"], sort=False).size().reset_index(name="c")
        )
        a3 = c3.groupby("d", sort=False)["c"].sum()
        a3dup = c3[c3["c"] > 1].groupby("d", sort=False)["c"].sum()
        ids = out["doc_id"]
        out["n_2grams"] = ids.map(a2["sum"]).fillna(0).astype("int64")
        out["top2_cnt"] = ids.map(a2["max"]).fillna(0).astype("int64")
        out["n_3grams"] = ids.map(a3).fillna(0).astype("int64")
        out["dup3_pos"] = ids.map(a3dup).fillna(0).astype("int64")
        return out

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


REP_NGRAM_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g2 AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
  FROM t, LATERAL unnest(generate_series(1, len(w)-1)) u(i)
), c2 AS (
  SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
), a2 AS (
  SELECT doc_id, sum(c)::BIGINT AS n_2grams, max(c)::BIGINT AS top2_cnt
  FROM c2 GROUP BY doc_id
), g3 AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM t, LATERAL unnest(generate_series(1, len(w)-2)) u(i)
), c3 AS (
  SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
), a3 AS (
  SELECT doc_id, sum(c)::BIGINT AS n_3grams,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup3_pos
  FROM c3 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a2.n_2grams, 0)::BIGINT AS n_2grams,
       coalesce(a2.top2_cnt, 0)::BIGINT AS top2_cnt,
       coalesce(a3.n_3grams, 0)::BIGINT AS n_3grams,
       coalesce(a3.dup3_pos, 0)::BIGINT AS dup3_pos
FROM documents d
LEFT JOIN a2 ON a2.doc_id = d.doc_id
LEFT JOIN a3 ON a3.doc_id = d.doc_id
"""


_DECON_MOD = 97  # doc_id % _DECON_MOD == 0 plays the held-out benchmark
_DECON_N = 5  # n-gram width for contamination matching


def doc_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Benchmark decontamination (GPT-3 appendix-C style): flag every
    training document containing any {_DECON_N}-gram that also appears in
    the held-out benchmark slice (here: doc_id % {_DECON_MOD} == 0 plays
    the benchmark). Scale shape: the benchmark is the SMALL side — its
    distinct n-grams are collected once (driver pull bounded by benchmark
    size, the same discipline as the entity dictionary and IVF centroids)
    and broadcast via ``ray.put``; the 100-TB training side streams through
    one pure membership ``map_batches`` (pandas ``isin`` against the
    broadcast set — C-speed, no shuffle, no join). Emits
    (doc_id, n_hits, contaminated) for every non-benchmark doc."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % _DECON_MOD == 0]
        if df.empty:
            return pd.DataFrame({"g": pd.Series([], dtype="object")})
        doc, w = _explode_tokens(df)
        _, g = _batch_ngrams(doc, w, _DECON_N)
        return pd.DataFrame({"g": pd.unique(g)})

    bench = docs.map_batches(bench_grams, batch_format="pandas").to_pandas()
    ref = ray.put(frozenset(bench["g"]))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(ref)
        df = df[df["doc_id"] % _DECON_MOD != 0]
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        doc, w = _explode_tokens(df)
        d, g = _batch_ngrams(doc, w, _DECON_N)
        hit = pd.Series(g).isin(bset).to_numpy()
        hits = pd.Series(d[hit]).value_counts()
        out["n_hits"] = out["doc_id"].map(hits).fillna(0).astype("int64")
        out["contaminated"] = (out["n_hits"] > 0).astype("int64")
        return out

    return docs.map_batches(scan, batch_format="pandas")


DECONTAMINATE_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, array_to_string(w[i:i+{_DECON_N - 1}], ' ') AS g5
  FROM t, LATERAL unnest(generate_series(1, len(w)-{_DECON_N - 1})) u(i)
), bench AS (
  SELECT DISTINCT g5 FROM g WHERE doc_id % {_DECON_MOD} = 0
), hits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_hits
  FROM g JOIN bench USING (g5)
  WHERE g.doc_id % {_DECON_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END::BIGINT
         AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {_DECON_MOD} <> 0
"""


_DUPSPAN_W = 8  # duplicate-substring window width (tokens)


def doc_dup_spans(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level duplicate-window counting (the discovery pass of
    Lee et al. substring dedup): an 8-token window position is *duplicated*
    iff its exact token sequence occurs ≥2 times anywhere in the corpus.
    Emits (doc_id, n_windows, n_dup_windows) per document.

    Scale shape — two salted co-partitioned exchanges, both bounded:
    1. per-batch (gram, doc, cnt) partials (a row is a whole doc, so cnt is
       exact), routed by salt(gram): each partition sums its grams' GLOBAL
       counts, keeps only grams with total ≥ 2, and re-emits each
       surviving (doc, cnt) routed by salt(doc) — duplicate mass only.
    2. per-doc window totals (kind 0) flow straight to salt(doc); the
       union is one vectorized per-partition merge. Gram STRINGS are the
       group keys (exact — no hash-collision risk); after exchange 1 only
       (doc, cnt) integers move. At 100 TB the exchange-1 payload can be
       shrunk 2-3× by keying on md5(gram) digests instead (collision-free
       grouping, same result — the doc_dedup_exact discipline); strings
       are kept here because they are what the SQL oracle groups on."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def win_partials(df: pd.DataFrame) -> pd.DataFrame:
        doc, w = _explode_tokens(df)
        d, g = _batch_ngrams(doc, w, _DUPSPAN_W)
        c = (
            pd.DataFrame({"doc_id": d, "g": g})
            .groupby(["doc_id", "g"], sort=False).size().reset_index(name="cnt")
        )
        return pd.DataFrame({
            "salt": pd.Series(_term_salt(c["g"]), dtype="int64"),
            "kind": pd.Series(np.ones(len(c), dtype=np.int8), dtype="int8"),
            "g": c["g"].astype(str),
            "doc_id": c["doc_id"].astype("int64"),
            "cnt": c["cnt"].astype("int64"),
        })

    def doc_totals(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        nw = (
            df["text"].str.count(" ").to_numpy(dtype=np.int64)
            + 1 - (_DUPSPAN_W - 1)
        )
        return pd.DataFrame({
            "salt": pd.Series(_key_salt(ids), dtype="int64"),
            "kind": pd.Series(np.zeros(len(df), dtype=np.int8), dtype="int8"),
            "g": pd.Series([""] * len(df), dtype="object"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "cnt": pd.Series(np.maximum(nw, 0), dtype="int64"),
        })

    def dup_mass(g: pd.DataFrame) -> pd.DataFrame:
        # all partials of a gram share this partition → exact global count
        if g.empty:
            return pd.DataFrame({
                "salt": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="int8"),
                "g": pd.Series([], dtype="object"),
                "doc_id": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
            })
        tot = g.groupby("g", sort=False)["cnt"].transform("sum")
        keep = g[tot.to_numpy() >= 2]
        ids = keep["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "salt": pd.Series(_key_salt(ids), dtype="int64"),
            "kind": pd.Series(np.ones(len(keep), dtype=np.int8), dtype="int8"),
            "g": pd.Series([""] * len(keep), dtype="object"),
            "doc_id": pd.Series(ids, dtype="int64"),
            "cnt": keep["cnt"].astype("int64").reset_index(drop=True),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["kind"] == 0]
        dup = g[g["kind"] == 1].groupby("doc_id", sort=False)["cnt"].sum()
        return pd.DataFrame({
            "doc_id": t["doc_id"].astype("int64").reset_index(drop=True),
            "n_windows": t["cnt"].astype("int64").reset_index(drop=True),
            "n_dup_windows": t["doc_id"].map(dup).fillna(0).astype("int64")
            .reset_index(drop=True),
        })

    row_schema = pa.schema(
        [("salt", pa.int64()), ("kind", pa.int8()), ("g", pa.string()),
         ("doc_id", pa.int64()), ("cnt", pa.int64())]
    )

    def restamp(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return row_schema.empty_table()
        return batch.select(row_schema.names).cast(row_schema)

    dup_stream = (
        docs.map_batches(win_partials, batch_format="pandas")
        .groupby("salt")
        .map_groups(dup_mass, batch_format="pandas")
        .map_batches(restamp, batch_format="pyarrow")
    )
    totals = docs.map_batches(doc_totals, batch_format="pandas").map_batches(
        restamp, batch_format="pyarrow"
    )
    return totals.union(dup_stream).groupby("salt").map_groups(
        merge, batch_format="pandas"
    )


DUP_SPANS_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, array_to_string(w[i:i+{_DUPSPAN_W - 1}], ' ') AS g8
  FROM t, LATERAL unnest(generate_series(1, len(w)-{_DUPSPAN_W - 1})) u(i)
), tot AS (
  SELECT g8, count(*) AS c FROM g GROUP BY g8
), dup AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_dup
  FROM g JOIN tot USING (g8) WHERE tot.c >= 2 GROUP BY g.doc_id
)
SELECT d.doc_id,
       greatest(len(string_split(d.text, ' ')) - {_DUPSPAN_W - 1}, 0)::BIGINT
         AS n_windows,
       coalesce(dup.n_dup, 0)::BIGINT AS n_dup_windows
FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
"""


_FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str) -> ray.data.Dataset:
    """Strict-order conversion funnel over the event stream: per user the
    earliest 'view', then the earliest 'click' strictly after it, then the
    earliest 'purchase' strictly after that; emits (step, step_name,
    n_users) for the three stages. One salted exchange co-locates each
    user's events; the per-partition interior is three vectorized
    groupby-min/merge passes; the final combine is 3·P partial rows."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def add_salt(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch.column("user_id"), dtype=np.int64)
        return batch.append_column("salt", pa.array(_key_salt(uid)))

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            g[g["event_type"] == _FUNNEL_STEPS[0]]
            .groupby("user_id", sort=False)["ts"].min().rename("t_prev")
        )
        counts = [len(t1)]
        prev = t1
        for step in _FUNNEL_STEPS[1:]:
            e = g[g["event_type"] == step].merge(
                prev, left_on="user_id", right_index=True, how="inner"
            )
            e = e[e["ts"] > e["t_prev"]]
            prev = e.groupby("user_id", sort=False)["ts"].min().rename("t_prev")
            counts.append(len(prev))
        return pd.DataFrame({
            "step": pd.Series([1, 2, 3], dtype="int64"),
            "step_name": pd.Series(list(_FUNNEL_STEPS), dtype="object"),
            "n_users": pd.Series(counts, dtype="int64"),
        })

    part = (
        ev.map_batches(add_salt, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(funnel_part, batch_format="pandas")
    )
    return part.groupby(["step", "step_name"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


FUNNEL_ORACLE_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1::BIGINT AS step, 'view' AS step_name, count(*)::BIGINT AS n_users FROM v
UNION ALL
SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM c
UNION ALL
SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM p
"""


# --------------------------------------------------------------------------- #
# fuzzy string matching: edit-distance-1 vocabulary pairs via FastSS
# deletion-index blocking — the entity-resolution / typo-clustering
# primitive (catalog normalization, surface-form conflation for the KG
# linker's NIL tail). The all-pairs levenshtein join is O(V²); the
# deletion index is O(V·L) keys and only same-key buckets ever meet.

def _ed1(a: str, b: str) -> bool:
    """Exact edit-distance==1 check (two-pointer; candidates already
    share a deletion key so lengths differ by ≤1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def part_spelling_variants(sf_dir: str) -> ray.data.Dataset:
    """Distinct part-name token pairs at edit distance exactly 1.

    Blocking: each vocabulary token emits |token|+1 deletion keys
    ({token} ∪ 1-deletions) — tokens at ED≤1 always share a key (FastSS),
    tokens sharing one are at ED≤2, so each bucket pair is verified with
    the exact two-pointer check. Keys route to salted partitions
    (pd.util.hash_pandas_object — deterministic across processes); the
    in-partition candidate join is one vectorized self-merge per key
    group. A pair can surface under several keys in several partitions,
    so a second salted pass dedups (tok_a, tok_b). Vocabulary extraction
    itself is the usual per-batch-unique → tiny-groupby pattern, so the
    per-token Python work is O(|vocab|·L), never O(corpus)."""
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def vocab_partials(batch: pa.Table) -> pa.Table:
        toks = pc.unique(pc.list_flatten(pc.split_pattern(batch.column("p_name"), " ")))
        return pa.Table.from_arrays([toks], names=["token"])

    vocab = (
        parts.map_batches(vocab_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["token"])
    )

    def deletion_keys(batch: pa.Table) -> pa.Table:
        keys, toks = [], []
        for t in batch.column("token").to_pylist():
            keys.append(t)
            toks.append(t)
            for i in range(len(t)):
                keys.append(t[:i] + t[i + 1:])
                toks.append(t)
        df = pd.DataFrame({"key": keys, "token": toks})
        h = pd.util.hash_pandas_object(df["key"], index=False).to_numpy()
        df["salt"] = (h % _JOIN_SALTS).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    pair_schema = pa.schema(
        [("tok_a", pa.string()), ("tok_b", pa.string()), ("salt2", pa.int64())]
    )
    out_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # return schema'd Arrow directly: empty object-dtype pandas blocks
        # both lose their schema and trip Ray's block-size estimator
        m = g.merge(g, on="key")
        m = m[m["token_x"] < m["token_y"]].drop_duplicates(["token_x", "token_y"])
        if not m.empty:
            keep = [_ed1(a, b) for a, b in zip(m["token_x"], m["token_y"])]
            m = m[np.asarray(keep, dtype=bool)]
        if m.empty:
            return pair_schema.empty_table()
        a, b = m["token_x"].astype(str), m["token_y"].astype(str)
        h = pd.util.hash_pandas_object(a + "\x00" + b, index=False).to_numpy()
        return pa.Table.from_arrays(
            [pa.array(a.to_numpy(dtype=object)), pa.array(b.to_numpy(dtype=object)),
             pa.array((h % _JOIN_SALTS).astype("int64"))],
            schema=pair_schema,
        )

    def distinct(g: pd.DataFrame) -> pa.Table:
        out = g.drop_duplicates(["tok_a", "tok_b"])
        return pa.Table.from_arrays(
            [pa.array(out["tok_a"].to_numpy(dtype=object)),
             pa.array(out["tok_b"].to_numpy(dtype=object))],
            schema=out_schema,
        )

    return (
        vocab.map_batches(deletion_keys, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("salt2")
        .map_groups(distinct, batch_format="pandas")
    )


SPELLING_VARIANTS_ORACLE_SQL = """
WITH v AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS tok FROM part
)
SELECT a.tok AS tok_a, b.tok AS tok_b
FROM v a, v b
WHERE a.tok < b.tok AND levenshtein(a.tok, b.tok) = 1
"""


# --------------------------------------------------------------------------- #
# per-user ROWS-window rolling aggregate — bounded-lookback window emulation
# at scale (the missing piece next to events_percent_rank's unbounded rank)

_ROLL_K = 3  # window = current row + (K-1) preceding rows per user


def events_user_rolling(sf_dir: str) -> ray.data.Dataset:
    """sum(cents)/count over the last 3 events per user (SQL ``ROWS BETWEEN
    2 PRECEDING AND CURRENT ROW`` ordered by (ts, event_id)) — NO per-user
    global sort: a user's history is split into day buckets processed in
    hash partitions (exactly events_sessions' skew strategy, a hot bot
    never pins a worker), the within-bucket window is two vectorized
    shifts, and only the first K-1 rows of each (user, bucket) cell —
    whose window reaches into the previous cell — go through a second
    bounded pass. That fix-up pass sees ≤ 2·(K-1) rows per cell (cell
    heads + cell tails) regardless of event volume, and the collected
    subsequence contains every head's true K-1 predecessors with nothing
    spurious between (heads of a cell are preceded in collection order by
    their own cell's earlier heads, then the previous cell's tails — the
    same rows that precede them in the full stream)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    k = _ROLL_K

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.divide(ts_us, _SESSION_BUCKET_US)
        salt = _user_hash_salt(np.asarray(batch.column("user_id")), np.asarray(bucket))
        return pa.Table.from_arrays(
            [batch.column("event_id"), batch.column("user_id"), batch.column("ts"),
             _cents(batch.column("value")), bucket, pa.array(salt)],
            names=["event_id", "user_id", "ts", "cents", "bucket", "salt"],
        )

    done_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("cents", pa.int64()), ("roll_sum_cents", pa.int64()),
         ("roll_n", pa.int64())]
    )
    fix_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("cents", pa.int64()),
         ("bucket", pa.int64()), ("is_head", pa.bool_()), ("salt2", pa.int64())]
    )

    def _roll(g: pd.DataFrame, cell_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized K-row rolling sum/count across every cell of the
        sorted frame; cells delimited by ``cell_cols``."""
        c = g["cents"].to_numpy(np.int64)
        pos = g.groupby(list(cell_cols), sort=False).cumcount().to_numpy()
        s = c.copy()
        n = np.ones(len(g), dtype=np.int64)
        for j in range(1, k):
            in_win = pos >= j
            s[j:] += np.where(in_win[j:], c[:-j], 0)
            n[j:] += in_win[j:].astype(np.int64)
        return s, n

    def bucket_roll(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "bucket", "ts", "event_id"]).reset_index(drop=True)
        s, n = _roll(g, ["user_id", "bucket"])
        pos = g.groupby(["user_id", "bucket"], sort=False).cumcount().to_numpy()
        size = g.groupby(["user_id", "bucket"], sort=False)["cents"].transform("size").to_numpy()
        head = pos < (k - 1)
        tail = pos >= size - (k - 1)
        done = g[~head]
        done_t = pa.Table.from_arrays(
            [pa.array(done["event_id"].to_numpy(np.int64)),
             pa.array(done["user_id"].to_numpy(np.int64)),
             pa.array(done["cents"].to_numpy(np.int64)),
             pa.array(s[~head]), pa.array(n[~head])],
            schema=done_schema,
        )
        fx = g[head | tail].copy()
        fx_mask = (head | tail)
        fx["is_head"] = head[fx_mask]
        salt2 = _user_hash_salt(fx["user_id"].to_numpy())
        fix_t = pa.Table.from_arrays(
            [pa.array(fx["event_id"].to_numpy(np.int64)),
             pa.array(fx["user_id"].to_numpy(np.int64)),
             pa.array(fx["ts"].to_numpy("datetime64[us]")),
             pa.array(fx["cents"].to_numpy(np.int64)),
             pa.array(fx["bucket"].to_numpy(np.int64)),
             pa.array(fx["is_head"].to_numpy(bool)), pa.array(salt2)],
            schema=fix_schema,
        )
        return done_t, fix_t

    # phase-1 output rides ONE kind-tagged union table (the graph-module
    # _ROW_SCHEMA pattern) so the grouped scan — the operator's dominant
    # shuffle+sort — runs exactly once; done/fix rows split downstream
    # with cheap vectorized block filters.
    tagged_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("cents", pa.int64()), ("roll_sum_cents", pa.int64()),
         ("roll_n", pa.int64()), ("ts", pa.timestamp("us")),
         ("bucket", pa.int64()), ("is_head", pa.bool_()),
         ("salt2", pa.int64()), ("kind", pa.int8())]
    )

    def _pad_to_tagged(t: pa.Table, kind: int) -> pa.Table:
        arrays = []
        for f in tagged_schema:
            if f.name == "kind":
                arrays.append(pa.array(np.full(t.num_rows, kind, dtype=np.int8)))
            elif f.name in t.schema.names:
                arrays.append(t.column(f.name))
            else:
                arrays.append(pa.nulls(t.num_rows, f.type))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    def bucket_roll_tagged(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return tagged_schema.empty_table()
        done_t, fix_t = bucket_roll(g)
        return pa.concat_tables([_pad_to_tagged(done_t, 0), _pad_to_tagged(fix_t, 1)])

    def take_done(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch.column("kind"), 0))
        return out.select(done_schema.names)

    def take_fix(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.equal(batch.column("kind"), 1))
        return out.select(fix_schema.names)

    def head_fix(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return done_schema.empty_table()
        g = g.sort_values(["user_id", "bucket", "ts", "event_id"]).reset_index(drop=True)
        s, n = _roll(g, ["user_id"])
        h = g["is_head"].to_numpy(bool)
        out = g[h]
        return pa.Table.from_arrays(
            [pa.array(out["event_id"].to_numpy(np.int64)),
             pa.array(out["user_id"].to_numpy(np.int64)),
             pa.array(out["cents"].to_numpy(np.int64)),
             pa.array(s[h]), pa.array(n[h])],
            schema=done_schema,
        )

    base = ev.map_batches(add_bucket, batch_format="pyarrow")
    # materialized so the two downstream branches re-read blocks instead
    # of re-running the shuffle (without it each branch re-executes the
    # whole grouped scan — Ray plans are per-consumer); the tagged table
    # is ~input-sized and object-store/spill-bounded.
    tagged = (
        base.groupby("salt")
        .map_groups(bucket_roll_tagged, batch_format="pandas")
        .materialize()
    )
    done_ds = tagged.map_batches(take_done, batch_format="pyarrow")
    fix_ds = (
        tagged.map_batches(take_fix, batch_format="pyarrow")
        .groupby("salt2").map_groups(head_fix, batch_format="pandas")
    )
    return done_ds.union(fix_ds)


ROLLING_ORACLE_SQL = """
SELECT event_id, user_id, cents,
  sum(cents) OVER w::BIGINT AS roll_sum_cents,
  count(*)  OVER w::BIGINT AS roll_n
FROM (SELECT event_id, user_id, ts,
             cast(round(value*100) AS BIGINT) AS cents FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------- #
# retention cohorts: first-touch day × day-offset distinct-user matrix

def events_retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """Classic cohort retention: users grouped by first-event day, counted
    on each later active day. Scale shape: per-batch distinct (user, day)
    partials bound every exchange by users × days (never event volume);
    the cohort assignment runs INSIDE user-hash partitions (a user's full
    day set co-locates, so first-day needs no second shuffle or broadcast
    of a per-user table), emitting per-partition (cohort_day, offset)
    partial counts into one tiny final groupby."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def day_partials(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.Table.from_arrays(
            [batch.column("user_id"), day], names=["user_id", "day"]
        )
        g = t.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        users = np.asarray(g.column("user_id"))
        return pa.Table.from_arrays(
            [g.column("user_id"), g.column("day"), pa.array(_user_hash_salt(users))],
            names=["user_id", "day", "salt"],
        )

    part_schema = pa.schema(
        [("cohort_day", pa.timestamp("us")), ("day_offset", pa.int64()),
         ("n_users", pa.int64())]
    )

    def cohort_counts(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return part_schema.empty_table()
        g = g.drop_duplicates(["user_id", "day"])
        day_us = g["day"].astype("datetime64[us]").astype("int64")
        first = day_us.groupby(g["user_id"], sort=False).transform("min")
        off = (day_us - first) // (24 * 3600 * 1_000_000)
        out = (
            pd.DataFrame({"cohort_us": first, "day_offset": off})
            .groupby(["cohort_us", "day_offset"], sort=False).size().reset_index(name="n_users")
        )
        return pa.Table.from_arrays(
            [pa.array(out["cohort_us"].to_numpy("datetime64[us]")),
             pa.array(out["day_offset"].to_numpy(np.int64)),
             pa.array(out["n_users"].to_numpy(np.int64))],
            schema=part_schema,
        )

    return (
        ev.map_batches(day_partials, batch_format="pyarrow")
        .groupby("salt").map_groups(cohort_counts, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


RETENTION_ORACLE_SQL = """
WITH a AS (SELECT DISTINCT user_id, date_trunc('day', ts)::TIMESTAMP AS d FROM events),
f AS (SELECT user_id, min(d) AS fd FROM a GROUP BY user_id)
SELECT f.fd AS cohort_day, date_diff('day', f.fd, a.d)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# grouped distinct-set aggregation (collect_set analogue, deterministic)

def events_user_type_set(sf_dir: str) -> ray.data.Dataset:
    """Per user: count + sorted '|'-join of DISTINCT event types. The
    collect_set-shaped aggregate: per-batch distinct pairs bound the
    shuffle by users × |type alphabet|, assembly runs inside user-hash
    partitions. Output is deterministic (sorted join) so it value-hashes."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pair_partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        users = np.asarray(g.column("user_id"))
        return pa.Table.from_arrays(
            [g.column("user_id"), g.column("event_type"),
             pa.array(_user_hash_salt(users))],
            names=["user_id", "event_type", "salt"],
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_types", pa.int64()), ("type_set", pa.string())]
    )

    def assemble(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return out_schema.empty_table()
        g = g.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"]
        )
        out = g.groupby("user_id", sort=False)["event_type"].agg(["size", "|".join])
        out.columns = ["n_types", "type_set"]
        out = out.reset_index()
        return pa.Table.from_arrays(
            [pa.array(out["user_id"].to_numpy(np.int64)),
             pa.array(out["n_types"].to_numpy(np.int64)),
             pa.array(out["type_set"].to_numpy(dtype=object))],
            schema=out_schema,
        )

    return (
        ev.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("salt").map_groups(assemble, batch_format="pandas")
    )


TYPE_SET_ORACLE_SQL = """
SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_types,
       string_agg(DISTINCT event_type, '|' ORDER BY event_type) AS type_set
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------- #
# sharded inverted-index build (search-engine posting lists)

_POSTING_SHARDS = 4


def doc_posting_lists(sf_dir: str) -> ray.data.Dataset:
    """Materialize a term → sorted-doc-id posting-list index, SHARDED by
    hash(doc) so a stopword's postings never concentrate on one reducer —
    the way web-scale indexes bound per-key list size (a term's global
    list is the shard-ordered concatenation). Per-batch distinct
    (term, doc) partials; assembly in (term, shard) hash partitions."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def term_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        idx = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        doc = pc.take(batch.column("doc_id"), idx)
        t = pa.Table.from_arrays([flat, doc], names=["token", "doc_id"])
        g = t.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        df = pd.DataFrame({
            "token": g.column("token").to_pylist(),
            "doc_id": np.asarray(g.column("doc_id"), dtype=np.int64),
        })
        df["shard"] = df["doc_id"] % _POSTING_SHARDS
        h = pd.util.hash_pandas_object(
            df["token"] + "\x00" + df["shard"].astype(str), index=False
        ).to_numpy()
        df["salt"] = (h % _JOIN_SALTS).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    out_schema = pa.schema(
        [("token", pa.string()), ("shard", pa.int64()), ("df", pa.int64()),
         ("postings", pa.string())]
    )

    def assemble(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return out_schema.empty_table()
        g = g.drop_duplicates(["token", "shard", "doc_id"]).sort_values(
            ["token", "shard", "doc_id"]
        )
        g["doc_str"] = g["doc_id"].astype(str)
        out = g.groupby(["token", "shard"], sort=False)["doc_str"].agg(
            ["size", "|".join]
        )
        out.columns = ["df", "postings"]
        out = out.reset_index()
        return pa.Table.from_arrays(
            [pa.array(out["token"].to_numpy(dtype=object)),
             pa.array(out["shard"].to_numpy(np.int64)),
             pa.array(out["df"].to_numpy(np.int64)),
             pa.array(out["postings"].to_numpy(dtype=object))],
            schema=out_schema,
        )

    return (
        docs.map_batches(term_doc, batch_format="pyarrow")
        .groupby("salt").map_groups(assemble, batch_format="pandas")
    )


POSTING_LISTS_ORACLE_SQL = f"""
WITH td AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, doc_id % {_POSTING_SHARDS} AS shard, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, '|' ORDER BY doc_id) AS postings
FROM td GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# product-quantization ANN — the compressed-scan scale path next to IVF

_PQ_M = 8        # subspaces (dim 64 -> 8 floats each)
_PQ_KSUB = 16    # codes per subspace -> 8 bytes/vector, 32x vs float64


def _pq_codebooks_distributed(
    emb: ray.data.Dataset, m: int = _PQ_M, ksub: int = _PQ_KSUB, iters: int = 3
) -> np.ndarray:
    """Distributed PQ codebook training: k-means in each of the ``m``
    subspaces, ALL subspaces in one streaming pass per iteration (partials
    keyed (subspace, cluster)); the driver pull per iteration is m·ksub
    rows — bounded by the codebook, never the data. Same deterministic
    float-sum discipline as _ivf_centroids_distributed (partials carry the
    batch's min vec_id; the combine sums in that order). Vectors are
    L2-normalized before splitting so codes approximate cosine via ADC."""
    head = emb.filter(expr=f"vec_id < {ksub}").to_pandas()
    X = np.stack(head.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    dsub = dim // m
    cb = X.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()  # [m, ksub, dsub]

    for _ in range(iters):
        ref = ray.put(cb)

        def partials(batch: pa.Table) -> pa.Table:
            cb = ray.get(ref)
            m, ksub, dsub = cb.shape
            M_ = np.stack(batch.column("embedding").to_pandas().to_numpy()).astype(np.float64)
            Mn = M_ / np.linalg.norm(M_, axis=1, keepdims=True)
            S = Mn.reshape(len(Mn), m, dsub)
            pk = int(np.asarray(batch.column("vec_id")).min())
            sub_l, cl_l, n_l, sum_l = [], [], [], []
            for mi in range(m):
                d2 = ((S[:, mi, None, :] - cb[mi][None, :, :]) ** 2).sum(-1)
                assign = d2.argmin(1)
                sums = np.zeros((ksub, dsub))
                np.add.at(sums, assign, S[:, mi, :])
                counts = np.bincount(assign, minlength=ksub).astype(np.int64)
                sub_l.extend([mi] * ksub)
                cl_l.extend(range(ksub))
                n_l.extend(counts.tolist())
                sum_l.extend(r.tolist() for r in sums)
            return pa.Table.from_arrays(
                [pa.array(sub_l, pa.int64()), pa.array(cl_l, pa.int64()),
                 pa.array(n_l, pa.int64()), pa.array(sum_l, pa.list_(pa.float64())),
                 pa.array([pk] * (m * ksub), pa.int64())],
                names=["sub", "cluster", "n", "vec_sum", "part_key"],
            )

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("part_key")
            s = np.sum(np.stack(g["vec_sum"].to_numpy()), axis=0)
            return pd.DataFrame({
                "sub": pd.Series([int(g["sub"].iloc[0])], dtype="int64"),
                "cluster": pd.Series([int(g["cluster"].iloc[0])], dtype="int64"),
                "n": pd.Series([int(g["n"].sum())], dtype="int64"),
                "vec_sum": pd.Series([s.tolist()], dtype="object"),
            })

        agg = (
            emb.map_batches(partials, batch_format="pyarrow")
            .groupby(["sub", "cluster"])
            .map_groups(combine, batch_format="pandas")
            .to_pandas()  # m*ksub rows — bounded
        )
        newcb = cb.copy()
        for _, row in agg.iterrows():
            if row["n"] > 0:
                newcb[int(row["sub"]), int(row["cluster"])] = (
                    np.asarray(row["vec_sum"], dtype=np.float64) / row["n"]
                )
        cb = newcb
    return cb


_PQ_RERANK = 128       # GLOBAL ADC shortlist size per query before exact rerank
                       # (128: measured recall ≥0.8 at sf0.001/0.01/0.1 — ADC
                       # with m=8, ksub=16 is weakly informative on the i.i.d.
                       # synthetic vectors, so the honest global shortlist
                       # needs more headroom than a clustered corpus would)
_ADC_SCALE = 1 << 24   # fixed-point grid for ADC lookup entries (int64 sums)


def materialize_pq_fixture(sf_dir: str, path: str):
    """Train the PQ codebooks once per (scale, code version) and pin BOTH
    halves of the ADC state to Parquet:

    - ``codebooks.parquet`` (sub, code, centroid) — the encode side;
    - ``adc_table.parquet`` (query_id, sub, code, t_fp) — the query-side
      lookup table, fixed-point ``floor(q_sub · codeword × 2^24)`` int64.

    ADC scores are integer sums of t_fp entries, so they are exactly
    order-independent and exactly reproducible in SQL (same-code vectors
    tie EXACTLY on both sides; ties break by vec_id). The fixture is the
    shared state of the emb_pq_topk hash oracle — the Ray query and
    pq_topk_oracle_sql() both run encode + ADC scan + exact rerank from
    it, independently."""
    import os

    import pyarrow.parquet as _pq

    if not os.path.exists(f"{path}/_SUCCESS"):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        cb = _pq_codebooks_distributed(emb)
        m, ksub, dsub = cb.shape
        qdf = emb.filter(expr=f"vec_id < {_ANN_N_QUERIES}").to_pandas().sort_values("vec_id")
        Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        qids = qdf["vec_id"].to_numpy()
        T = np.einsum("qmd,mkd->qmk", Qn.reshape(len(Qn), m, dsub), cb)
        Tq = np.floor(T * _ADC_SCALE).astype(np.int64)
        os.makedirs(path, exist_ok=True)
        subs = np.repeat(np.arange(m, dtype=np.int64), ksub)
        codes_col = np.tile(np.arange(ksub, dtype=np.int64), m)
        _pq.write_table(
            pa.Table.from_arrays(
                [pa.array(subs), pa.array(codes_col),
                 pa.array([r.tolist() for r in cb.reshape(m * ksub, dsub)],
                          pa.list_(pa.float64()))],
                names=["sub", "code", "centroid"],
            ),
            f"{path}/codebooks.parquet",
        )
        nq = len(qids)
        _pq.write_table(
            pa.Table.from_arrays(
                [pa.array(np.repeat(qids.astype(np.int64), m * ksub)),
                 pa.array(np.tile(subs, nq)), pa.array(np.tile(codes_col, nq)),
                 pa.array(Tq.reshape(nq * m * ksub))],
                names=["query_id", "sub", "code", "t_fp"],
            ),
            f"{path}/adc_table.parquet",
        )
        open(f"{path}/_SUCCESS", "w").close()
    cbt = _pq.read_table(f"{path}/codebooks.parquet").sort_by([("sub", "ascending"), ("code", "ascending")])
    cent = np.stack([np.asarray(r, dtype=np.float64) for r in cbt.column("centroid").to_pylist()])
    m = int(pc.max(cbt.column("sub")).as_py()) + 1
    ksub = int(pc.max(cbt.column("code")).as_py()) + 1
    cb = cent.reshape(m, ksub, cent.shape[1])
    at = _pq.read_table(f"{path}/adc_table.parquet").sort_by(
        [("query_id", "ascending"), ("sub", "ascending"), ("code", "ascending")]
    )
    qids = np.unique(np.asarray(at.column("query_id")))
    Tq = np.asarray(at.column("t_fp")).reshape(len(qids), m, ksub)
    return cb, qids, Tq


def emb_pq_topk(sf_dir: str, fixture_path: str | None = None) -> ray.data.Dataset:
    """PQ/ADC top-k with exact rerank: corpus vectors are encoded to _PQ_M
    uint8 codes; each query precomputes a (m × ksub) lookup table against
    the broadcast codebooks, and ADC-scoring a vector is m table lookups +
    an int64 sum — the scan touches 8 bytes per vector instead of 512,
    which is what makes a 100 TB embedding table scannable. Each batch
    emits its ADC-top-_PQ_RERANK candidates (with exact cosine computed
    for just those — at scale the rerank fetches full vectors by id; here
    they are in the batch already); the final per-query group cuts the
    GLOBAL ADC-top-_PQ_RERANK shortlist, then ranks it by exact cosine —
    so the result is a pure function of (embeddings, codebooks),
    independent of block/batch layout. Encode + scan fuse into ONE
    map_batches (codes never materialize); approximate (the true neighbor
    can miss the shortlist), recall-checked by emb_pq_recall and — with
    ``fixture_path`` (see materialize_pq_fixture) — hash-checked end to
    end by pq_topk_oracle_sql()."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # vec_id-sorted so Qn rows align with the fixture's query_id-sorted
    # ADC table (and with the non-fixture qids) by construction
    qdf = emb.filter(expr=f"vec_id < {_ANN_N_QUERIES}").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    if fixture_path is not None:
        cb, qids, Tq = materialize_pq_fixture(sf_dir, fixture_path)
    else:
        cb = _pq_codebooks_distributed(emb)
        m_, ksub_, dsub_ = cb.shape
        qids = qdf["vec_id"].to_numpy()
        T = np.einsum("qmd,mkd->qmk", Qn.reshape(len(Qn), m_, dsub_), cb)
        Tq = np.floor(T * _ADC_SCALE).astype(np.int64)
    ref = ray.put((qids, Qn, Tq, cb))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, Qn, Tq, cb = ray.get(ref)
        m, ksub, dsub = cb.shape
        vids = np.asarray(batch.column("vec_id"))
        keep = vids >= _ANN_N_QUERIES
        q_out, n_out, a_out, s_out = [], [], [], []
        if keep.any():
            M_ = np.stack(batch.column("embedding").to_pandas().to_numpy()[keep]).astype(np.float64)
            Mn = M_ / np.linalg.norm(M_, axis=1, keepdims=True)
            S = Mn.reshape(len(Mn), m, dsub)
            codes = np.empty((len(Mn), m), dtype=np.int64)
            for mi in range(m):
                d2 = ((S[:, mi, None, :] - cb[mi][None, :, :]) ** 2).sum(-1)
                codes[:, mi] = d2.argmin(1)
            vkeep = vids[keep]
            for qi in range(len(qids)):
                # int64 sum of m table lookups — exactly order-independent
                sims = np.zeros(len(Mn), dtype=np.int64)
                for mi in range(m):
                    sims += Tq[qi, mi, codes[:, mi]]
                r = min(_PQ_RERANK, len(vkeep))
                # (adc desc, vec_id asc): same total order as the final
                # combine and the SQL oracle -> per-batch cut loses only
                # rows the global shortlist cut would lose anyway
                short = np.lexsort((vkeep, -sims))[:r]
                exact = Qn[qi] @ Mn[short].T
                for j, e in zip(short, exact):
                    q_out.append(int(qids[qi]))
                    n_out.append(int(vkeep[j]))
                    a_out.append(int(sims[j]))
                    s_out.append(float(e))
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()),
             pa.array(a_out, pa.int64()), pa.array(s_out, pa.float64())],
            names=["query_id", "neighbor_id", "adc_fp", "sim"],
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_fp", "neighbor_id"], ascending=[False, True]).head(_PQ_RERANK)
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(_ANN_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {"query_id": g["query_id"], "rank": np.arange(1, len(g) + 1, dtype=np.int64),
             "neighbor_id": g["neighbor_id"]}
        )

    cand = emb.map_batches(partial_topk, batch_format="pyarrow")
    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def pq_topk_oracle_sql(fixture_path: str) -> str:
    """DIRECT value oracle for emb_pq_topk: encode (per-subspace argmin L2
    against the pinned codebooks; numpy argmin takes the FIRST min, so
    ties break code-ascending), integer ADC scan from the pinned lookup
    table, global top-_PQ_RERANK shortlist (adc desc, vec_id asc), exact
    cosine rerank — all re-derived in SQL."""
    m, dsub = _PQ_M, 64 // _PQ_M
    return f"""
WITH cb AS (
  SELECT sub, code, centroid FROM read_parquet('{fixture_path}/codebooks.parquet')
), adct AS (
  SELECT query_id, sub, code, t_fp FROM read_parquet('{fixture_path}/adc_table.parquet')
), norm AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x ->
           x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS e
  FROM embeddings WHERE vec_id >= {_ANN_N_QUERIES}
), code_rank AS (
  SELECT n.vec_id, c.sub, c.code,
         row_number() OVER (PARTITION BY n.vec_id, c.sub ORDER BY
           list_distance(list_slice(n.e, c.sub*{dsub}+1, c.sub*{dsub}+{dsub}),
                         c.centroid) ASC, c.code) AS rn
  FROM norm n, cb c
), vcodes AS (
  SELECT vec_id, sub, code FROM code_rank WHERE rn = 1
), adc AS (
  SELECT t.query_id, v.vec_id AS neighbor_id, sum(t.t_fp)::BIGINT AS adc_fp
  FROM vcodes v JOIN adct t ON t.sub = v.sub AND t.code = v.code
  GROUP BY t.query_id, v.vec_id
), short AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_fp DESC, neighbor_id) AS rn
  FROM adc
)
SELECT s.query_id,
       row_number() OVER (PARTITION BY s.query_id ORDER BY
         list_cosine_similarity(q.embedding, e.embedding) DESC, s.neighbor_id) AS rank,
       s.neighbor_id
FROM short s
JOIN embeddings q ON q.vec_id = s.query_id
JOIN embeddings e ON e.vec_id = s.neighbor_id
WHERE s.rn <= {_PQ_RERANK}
QUALIFY rank <= {_ANN_K}
"""


def emb_pq_recall(
    sf_dir: str, pq_path: str | None = None, fixture_path: str | None = None
) -> ray.data.Dataset:
    """Recall@k of the PQ/ADC path vs the exact top-k — same materialize-
    then-independent-SQL-baseline construction as emb_ann_ivf_recall."""
    pq_ds = emb_pq_topk(sf_dir, fixture_path=fixture_path)
    if pq_path is not None:
        import os
        import shutil

        if not os.path.exists(f"{pq_path}/_SUCCESS"):
            shutil.rmtree(pq_path, ignore_errors=True)
            pq_ds.write_parquet(pq_path)
            open(f"{pq_path}/_SUCCESS", "w").close()
        pq_ds = ray.data.read_parquet(pq_path, columns=["query_id", "rank", "neighbor_id"])

    def tag(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [pc.cast(batch.column("query_id"), pa.int64()),
                 pc.cast(batch.column("neighbor_id"), pa.int64()),
                 pa.array([src] * batch.num_rows, pa.int8())],
                names=["query_id", "neighbor_id", "src"],
            )

        return fn

    both = pq_ds.map_batches(tag(0), batch_format="pyarrow").union(
        emb_ann_topk(sf_dir).map_batches(tag(1), batch_format="pyarrow")
    )

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        a = set(g.loc[g["src"] == 0, "neighbor_id"])
        b = set(g.loc[g["src"] == 1, "neighbor_id"])
        return pd.DataFrame(
            {"query_id": [int(g["query_id"].iloc[0])],
             "n_hits": pd.Series([len(a & b)], dtype="int64"),
             "k": pd.Series([_ANN_K], dtype="int64")}
        )

    return both.groupby("query_id").map_groups(hits, batch_format="pandas")


def pq_recall_oracle_sql(pq_path: str) -> str:
    return f"""
WITH exact AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rnk
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {_ANN_N_QUERIES} AND c.vec_id >= {_ANN_N_QUERIES}
  QUALIFY rnk <= {_ANN_K}
), pq AS (
  SELECT query_id, neighbor_id FROM read_parquet('{pq_path}/*.parquet')
)
SELECT e.query_id, count(p.neighbor_id)::BIGINT AS n_hits, {_ANN_K}::BIGINT AS k
FROM exact e LEFT JOIN pq p
  ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
GROUP BY e.query_id
"""


# --------------------------------------------------------------------------- #
# BPE-style pair statistics — the tokenizer-training primitive (one merge
# round = argmax over these counts; the reference's vocab build is the
# same count-then-truncate shape, Corpus/CorpusBatch.cs:98-149)

_BPE_TOP_K = 50


def doc_bpe_pair_counts(sf_dir: str) -> ray.data.Dataset:
    """Corpus-weighted character-bigram counts (the statistic one BPE merge
    step maximizes), top-_BPE_TOP_K. Pair counts are additive over token
    OCCURRENCES, so each batch dedupes its tokens with one Arrow group_by
    and explodes bigrams only once per distinct token (vocab-bounded
    Python; counts ride along) — partial (pair, cnt) rows, one tiny final
    groupby, top-k sort on O(distinct pairs)."""
    docs = _docs(sf_dir, ["text"])

    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        g = pa.Table.from_arrays([toks], names=["tok"]).group_by(["tok"]).aggregate(
            [([], "count_all")]
        )
        pair_cnt: dict[str, int] = {}
        for tok, n in zip(g.column("tok").to_pylist(), g.column("count_all").to_pylist()):
            for i in range(len(tok) - 1):
                p = tok[i : i + 2]
                pair_cnt[p] = pair_cnt.get(p, 0) + n
        return pa.Table.from_arrays(
            [pa.array(list(pair_cnt.keys()), pa.string()),
             pa.array(list(pair_cnt.values()), pa.int64())],
            names=["pair", "cnt"],
        )

    out = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("pair").aggregate(Sum("cnt", alias_name="cnt"))
    )
    return out.sort(["cnt", "pair"], descending=[True, False]).limit(_BPE_TOP_K)


BPE_PAIR_ORACLE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT tok, count(*)::BIGINT AS n FROM toks WHERE length(tok) >= 2 GROUP BY tok
), pairs AS (
  SELECT substring(tok, i, 2) AS pair, sum(n)::BIGINT AS cnt
  FROM tf, unnest(generate_series(1, length(tok) - 1)) AS t(i)
  GROUP BY 1
)
SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair LIMIT {_BPE_TOP_K}
"""


# --------------------------------------------------------------------------- #
# order-independent table checksum — replica/migration validation at scale

_CHECKSUM_MOD = (1 << 61) - 1


def doc_table_checksum(sf_dir: str) -> ray.data.Dataset:
    """One-row (n_rows, checksum) fingerprint of the documents table:
    checksum = Σ md5_u64(doc_id ⊕ text) mod 2⁶¹−1. Addition is commutative
    so the result is independent of block order/partitioning — the
    cross-system validation primitive for a 100 TB copy (compare one row,
    not the data). Partials are one row per batch; the final fold is a
    single bounded task (modular sums commute with the per-row mod)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        s = 0
        for i, t in zip(ids, texts):
            s += _md5_u64(f"{i}\x00{t}")
        return pa.Table.from_arrays(
            [pa.array([batch.num_rows], pa.int64()),
             pa.array([s % _CHECKSUM_MOD], pa.int64())],
            names=["n_rows", "part_sum"],
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": pd.Series([int(g["n_rows"].sum())], dtype="int64"),
            "checksum": pd.Series(
                [int(g["part_sum"].astype(object).sum() % _CHECKSUM_MOD)], dtype="int64"
            ),
        })

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


TABLE_CHECKSUM_ORACLE_SQL = f"""
SELECT count(*)::BIGINT AS n_rows,
       (sum(md5_number_upper(doc_id::VARCHAR || chr(0) || text)::HUGEINT)
        % {_CHECKSUM_MOD})::BIGINT AS checksum
FROM documents
"""


# --------------------------------------------------------------------------- #
# last-writer-wins upsert merge — CDC / incremental-maintenance primitive

def orders_upsert_merge(sf_dir: str) -> ray.data.Dataset:
    """Apply a delta (updates for every o_orderkey % 7 == 0, synthesized
    deterministically from the same table — no external data) onto the
    base orders table, last-writer-wins by version. The merge is the
    engine's salted co-partitioned pattern: tag + union both sides, hash
    partition by key, one vectorized keep-max per partition. Never
    re-sorts the base table globally; delta size governs the work."""
    cols = ["o_orderkey", "o_orderstatus"]
    base = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def tag_base(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        return pa.Table.from_arrays(
            [batch.column("o_orderkey"), batch.column("o_orderstatus"),
             pa.array(np.ones(len(keys), dtype=np.int64)),
             pa.array(_key_salt(keys))],
            names=["o_orderkey", "o_orderstatus", "version", "salt"],
        )

    def tag_delta(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column("o_orderkey"), dtype=np.int64)
        sel = keys % 7 == 0
        keys = keys[sel]
        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(np.full(len(keys), "X", dtype=object)),
             pa.array(np.full(len(keys), 2, dtype=np.int64)),
             pa.array(_key_salt(keys))],
            names=["o_orderkey", "o_orderstatus", "version", "salt"],
        )

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_orderstatus", pa.string()),
         ("version", pa.int64())]
    )

    def lww(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return out_schema.empty_table()
        g = g.sort_values(["o_orderkey", "version"]).drop_duplicates(
            ["o_orderkey"], keep="last"
        )
        return pa.Table.from_arrays(
            [pa.array(g["o_orderkey"].to_numpy(np.int64)),
             pa.array(g["o_orderstatus"].to_numpy(dtype=object)),
             pa.array(g["version"].to_numpy(np.int64))],
            schema=out_schema,
        )

    both = base.map_batches(tag_base, batch_format="pyarrow").union(
        base.map_batches(tag_delta, batch_format="pyarrow")
    )
    return both.groupby("salt").map_groups(lww, batch_format="pandas")


UPSERT_ORACLE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, 1::BIGINT AS version FROM orders
), delta AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, 2::BIGINT AS version
  FROM orders WHERE o_orderkey % 7 = 0
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT o_orderkey, o_orderstatus, version FROM u
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
"""


# --------------------------------------------------------------------------- #
# per-user event-type transition counts (Markov matrix over sequences)

def events_type_transitions(sf_dir: str) -> ray.data.Dataset:
    """Count (prev_type → event_type) over each user's event sequence
    ordered by (ts, event_id) — the Markov-chain statistic for behavioral
    modeling. Same skew-safe shape as events_user_rolling: within-cell
    (user × day-bucket) pairs are one vectorized shift; ONLY each cell's
    first and last rows (2 per cell, volume-independent) enter a second
    pass that counts the cross-cell pairs — two collected rows are
    adjacent in the original stream iff they are consecutive in collected
    order, the earlier is its cell's last row and the later is another
    cell's first row (any intervening original row would have put its own
    cell's boundary rows between them)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.divide(ts_us, _SESSION_BUCKET_US)
        salt = _user_hash_salt(np.asarray(batch.column("user_id")), np.asarray(bucket))
        return pa.Table.from_arrays(
            [batch.column("event_id"), batch.column("user_id"), batch.column("ts"),
             batch.column("event_type"), bucket, pa.array(salt)],
            names=["event_id", "user_id", "ts", "event_type", "bucket", "salt"],
        )

    cnt_schema = pa.schema(
        [("prev_type", pa.string()), ("event_type", pa.string()), ("n", pa.int64())]
    )
    bnd_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("event_type", pa.string()), ("bucket", pa.int64()),
         ("is_first", pa.bool_()), ("is_last", pa.bool_()), ("salt2", pa.int64())]
    )

    def _sorted(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["user_id", "bucket", "ts", "event_id"]).reset_index(drop=True)

    def cell_pairs(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return cnt_schema.empty_table()
        g = _sorted(g)
        u, b = g["user_id"].to_numpy(), g["bucket"].to_numpy()
        et = g["event_type"].to_numpy(dtype=object)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = (u[1:] == u[:-1]) & (b[1:] == b[:-1])
        prev, nxt = et[:-1][same[1:]], et[1:][same[1:]]
        out = (
            pd.DataFrame({"prev_type": prev, "event_type": nxt})
            .groupby(["prev_type", "event_type"], sort=False).size().reset_index(name="n")
        )
        return pa.Table.from_arrays(
            [pa.array(out["prev_type"].to_numpy(dtype=object)),
             pa.array(out["event_type"].to_numpy(dtype=object)),
             pa.array(out["n"].to_numpy(np.int64))],
            schema=cnt_schema,
        )

    def cell_bounds(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return bnd_schema.empty_table()
        g = _sorted(g)
        pos = g.groupby(["user_id", "bucket"], sort=False).cumcount().to_numpy()
        size = g.groupby(["user_id", "bucket"], sort=False)["event_id"].transform("size").to_numpy()
        first, last = pos == 0, pos == size - 1
        sel = first | last
        out = g[sel]
        return pa.Table.from_arrays(
            [pa.array(out["event_id"].to_numpy(np.int64)),
             pa.array(out["user_id"].to_numpy(np.int64)),
             pa.array(out["ts"].to_numpy("datetime64[us]")),
             pa.array(out["event_type"].to_numpy(dtype=object)),
             pa.array(out["bucket"].to_numpy(np.int64)),
             pa.array(first[sel]), pa.array(last[sel]),
             pa.array(_user_hash_salt(out["user_id"].to_numpy()))],
            schema=bnd_schema,
        )

    def boundary_pairs(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return cnt_schema.empty_table()
        g = _sorted(g)
        u = g["user_id"].to_numpy()
        b = g["bucket"].to_numpy()
        et = g["event_type"].to_numpy(dtype=object)
        isf, isl = g["is_first"].to_numpy(bool), g["is_last"].to_numpy(bool)
        take = np.zeros(len(g) - 1, dtype=bool) if len(g) > 1 else np.zeros(0, dtype=bool)
        if len(g) > 1:
            take = (u[1:] == u[:-1]) & (b[1:] != b[:-1]) & isl[:-1] & isf[1:]
        prev, nxt = et[:-1][take], et[1:][take]
        if not len(prev):
            return cnt_schema.empty_table()
        out = (
            pd.DataFrame({"prev_type": prev, "event_type": nxt})
            .groupby(["prev_type", "event_type"], sort=False).size().reset_index(name="n")
        )
        return pa.Table.from_arrays(
            [pa.array(out["prev_type"].to_numpy(dtype=object)),
             pa.array(out["event_type"].to_numpy(dtype=object)),
             pa.array(out["n"].to_numpy(np.int64))],
            schema=cnt_schema,
        )

    base = ev.map_batches(add_bucket, batch_format="pyarrow")
    within = base.groupby("salt").map_groups(cell_pairs, batch_format="pandas")
    cross = (
        base.groupby("salt").map_groups(cell_bounds, batch_format="pandas")
        .groupby("salt2").map_groups(boundary_pairs, batch_format="pandas")
    )
    return (
        within.union(cross)
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


TYPE_TRANSITIONS_ORACLE_SQL = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""
