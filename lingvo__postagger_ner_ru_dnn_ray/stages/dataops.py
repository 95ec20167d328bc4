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

def doc_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Keep min(doc_id) per exact text duplicate group.
    Oracle: GROUP BY md5(text). The hash is only the shuffle key — grouping
    is identical for any collision-free hash, so values match the oracle."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
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
        # BPE-ish regex token count (words + isolated non-word chars)
        import re

        rx = re.compile(r"\w+|[^\w\s]")
        n_rx = pa.array(
            [len(rx.findall(t)) for t in batch.column("text").to_pylist()], pa.int64()
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
    """Script-ratio language heuristic: cyrillic vs latin letter counts."""
    import re

    cyr = re.compile(r"[а-яА-ЯёЁ]")
    lat = re.compile(r"[a-zA-Z]")

    def fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch.column("text").to_pylist():
            preds.append("ru" if len(cyr.findall(t)) > len(lat.findall(t)) else "en")
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(preds, pa.string())],
            names=["doc_id", "lang_pred"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


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

_MH_PERMS = 64
_MH_BANDS = 32  # 32 bands × 2 rows: P(candidate | j=0.5) ≈ 0.9997


def _minhash_sig(sh: frozenset, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not sh:
        return np.zeros(_MH_PERMS, dtype=np.uint64)
    hv = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
    # universal hashing: (a*x + b) mod p
    p = np.uint64((1 << 61) - 1)
    sig = ((a[:, None] * hv[None, :] + b[:, None]) % p).min(axis=1)
    return sig


def doc_minhash_pairs(sf_dir: str, verify_threshold_pct: int = 1) -> ray.data.Dataset:
    """MinHash(64) + LSH(32×2) candidate generation as a groupby on
    (band, bucket), then exact-Jaccard verification of candidates.
    Emits verified pairs (doc_a, doc_b, jaccard_pct)."""
    rng = np.random.RandomState(1234)
    A = rng.randint(1, (1 << 61) - 1, size=_MH_PERMS).astype(np.uint64)
    B = rng.randint(0, (1 << 61) - 1, size=_MH_PERMS).astype(np.uint64)
    rows_per_band = _MH_PERMS // _MH_BANDS

    def to_bands(batch: pa.Table) -> pa.Table:
        ids, bands, buckets = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            sig = _minhash_sig(_shingles(text), A, B)
            for band in range(_MH_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                ids.append(did)
                bands.append(band)
                buckets.append(zlib.crc32(chunk.tobytes()))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(bands, pa.int32()),
             pa.array(buckets, pa.int64())],
            names=["doc_id", "band", "bucket"],
        )

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one group PER BAND (32 total, not one per bucket): vectorized
        # collision detection inside the group avoids per-bucket Python
        # call overhead at scale
        g = group[group.duplicated("bucket", keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        a_out, b_out = [], []
        for _, ids in g.groupby("bucket")["doc_id"]:
            ids = sorted(set(ids.tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pd.DataFrame(
            {"doc_a": pd.Series(a_out, dtype="int64"), "doc_b": pd.Series(b_out, dtype="int64")}
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    bands = docs.map_batches(to_bands, batch_format="pyarrow")
    cand = bands.groupby(["band"]).map_groups(band_pairs, batch_format="pandas")
    # dedup candidate pairs across bands
    cand = cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))

    # verify with exact jaccard: broadcast shingle sets of candidate docs only
    # (candidates ≪ corpus); at true scale this would be a co-partitioned join
    docs_pd = docs.to_pandas()
    sets_ref = ray.put({int(r.doc_id): _shingles(r.text) for r in docs_pd.itertuples()})

    def verify(batch: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        a_out, b_out, j_out = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = (100 * inter) // (len(sa) + len(sb) - inter)
            if jac >= verify_threshold_pct:
                a_out.append(a)
                b_out.append(b)
                j_out.append(jac)
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64()),
             pa.array(j_out, pa.int64())],
            names=["doc_a", "doc_b", "jaccard_pct"],
        )

    return cand.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# SimHash fingerprints

def doc_simhash(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash over whitespace tokens (deterministic crc-based)."""

    def fn(batch: pa.Table) -> pa.Table:
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for text in batch.column("text").to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for w in text.split(" "):
                h = np.uint64((zlib.crc32(w.encode()) << 32) | zlib.crc32(w[::-1].encode()))
                bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                acc += np.where(bits == 1, 1, -1)
            val = 0
            for i in range(64):
                if acc[i] > 0:
                    val |= 1 << i
            out.append(val - (1 << 63))  # store as signed int64
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(out, pa.int64())],
            names=["doc_id", "simhash"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str, window: int = 4) -> ray.data.Dataset:
    """Winnowing document fingerprint: min rolling-hash per window; emits
    (doc_id, n_fingerprints, min_fp, max_fp) — deterministic ints."""

    def fn(batch: pa.Table) -> pa.Table:
        n_out, mn_out, mx_out = [], [], []
        for text in batch.column("text").to_pylist():
            hs = [zlib.crc32(" ".join(text.split(" ")[i : i + 3]).encode())
                  for i in range(max(1, len(text.split(" ")) - 2))]
            fps = set()
            for i in range(max(1, len(hs) - window + 1)):
                fps.add(min(hs[i : i + window]))
            n_out.append(len(fps))
            mn_out.append(min(fps))
            mx_out.append(max(fps))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(n_out, pa.int64()),
             pa.array(mn_out, pa.int64()), pa.array(mx_out, pa.int64())],
            names=["doc_id", "n_fp", "min_fp", "max_fp"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


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


def events_sessions(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization (30 min) per user: groupby(user).map_groups
    over the ts-sorted group — the Ray Data pattern for windowed streaming
    semantics (guide §streaming)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        ts_us = g["ts"].astype("int64")
        new_sess = (ts_us.diff().fillna(1 << 62) > _SESSION_GAP_US).cumsum()
        out = g.groupby(new_sess).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n_events=("ts", "count"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index(drop=True)

    return ev.groupby("user_id").map_groups(sessions, batch_format="pandas")


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
    """orders ⋈ customer ⋈ nation with both dimension sides broadcast
    (ray.put once, dict lookup per batch) — no shuffle join."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    c2n = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put((c2n, n2name))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        c2n, n2name = ray.get(ref)
        names = [n2name.get(c2n.get(c), "UNKNOWN") for c in batch.column("o_custkey").to_pylist()]
        t = pa.Table.from_arrays(
            [pa.array(names, pa.string()), _cents(batch.column("o_totalprice"))],
            names=["nation", "cents"],
        )
        g = t.group_by(["nation"]).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["nation", "sum_cents", "n_orders"])

    part = orders.map_batches(partials, batch_format="pyarrow")
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


def _ivf_centroids(sample: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations on a driver-side sample (k-means--).
    At 100 TB the sample is a bounded random_shuffle().limit() draw."""
    c = sample[:k].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = sample[m].mean(0)
    return c


def emb_ann_ivf(sf_dir: str) -> ray.data.Dataset:
    """IVF top-k: corpus vectors bucketed by nearest centroid; each query
    probes its _IVF_NPROBE nearest buckets only. Centroids + query matrix
    broadcast once; per-batch work is two numpy matmuls over the probed
    subset. Approximate (recall tested vs the brute-force baseline)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 256").to_pandas()
    sample = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = _ivf_centroids(sample, _IVF_CLUSTERS)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    qdf = emb.filter(expr=f"vec_id < {_ANN_N_QUERIES}").to_pandas()
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = qdf["vec_id"].to_numpy()
    # buckets each query probes
    probes = np.argsort(-(Qn @ cent.T), axis=1)[:, :_IVF_NPROBE]
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
                idx = np.argsort(-sims, kind="stable")[:k]
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


def doc_charlm_ppl(sf_dir: str) -> ray.data.Dataset:
    """Per-doc char-trigram LM score: mean -log2 P(c | prev 2 chars) with
    add-1 smoothing, reported in integer milli-bits (deterministic). The
    LM trains once on docs with doc_id < 100 and broadcasts via ray.put —
    at corpus scale the trainer is itself a distributed partial-count
    groupby (doc_token_freq pattern); here the training slice is bounded.
    High scores flag out-of-distribution (low-quality) documents."""
    import math

    train = (
        _docs(sf_dir, ["doc_id", "text"]).filter(expr=f"doc_id < {_LM_TRAIN_CAP}").to_pandas()
    )
    ctx, full = _charlm_counts(train["text"].tolist())
    vocab_size = len({g[-1] for g in full}) + 1
    ref = ray.put((ctx, full, vocab_size))

    def score(batch: pa.Table) -> pa.Table:
        ctx, full, V = ray.get(ref)
        out = []
        for t in batch.column("text").to_pylist():
            s = f"^^{t}$"
            total = 0.0
            n = 0
            for i in range(len(s) - _LM_N + 1):
                g = s[i : i + _LM_N]
                p = (full.get(g, 0) + 1) / (ctx.get(g[:-1], 0) + V)
                total += -math.log2(p)
                n += 1
            out.append(int(round(1000 * total / max(1, n))))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(out, pa.int64())],
            names=["doc_id", "ppl_millibits"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")
