"""Multimodal (image/audio/video) column plumbing — actor-pool decode /
feature-extract stages over opaque ``binary`` payload columns.

The Ray-side mechanics are real and tested: binary columns stay in Arrow
end-to-end (``batch_format="pyarrow"`` — binary round-trips poorly through
pandas), payloads are decoded in a CALLABLE-CLASS actor pool whose decoder
state loads once per actor, and batch sizes are kept small because each
row is payload-heavy (guide §memory). The codec itself is STUBBED: the
image/audio libraries are not in this container, so ``DecoderStub``
derives deterministic pseudo-features from the payload bytes; swap
``_decode`` for PIL/torchaudio in production — the schema, actor
signature, batch sizing and output layout do not change.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON-ish sidecar metadata
    ]
)

FEATURE_DIM = 16


class DecoderStub:
    """Stands in for a real codec+model actor (e.g. PIL decode + CNN
    embed). Deterministic pure function of the payload bytes."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        try:  # the real path, absent in this container
            import PIL.Image  # noqa: F401

            self.real_codec = True
        except ImportError:
            self.real_codec = False

    def _decode(self, payload: bytes, media_type: str) -> tuple[int, int, np.ndarray]:
        if self.real_codec and media_type == "image":  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL + a model")
        h = zlib.crc32(payload)
        width = 16 + h % 1024
        height = 16 + (h >> 10) % 1024
        rng = np.random.RandomState(h % (2**31))
        feat = rng.rand(self.feature_dim).astype(np.float32)
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        w_out, h_out, n_bytes, feats = [], [], [], []
        for t, p in zip(types, payloads):
            w, h, f = self._decode(p, t)
            w_out.append(w)
            h_out.append(h)
            n_bytes.append(len(p))
            feats.append(f)
        return pa.Table.from_arrays(
            [
                ids,
                pa.array(types, pa.string()),
                pa.array(n_bytes, pa.int64()),
                pa.array(w_out, pa.int32()),
                pa.array(h_out, pa.int32()),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ],
            names=["media_id", "media_type", "n_bytes", "width", "height", "features"],
        )


def decode_media(ds: ray.data.Dataset, *, concurrency: int | tuple[int, int] = 2,
                 batch_size: int = 64) -> ray.data.Dataset:
    """Actor-pool decode: small batches (payload-heavy rows), Arrow
    batch format (binary-safe), decoder loaded once per actor."""
    return ds.map_batches(
        DecoderStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: binary payloads of varying size."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    ids, ts, payloads, metas = [], [], [], []
    for i in range(n):
        t = types[i % 3]
        size = 256 + int(rng.randint(0, 4096))
        payloads.append(rng.bytes(size))
        ids.append(i)
        ts.append(t)
        metas.append(f'{{"codec":"stub","idx":{i}}}')
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(ts, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def ensure_media_parquet(sf_dir: str, base: str = "/tmp/graft_data") -> str:
    """Materialize the deterministic media table once per scale so the
    Ray pipeline and the SQL oracle read the identical binary payloads."""
    import os

    from ..sources.transcripts import sf_of_dir

    n = max(60, int(6_000 * sf_of_dir(sf_dir)))
    path = f"{base}/media_n{n}.parquet"
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        os.makedirs(base, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(synth_media_table(n), tmp)
        os.replace(tmp, path)
    return path


def media_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-type payload statistics straight off the binary column —
    partial Arrow aggregation (count/sum/min/max of octet length) per
    batch, tiny final groupby. Exercises the binary-column path end to
    end with a value-checkable SQL oracle (octet_length), unlike the
    stub-codec features which are rows-only by design."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    path = ensure_media_parquet(sf_dir)
    ds = ray.data.read_parquet(path, columns=["media_type", "payload"])

    def partials(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [batch.column("media_type"),
             pc.cast(pc.binary_length(batch.column("payload")), pa.int64())],
            names=["media_type", "n_bytes"],
        )
        g = t.group_by(["media_type"]).aggregate(
            [([], "count_all"), ("n_bytes", "sum"), ("n_bytes", "min"), ("n_bytes", "max")]
        )
        return g.rename_columns(
            ["media_type", "n_items", "sum_bytes", "min_bytes", "max_bytes"]
        )

    part = ds.map_batches(partials, batch_format="pyarrow")
    return part.groupby("media_type").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("sum_bytes", alias_name="sum_bytes"),
        Min("min_bytes", alias_name="min_bytes"),
        Max("max_bytes", alias_name="max_bytes"),
    )


def media_stats_oracle_sql(path: str) -> str:
    return (
        "SELECT media_type, count(*)::BIGINT AS n_items, "
        "sum(octet_length(payload))::BIGINT AS sum_bytes, "
        "min(octet_length(payload))::BIGINT AS min_bytes, "
        "max(octet_length(payload))::BIGINT AS max_bytes "
        f"FROM read_parquet('{path}') GROUP BY media_type"
    )


def media_features(sf_dir: str) -> ray.data.Dataset:
    """Query entry: synthesize a deterministic media table scaled like the
    driver tables and run the decode actor pool over it (rows-only check:
    the stub codec has no SQL equivalent)."""
    from ..sources.transcripts import sf_of_dir

    n = max(60, int(6_000 * sf_of_dir(sf_dir)))
    ds = ray.data.from_arrow(synth_media_table(n))
    return decode_media(ds).drop_columns(["features"])
