"""Multimodal (image/audio/video) column plumbing — actor-pool decode /
feature-extract stages over opaque ``binary`` payload columns.

The Ray-side mechanics are real and tested: binary columns stay in Arrow
end-to-end (``batch_format="pyarrow"`` — binary round-trips poorly through
pandas), payloads are decoded in a CALLABLE-CLASS actor pool whose decoder
state loads once per actor, and batch sizes are kept small because each
row is payload-heavy (guide §memory).

All three codecs are real: payloads are valid 24-bit BI_RGB **BMP**
files, PCM16 mono **WAV** files, and **Y4M** (YUV4MPEG2, C420) video
streams, parsed header-first with no external libraries, so
width/height/sample/frame counts and the pixel/sample byte checksum are
value-checkable against a DuckDB oracle over the raw payload bytes
(``media_features_oracle_sql`` — the Y4M ASCII header is re-parsed in
SQL from hex pairs). Y4M is uncompressed; a production swap-in for
compressed containers changes only ``_decode_video``'s body — schema,
actor signature, batch sizing and output layout stay.
"""
from __future__ import annotations

import struct

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

_MEDIA_VERSION = 3  # payload format version — keys the /tmp cache


# --------------------------------------------------------------------------- #
# synthesis: real file formats, deterministic content


def _make_bmp(rng: np.random.RandomState) -> bytes:
    """Valid 24-bit uncompressed (BI_RGB) BMP, bottom-up rows padded to 4
    bytes — the layout every image tool accepts."""
    w = int(rng.randint(4, 24))
    h = int(rng.randint(4, 20))
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * h
    pixel_off = 54
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + img_size, 0, 0, pixel_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for _ in range(h):
        rows.append(rng.randint(0, 256, size=row_raw, dtype=np.int64).astype(np.uint8).tobytes())
        rows.append(b"\x00" * pad)
    return header + b"".join(rows)


def _make_wav(rng: np.random.RandomState) -> bytes:
    """Valid PCM16 mono WAV (44-byte canonical header + samples)."""
    n_samples = int(rng.randint(64, 2048))
    sample_rate = int(rng.choice([8000, 16000, 44100]))
    data_size = n_samples * 2
    samples = rng.randint(-2000, 2000, size=n_samples, dtype=np.int64).astype("<i2")
    header = (
        struct.pack("<4sI4s", b"RIFF", 36 + data_size, b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", data_size)
    )
    return header + samples.tobytes()


def _make_y4m(rng: np.random.RandomState) -> bytes:
    """Valid YUV4MPEG2 stream: ASCII header line, then FRAME-marked raw
    C420 planes (w·h luma + 2·(w/2·h/2) chroma per frame)."""
    w = 2 * int(rng.randint(2, 10))
    h = 2 * int(rng.randint(2, 8))
    n_frames = int(rng.randint(1, 5))
    fps = int(rng.choice([24, 25, 30]))
    fsize = w * h + 2 * ((w // 2) * (h // 2))
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode("ascii")]
    for _ in range(n_frames):
        out.append(b"FRAME\n")
        out.append(rng.randint(0, 256, size=fsize, dtype=np.int64).astype(np.uint8).tobytes())
    return b"".join(out)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: REAL BMP images, PCM WAV audio and
    Y4M video streams."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    ids, ts, payloads, metas = [], [], [], []
    for i in range(n):
        t = types[i % 3]
        if t == "image":
            payloads.append(_make_bmp(rng))
        elif t == "audio":
            payloads.append(_make_wav(rng))
        else:
            payloads.append(_make_y4m(rng))
        ids.append(i)
        ts.append(t)
        metas.append(f'{{"codec":"{"bmp" if t == "image" else "wav" if t == "audio" else "y4m"}","idx":{i}}}')
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(ts, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(metas, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


# --------------------------------------------------------------------------- #
# decode


class MediaDecoder:
    """Codec+feature actor: real BMP / WAV / Y4M header+content parsing
    (pure numpy — no media libraries needed). A pure, deterministic
    function of the payload bytes.

    Per type it emits (width, height, n_frames, byte_sum, features):
      image  — BMP width / height, n_frames = 1; byte_sum over the pixel
               region (header's pixel-array offset to EOF); features =
               per-channel means.
      audio  — width = n_samples, height = sample_rate, n_frames = 0;
               byte_sum over the PCM data (byte 44..EOF); features =
               sample mean/std.
      video  — Y4M width / height / frame count from the ASCII stream
               header + FRAME layout; byte_sum over everything after the
               header line; features = first-frame luma mean/std.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def _decode_image(self, p: bytes):
        if len(p) < 54 or p[:2] != b"BM":
            raise ValueError("not a BMP payload")
        pixel_off = struct.unpack_from("<I", p, 10)[0]
        w = struct.unpack_from("<i", p, 18)[0]
        h = struct.unpack_from("<i", p, 22)[0]
        bpp = struct.unpack_from("<H", p, 28)[0]
        comp = struct.unpack_from("<I", p, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError("only 24-bit BI_RGB supported")
        data = np.frombuffer(p, dtype=np.uint8, offset=pixel_off)
        byte_sum = int(data.sum(dtype=np.int64))
        row_raw = w * 3
        stride = row_raw + (4 - row_raw % 4) % 4
        rows = data[: stride * abs(h)].reshape(abs(h), stride)[:, :row_raw]
        px = rows.reshape(-1, 3).astype(np.float64)
        feat = np.zeros(self.feature_dim, dtype=np.float32)
        feat[:3] = (px.mean(axis=0) / 255.0) if len(px) else 0.0
        feat[3] = w / 1024.0
        feat[4] = abs(h) / 1024.0
        return w, abs(h), 1, byte_sum, feat

    def _decode_audio(self, p: bytes):
        if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        channels = struct.unpack_from("<H", p, 22)[0]
        sample_rate = struct.unpack_from("<I", p, 24)[0]
        bits = struct.unpack_from("<H", p, 34)[0]
        data_size = struct.unpack_from("<I", p, 40)[0]
        if channels != 1 or bits != 16:
            raise ValueError("only PCM16 mono supported")
        n_samples = data_size // 2
        data = np.frombuffer(p, dtype=np.uint8, offset=44)
        byte_sum = int(data.sum(dtype=np.int64))
        samples = np.frombuffer(p, dtype="<i2", offset=44, count=n_samples).astype(np.float64)
        feat = np.zeros(self.feature_dim, dtype=np.float32)
        if len(samples):
            feat[0] = samples.mean() / 32768.0
            feat[1] = samples.std() / 32768.0
        feat[2] = sample_rate / 48000.0
        return n_samples, sample_rate, 0, byte_sum, feat

    def _decode_video(self, p: bytes):
        nl = p.find(b"\n")
        if nl < 0 or not p.startswith(b"YUV4MPEG2"):
            raise ValueError("not a Y4M payload")
        w = h = None
        for tok in p[:nl].decode("ascii").split(" ")[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        fsize = w * h + 2 * ((w // 2) * (h // 2))
        body = len(p) - nl - 1
        if body % (6 + fsize):
            raise ValueError("truncated Y4M frame")
        n_frames = body // (6 + fsize)
        data = np.frombuffer(p, dtype=np.uint8, offset=nl + 1)
        for fi in range(n_frames):
            off = fi * (6 + fsize)
            if bytes(data[off : off + 6]) != b"FRAME\n":
                raise ValueError("bad FRAME marker")
        byte_sum = int(data.sum(dtype=np.int64))
        feat = np.zeros(self.feature_dim, dtype=np.float32)
        if n_frames:
            luma = data[6 : 6 + w * h].astype(np.float64)
            feat[0] = luma.mean() / 255.0
            feat[1] = luma.std() / 255.0
        feat[2] = w / 1024.0
        feat[3] = h / 1024.0
        feat[4] = n_frames / 64.0
        return w, h, n_frames, byte_sum, feat

    def _decode(self, payload: bytes, media_type: str):
        if media_type == "image":
            return self._decode_image(payload)
        if media_type == "audio":
            return self._decode_audio(payload)
        return self._decode_video(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        w_out, h_out, nf_out, n_bytes, sums, feats = [], [], [], [], [], []
        for t, p in zip(types, payloads):
            w, h, nf, s, f = self._decode(p, t)
            w_out.append(w)
            h_out.append(h)
            nf_out.append(nf)
            n_bytes.append(len(p))
            sums.append(s)
            feats.append(f)
        return pa.Table.from_arrays(
            [
                ids,
                pa.array(types, pa.string()),
                pa.array(n_bytes, pa.int64()),
                pa.array(w_out, pa.int32()),
                pa.array(h_out, pa.int32()),
                pa.array(nf_out, pa.int64()),
                pa.array(sums, pa.int64()),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ],
            names=["media_id", "media_type", "n_bytes", "width", "height",
                   "n_frames", "byte_sum", "features"],
        )


# backwards-compat alias (round-2 name)
DecoderStub = MediaDecoder


def decode_media(ds: ray.data.Dataset, *, concurrency: int | tuple[int, int] = 2,
                 batch_size: int = 64) -> ray.data.Dataset:
    """Actor-pool decode: small batches (payload-heavy rows), Arrow
    batch format (binary-safe), decoder loaded once per actor."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def ensure_media_parquet(sf_dir: str, base: str = "/tmp/graft_data") -> str:
    """Materialize the deterministic media table once per (scale, payload
    version) so the Ray pipeline and the SQL oracle read the identical
    binary payloads."""
    import os

    from ..sources.transcripts import sf_of_dir

    n = max(60, int(6_000 * sf_of_dir(sf_dir)))
    path = f"{base}/media_v{_MEDIA_VERSION}_n{n}.parquet"
    if not os.path.exists(path):
        import uuid

        import pyarrow.parquet as pq

        os.makedirs(base, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        pq.write_table(synth_media_table(n), tmp)
        os.replace(tmp, path)
    return path


def media_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-type payload statistics straight off the binary column —
    partial Arrow aggregation (count/sum/min/max of octet length) per
    batch, tiny final groupby. Exercises the binary-column path end to
    end with a value-checkable SQL oracle (octet_length)."""
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
    """Query entry: the decode actor pool over the materialized media
    table. Width/height/byte_sum come from real BMP/WAV header parsing,
    reproduced independently by ``media_features_oracle_sql`` over the
    raw payload bytes (the embedding vector is dropped here — floats
    don't hash-compare; its determinism is pinned by pytest)."""
    ds = ray.data.read_parquet(ensure_media_parquet(sf_dir))
    return decode_media(ds).drop_columns(["features"])


def _le32(hex_col: str, off: int) -> str:
    """SQL: little-endian uint32 read from 0-based byte offset ``off`` of
    a hex(payload) string column."""
    b = [f"substr({hex_col}, {2 * (off + k) + 1}, 2)" for k in range(4)]
    return f"('0x' || {b[3]} || {b[2]} || {b[1]} || {b[0]})::BIGINT"


def media_features_oracle_sql(path: str) -> str:
    """DuckDB oracle for media_features, computed purely from the payload
    bytes: BMP width/height and pixel-array offset are little-endian u32
    reads at the documented header offsets (10/18/22); WAV n_samples and
    sample_rate likewise (data size at 40, rate at 24, data at 44); the
    Y4M ASCII header line is re-assembled from hex pairs and regex-parsed
    for W/H, frame count follows from the FRAME+plane layout; the byte
    checksum re-sums every payload byte from the data offset via hex-pair
    arithmetic."""
    return f"""
WITH m AS (
  SELECT media_id, media_type, hex(payload) AS h,
         octet_length(payload)::BIGINT AS n_bytes
  FROM read_parquet('{path}')
), vh AS (
  SELECT media_id, h, n_bytes,
         list_filter(range(0, n_bytes), i -> substr(h, 2*i+1, 2) = '0A')[1]
           AS nl
  FROM m WHERE media_type = 'video'
), vp AS (
  SELECT media_id, nl,
    regexp_extract(hdr, 'W([0-9]+)', 1)::INT AS vw,
    regexp_extract(hdr, 'H([0-9]+)', 1)::INT AS vh
  FROM (
    SELECT media_id, nl,
      list_aggregate(list_transform(range(0, nl),
        i -> chr(('0x' || substr(h, 2*i+1, 2))::INT)), 'string_agg', '')
        AS hdr
    FROM vh
  )
), parsed AS (
  SELECT m.media_id, m.media_type, m.n_bytes,
    CASE m.media_type
      WHEN 'image' THEN {_le32('m.h', 18)}
      WHEN 'audio' THEN {_le32('m.h', 40)} // 2
      ELSE vp.vw END::INTEGER AS width,
    CASE m.media_type
      WHEN 'image' THEN {_le32('m.h', 22)}
      WHEN 'audio' THEN {_le32('m.h', 24)}
      ELSE vp.vh END::INTEGER AS height,
    CASE m.media_type
      WHEN 'image' THEN 1
      WHEN 'audio' THEN 0
      ELSE (m.n_bytes - vp.nl - 1) // (6 + (vp.vw * vp.vh * 3) // 2)
      END::BIGINT AS n_frames,
    CASE m.media_type
      WHEN 'image' THEN {_le32('m.h', 10)}
      WHEN 'audio' THEN 44
      ELSE vp.nl + 1 END::BIGINT AS data_off,
    m.h
  FROM m LEFT JOIN vp USING (media_id)
)
SELECT media_id, media_type, n_bytes, width, height, n_frames,
  list_sum(list_transform(range(data_off, n_bytes),
           i -> ('0x' || substr(h, 2*i + 1, 2))::INT))::BIGINT AS byte_sum
FROM parsed
"""
