"""Batch JSON boundary (sources/jsonio.py): the bulk replay of the
reference's web request/response surface must produce, for the bundled
reference input lines, exactly the sentence/token/label structure pinned
in fixtures/reference_input_labels.json (the "simple" sentence-split
path — the shape the web UI renders, VM.cs:10-62)."""
import json
from pathlib import Path

import pytest

FIXTURE = json.load(
    (Path(__file__).resolve().parents[1] / "fixtures" / "reference_input_labels.json")
    .open(encoding="utf-8")
)
_REF_INPUT = Path("/root/reference/[resources]/input-text/input_pos_tagger_ru.txt")
INPUT_LINES = (
    [l for l in _REF_INPUT.read_text(encoding="utf-8-sig").splitlines() if l.strip()]
    if _REF_INPUT.exists()
    else None
)


def _write_requests(tmp_path, lines):
    p = tmp_path / "reqs.jsonl"
    with p.open("w", encoding="utf-8") as f:
        for i, text in enumerate(lines):
            f.write(json.dumps({"id": f"line-{i}", "text": text}, ensure_ascii=False) + "\n")
    return str(p)


def _read_records(out_dir):
    recs = {}
    for part in Path(out_dir).glob("*.json"):
        with part.open(encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    recs[r["id"]] = r["sents"]
    return recs


@pytest.mark.parametrize("model_type", ["pos", "ner"])
def test_webjson_matches_pinned_labels(ray_session, tmp_path, model_type):
    from lingvo__postagger_ner_ru_dnn_ray.sources.jsonio import run_webjson_job
    from lingvo__postagger_ner_ru_dnn_ray.textkit import resources  # noqa: F401

    lines = INPUT_LINES
    if lines is None:
        pytest.skip("reference input lines fixture absent")
    in_path = _write_requests(tmp_path, lines)
    out_dir = str(tmp_path / f"out_{model_type}")
    run_webjson_job(in_path, out_dir, model_type=model_type, concurrency=1)
    recs = _read_records(out_dir)
    assert len(recs) == len(lines)
    for entry in FIXTURE:
        got = recs[f"line-{entry['line_idx']}"]
        want = entry["simple"]
        assert len(got) == len(want), f"line {entry['line_idx']}: sentence count"
        for gs, ws in zip(got, want):
            assert [t["word"] for t in gs["tuples"]] == ws["tokens"]
            assert [t["label"] for t in gs["tuples"]] == ws[model_type]


def test_webjson_empty_text_and_content_ids(ray_session, tmp_path):
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.sources.jsonio import (
        read_json_requests,
        tag_requests,
    )

    p = tmp_path / "reqs.jsonl"
    with p.open("w", encoding="utf-8") as f:
        f.write(json.dumps({"text": ""}) + "\n")
        f.write(json.dumps({"text": "Он приехал в Петербурге."}, ensure_ascii=False) + "\n")
        # duplicate content, no id -> collapses to the same response key
        f.write(json.dumps({"text": "Он приехал в Петербурге."}, ensure_ascii=False) + "\n")

    reqs = read_json_requests(str(p)).repartition(1)
    out = tag_requests(reqs, model_type="ner", concurrency=1).to_pandas()
    # 3 requests, 2 distinct contents -> 2 records (duplicate collapsed)
    assert len(out) == 2
    by_id = {r["id"]: json.loads(r["sents_json"]) for _, r in out.iterrows()}
    empties = [s for s in by_id.values() if s == []]
    assert len(empties) == 1  # empty text -> sents: []
    tagged = [s for s in by_id.values() if s]
    assert len(tagged) == 1
    words = [t["word"] for t in tagged[0][0]["tuples"]]
    assert words[0] == "Он" and words[-1] == "."
    labels = [t["label"] for t in tagged[0][0]["tuples"]]
    assert labels[words.index("Петербурге")] == "B-LOC"


def test_webjson_driver_query_matches_single_process_oracle(ray_session, monkeypatch):
    """The web_json_tagged driver query (JSONL ingest -> WebJsonStage actor
    pool, materialized) must equal ONE single-process WebJsonStage call over
    the same request table — the F5 invariant extended to the JSON boundary."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.001"  # 600 requests
    # isolated cache dirs so the test never reuses / pollutes the gate's
    for p in e._webjson_paths(sf_dir):
        shutil.rmtree(p, ignore_errors=True)
        Path(p).unlink(missing_ok=True)
    try:
        ray_df = (
            ray.data.read_parquet(e._ensure_webjson_ray(sf_dir))
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        orc_df = (
            pq.read_table(e._ensure_webjson_oracle(sf_dir))
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert len(ray_df) == 600
        assert list(ray_df.columns) == list(orc_df.columns) == ["id", "sents_json"]
        assert ray_df.equals(orc_df)
    finally:
        for p in e._webjson_paths(sf_dir):
            shutil.rmtree(p, ignore_errors=True)
            Path(p).unlink(missing_ok=True)
