"""Batch JSON boundary — the bulk analogue of the reference's web-service
request/response surface (PosTaggerController.cs:33-60 routes POST
``{text, modelType}`` through the shared predictor pool; Models/VM.cs:10-62
shapes the reply as ``{sents: [{tuples: [{word, label}, ...]}, ...]}``),
re-expressed Ray-Data-first: JSONL request records in, one tagged JSON
record per request out, with the tagging done by the same tokenizer +
TaggerStage actor pool the rest of the engine uses.

Request  (one JSON object per line): ``{"text": "...", "id": "..."?}``
Response (one JSON object per line): ``{"id": ..., "sents": [...]}`` in the
VM shape above, sentences in document order, one tuple per token.

Design notes (scale):
- The whole request → response path is ONE ``map_batches`` over an actor
  pool (models load once per actor in ``__init__``): a request's text is a
  single input row, so every sentence it produces exists inside the same
  batch and assembly is batch-local — no groupby/shuffle anywhere, the
  pipeline streams.
- Requests are keyed by ``id`` when present, else by an md5 content
  fingerprint; duplicate keys inside a batch collapse to one response
  (idempotent, cache-like semantics — the natural contract for a batch
  boundary re-playing web traffic).
- ``model_type`` mirrors the request's ``modelType`` → ModelInfos routing
  (WebService Program.cs:36-74): ``"pos"`` labels tuples with the corrected
  PosTaggerOutputType names, ``"ner"`` with the BIO tags.
"""
from __future__ import annotations

import hashlib
import json

import pyarrow as pa
import ray.data

_MODEL_TYPES = ("pos", "ner")


def read_json_requests(path: str) -> ray.data.Dataset:
    """JSONL request records → transcript-shaped rows (conv_id, turn_idx,
    role, text) ready for the engine's tokenize/tag stages. ``id`` is
    optional; absent ids become md5(text) content fingerprints."""
    ds = ray.data.read_json(path)

    def stamp(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pylist()
        if "id" in batch.column_names:
            raw = batch.column("id").to_pylist()
            ids = [
                str(r) if r is not None else _content_id(t)
                for r, t in zip(raw, text)
            ]
        else:
            ids = [_content_id(t) for t in text]
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array([0] * len(ids), pa.int32()),
                pa.array(["user"] * len(ids), pa.string()),
                pa.array([t if t is not None else "" for t in text], pa.string()),
            ],
            names=["conv_id", "turn_idx", "role", "text"],
        )

    return ds.map_batches(stamp, batch_format="pyarrow")


def _content_id(text: str | None) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


class WebJsonStage:
    """Actor-pool stage: request rows → one VM-shaped JSON record per
    request. Tokenizer LUTs are module singletons; both DNN models load
    once per actor (the ConcurrentFactory.cs:56-108 pool semantics)."""

    def __init__(self, model_type: str = "ner", artifact_dir: str | None = None):
        if model_type not in _MODEL_TYPES:
            raise ValueError(f"model_type must be one of {_MODEL_TYPES}")
        from ..stages.tag import TaggerStage

        self.model_type = model_type
        self.tagger = TaggerStage(artifact_dir=artifact_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.tokenize import tokenize_batch

        # batch-local request registry, first occurrence wins (duplicate
        # keys collapse — see module docstring)
        ids: list[str] = []
        keep: list[int] = []
        seen: set[str] = set()
        for i, cid in enumerate(batch.column("conv_id").to_pylist()):
            if cid not in seen:
                seen.add(cid)
                ids.append(cid)
                keep.append(i)
        sents: dict[str, list[dict]] = {cid: [] for cid in ids}

        tagged = self.tagger(tokenize_batch(batch.take(keep)))

        words_col = tagged.column("values").to_pylist()
        label_col = tagged.column(self.model_type).to_pylist()
        for cid, words, labels in zip(
            tagged.column("conv_id").to_pylist(), words_col, label_col
        ):
            sents[cid].append(
                {"tuples": [{"word": w, "label": l} for w, l in zip(words, labels)]}
            )

        # one row per request, empty-text requests included with sents: []
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array([json.dumps(sents[cid], ensure_ascii=False) for cid in ids],
                         pa.string()),
            ],
            names=["id", "sents_json"],
        )


def tag_requests(
    requests: ray.data.Dataset,
    model_type: str = "ner",
    concurrency: int | None = None,
    artifact_dir: str | None = None,
) -> ray.data.Dataset:
    """Request rows → ``(id, sents_json)`` rows via the WebJsonStage actor
    pool (``concurrency=None`` lets Ray size the pool; tests pass small)."""
    kwargs: dict = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return requests.map_batches(
        WebJsonStage,
        fn_constructor_kwargs={"model_type": model_type, "artifact_dir": artifact_dir},
        **kwargs,
    )


def run_webjson_job(
    in_path: str,
    out_dir: str,
    model_type: str = "ner",
    concurrency: int | None = None,
    artifact_dir: str | None = None,
) -> None:
    """End-to-end batch replay of the web surface: JSONL requests at
    ``in_path`` → tagged VM-shaped JSONL under ``out_dir`` (one
    ``{"id", "sents"}`` object per line; sents parsed back from the
    stage's JSON string so the on-disk record is the nested VM shape)."""
    tagged = tag_requests(
        read_json_requests(in_path),
        model_type=model_type,
        concurrency=concurrency,
        artifact_dir=artifact_dir,
    )

    def to_record(batch: pa.Table):
        import pandas as pd

        return pd.DataFrame(
            {
                "id": batch.column("id").to_pylist(),
                "sents": [json.loads(s) for s in batch.column("sents_json").to_pylist()],
            }
        )

    # pandas-block JSON sink: object columns serialize as nested JSON, so
    # each output line is the exact VM record shape
    tagged.map_batches(to_record, batch_format="pyarrow").write_json(out_dir)
