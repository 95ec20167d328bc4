"""Ray Data stage: BIO decode — tagged sentence rows → mention rows.

Standard BIO decoding over the NER tag sequence (tag set B/I × PER/ORG/LOC
+ O; the reference renders these classes in its web UI,
WebService/wwwroot/js/main.js:81-89). An I-tag opening a span (after O or a
different type) starts a new mention — the usual IOB repair.

Stateless map_batches; one input sentence row → 0..n mention rows:
    conv_id, turn_idx, sent_idx, mention_idx,
    surface      space-joined token values
    ner          PER | ORG | LOC
    span_start   char offset of first token (UTF-16 units into turn text)
    span_len     through end of last token
    tok_from, tok_to   token index range [from, to)
"""
from __future__ import annotations

import pyarrow as pa

MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("mention_idx", pa.int32()),
        ("surface", pa.string()),
        ("ner", pa.string()),
        ("span_start", pa.int32()),
        ("span_len", pa.int32()),
        ("tok_from", pa.int32()),
        ("tok_to", pa.int32()),
    ]
)


def decode_bio(tags: list[str]) -> list[tuple[int, int, str]]:
    """[(tok_from, tok_to, type)] spans from a BIO tag sequence."""
    spans: list[tuple[int, int, str]] = []
    start = -1
    cur = ""
    for i, tag in enumerate(tags):
        if tag == "O" or not tag:
            if start >= 0:
                spans.append((start, i, cur))
                start = -1
            continue
        prefix, _, typ = tag.partition("-")
        if prefix == "B" or start < 0 or typ != cur:
            if start >= 0:
                spans.append((start, i, cur))
            start = i
            cur = typ
    if start >= 0:
        spans.append((start, len(tags), cur))
    return spans


def mentions_batch(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    sidx = batch.column("sent_idx").to_pylist()
    values = batch.column("values").to_pylist()
    starts = batch.column("starts").to_pylist()
    lens = batch.column("lens").to_pylist()
    ners = batch.column("ner").to_pylist()

    rows = {name: [] for name in MENTION_SCHEMA.names}
    for c, t, s, vals, st, ln, tags in zip(conv, turn, sidx, values, starts, lens, ners):
        for mi, (a, b, typ) in enumerate(decode_bio(tags)):
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            rows["sent_idx"].append(s)
            rows["mention_idx"].append(mi)
            rows["surface"].append(" ".join(vals[a:b]))
            rows["ner"].append(typ)
            rows["span_start"].append(st[a])
            rows["span_len"].append(st[b - 1] + ln[b - 1] - st[a])
            rows["tok_from"].append(a)
            rows["tok_to"].append(b)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in MENTION_SCHEMA], schema=MENTION_SCHEMA
    )
