"""Ray Data stage: transcripts → tokenized sentence rows.

Stateless ``map_batches`` transform (batch_format="pyarrow"): the char LUTs
and resource sets are read-only module-level singletons built once per
worker process (mirror of the reference's per-thread Tokenizer with shared
static xlat tables, Tokenizer.cs:205-220,254-274) — no actor needed.

Input  (one row per turn):  conv_id, turn_idx, role, text, tool, ts
Output (one row per sentence):
    conv_id, turn_idx, role, sent_idx,
    values      list<string>   canonicalized valueOriginal per token
    starts      list<int32>    char offset into the turn text (UTF-16 units)
    lens        list<int32>
    input_types list<uint8>    PosTaggerInputType
    extras      list<uint8>    ExtraWordType flags

Turns whose text yields no sentences (empty/whitespace) emit no rows
(TryTokenizeBySents, PosTaggerExtensions.cs:61-72).
"""
from __future__ import annotations

import pyarrow as pa

from ..textkit.tokenizer import tokenize_text

SENT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("sent_idx", pa.int32()),
        ("values", pa.list_(pa.string())),
        ("starts", pa.list_(pa.int32())),
        ("lens", pa.list_(pa.int32())),
        ("input_types", pa.list_(pa.uint8())),
        ("extras", pa.list_(pa.uint8())),
    ]
)


def tokenize_batch(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    role = batch.column("role").to_pylist() if "role" in batch.column_names else [""] * len(conv)
    text = batch.column("text").to_pylist()

    o_conv: list[str] = []
    o_turn: list[int] = []
    o_role: list[str] = []
    o_sidx: list[int] = []
    o_vals: list[list[str]] = []
    o_starts: list[list[int]] = []
    o_lens: list[list[int]] = []
    o_it: list[list[int]] = []
    o_ex: list[list[int]] = []

    for c, t, r, x in zip(conv, turn, role, text):
        if not x:
            continue
        for si, words in enumerate(tokenize_text(x)):
            o_conv.append(c)
            o_turn.append(t)
            o_role.append(r)
            o_sidx.append(si)
            o_vals.append([w.value for w in words])
            o_starts.append([w.start for w in words])
            o_lens.append([w.length for w in words])
            o_it.append([w.input_type for w in words])
            o_ex.append([w.extra for w in words])

    return pa.Table.from_arrays(
        [
            pa.array(o_conv, pa.string()),
            pa.array(o_turn, pa.int32()),
            pa.array(o_role, pa.string()),
            pa.array(o_sidx, pa.int32()),
            pa.array(o_vals, pa.list_(pa.string())),
            pa.array(o_starts, pa.list_(pa.int32())),
            pa.array(o_lens, pa.list_(pa.int32())),
            pa.array(o_it, pa.list_(pa.uint8())),
            pa.array(o_ex, pa.list_(pa.uint8())),
        ],
        schema=SENT_SCHEMA,
    )
