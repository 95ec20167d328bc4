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
    """Arrow-native output: token attributes append to FLAT builders with a
    shared offsets array and become ListArrays via ListArray.from_arrays —
    no per-sentence Python list objects survive to the Arrow conversion."""
    import numpy as np

    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    role = batch.column("role").to_pylist() if "role" in batch.column_names else [""] * len(conv)
    text = batch.column("text").to_pylist()

    o_conv: list[str] = []
    o_turn: list[int] = []
    o_role: list[str] = []
    o_sidx: list[int] = []
    offsets: list[int] = [0]
    f_vals: list[str] = []
    f_starts: list[int] = []
    f_lens: list[int] = []
    f_it: list[int] = []
    f_ex: list[int] = []

    for c, t, r, x in zip(conv, turn, role, text):
        if not x:
            continue
        for si, words in enumerate(tokenize_text(x)):
            o_conv.append(c)
            o_turn.append(t)
            o_role.append(r)
            o_sidx.append(si)
            for w in words:
                f_vals.append(w.value)
                f_starts.append(w.start)
                f_lens.append(w.length)
                f_it.append(w.input_type)
                f_ex.append(w.extra)
            offsets.append(len(f_vals))

    off = pa.array(np.asarray(offsets, dtype=np.int32))

    def lst(flat, typ):
        return pa.ListArray.from_arrays(off, pa.array(flat, typ))

    return pa.Table.from_arrays(
        [
            pa.array(o_conv, pa.string()),
            pa.array(o_turn, pa.int32()),
            pa.array(o_role, pa.string()),
            pa.array(o_sidx, pa.int32()),
            lst(f_vals, pa.string()),
            lst(f_starts, pa.int32()),
            lst(f_lens, pa.int32()),
            lst(f_it, pa.uint8()),
            lst(f_ex, pa.uint8()),
        ],
        schema=SENT_SCHEMA,
    )
