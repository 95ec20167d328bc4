"""Ray Data stage: triple extraction — tagged sentence rows → (subj, pred, obj).

Rule (north_star): within one sentence, for each consecutive pair of NER
mentions (m1, m2), the predicate is the first run of verb-group tokens
(POS ∈ {Verb, AuxiliaryVerb, Infinitive}) strictly between them; subject =
m1, object = m2. A deterministic pure function of the turn's tagged
sentence — no cross-turn or cross-block state, so extraction order is
stable under any scheduling (the per-turn text-equality invariant is pinned
upstream by sorting turns per conv_id).

Stateless map_batches; one sentence row → 0..n triple rows:
    conv_id, turn_idx, sent_idx, triple_idx,
    subj, subj_type, pred, obj, obj_type,
    subj_start, subj_len, obj_start, obj_len
"""
from __future__ import annotations

import pyarrow as pa

from ..textkit.xlat import lower_invariant
from .mentions import decode_bio

VERB_GROUP = frozenset({"Verb", "AuxiliaryVerb", "Infinitive"})

TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("triple_idx", pa.int32()),
        ("subj", pa.string()),
        ("subj_type", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_type", pa.string()),
        ("subj_start", pa.int32()),
        ("subj_len", pa.int32()),
        ("obj_start", pa.int32()),
        ("obj_len", pa.int32()),
    ]
)


def extract_sentence_triples(vals, starts, lens, pos, ner):
    """Pure per-sentence extraction; returns list of tuples in TRIPLE_SCHEMA
    column order minus the id columns."""
    spans = decode_bio(ner)
    if len(spans) < 2:
        return []
    out = []
    for (a1, b1, t1), (a2, b2, t2) in zip(spans, spans[1:]):
        run: list[int] = []
        for k in range(b1, a2):
            if pos[k] in VERB_GROUP:
                run.append(k)
            elif run:
                break
        if not run:
            continue
        pred = " ".join(lower_invariant(vals[k]) for k in run)
        out.append(
            (
                " ".join(vals[a1:b1]), t1, pred, " ".join(vals[a2:b2]), t2,
                starts[a1], starts[b1 - 1] + lens[b1 - 1] - starts[a1],
                starts[a2], starts[b2 - 1] + lens[b2 - 1] - starts[a2],
            )
        )
    return out


def triples_batch(batch: pa.Table) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    turn = batch.column("turn_idx").to_pylist()
    sidx = batch.column("sent_idx").to_pylist()
    values = batch.column("values").to_pylist()
    starts = batch.column("starts").to_pylist()
    lens = batch.column("lens").to_pylist()
    poss = batch.column("pos").to_pylist()
    ners = batch.column("ner").to_pylist()

    rows = {name: [] for name in TRIPLE_SCHEMA.names}
    for c, t, s, vals, st, ln, pos, ner in zip(conv, turn, sidx, values, starts, lens, poss, ners):
        for ti, tup in enumerate(extract_sentence_triples(vals, st, ln, pos, ner)):
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            rows["sent_idx"].append(s)
            rows["triple_idx"].append(ti)
            for name, v in zip(TRIPLE_SCHEMA.names[4:], tup):
                rows[name].append(v)
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
    )
