"""Tagger model + vocab tests (SURVEY.md §2.2 rows 10-13, §2.3 row 1)."""
from collections import Counter

import numpy as np

from lingvo__postagger_ner_ru_dnn_ray.model.lexicon import (
    entity_dictionary,
    ner_token_label,
    pos_token_label,
    taggers,
)
from lingvo__postagger_ner_ru_dnn_ray.model.tagger import MAX_PREDICT_SENT_LENGTH
from lingvo__postagger_ner_ru_dnn_ray.model.vocab import BOS_ID, EOS_ID, UNK_ID, Vocab


def test_vocab_reserved_ids():
    v = Vocab(["a", "b"])
    assert v.id("</s>") == EOS_ID == 0
    assert v.id("<s>") == BOS_ID == 1
    assert v.id("<unk>") == UNK_ID == 2
    assert v.id("a") == 3 and v.id("b") == 4
    assert v.id("zzz") == UNK_ID


def test_vocab_build_freq_desc():
    v = Vocab.build(Counter({"x": 5, "y": 9, "z": 5}), vocab_size=5)
    assert v.id("y") == 3  # highest frequency first
    assert v.id("x") == 4  # tie broken by token
    assert v.id("z") == UNK_ID  # truncated


def test_tagger_reproduces_lexicon():
    pos, ner = taggers()
    for model, tl in ((pos, pos_token_label()), (ner, ner_token_label())):
        tokens = list(tl)
        labels = model.predict_batch([tokens])[0]
        assert labels == [tl[t] for t in tokens]


def test_tagger_unknown_token_default_label():
    pos, ner = taggers()
    assert pos.predict_batch([["_xyz9"]]) == [["Other"]]
    assert ner.predict_batch([["qqqq"]]) == [["O"]]


def test_long_sentence_chunking():
    # SeqLabel.Predict_Full (SeqLabel.cs:259-311): ≤10% overflow truncates
    # (excess tokens unlabeled), larger overflow chunks and labels all.
    _, ner = taggers()
    tok = list(ner_token_label())[0]
    lab = ner_token_label()[tok]

    n_trunc = MAX_PREDICT_SENT_LENGTH + 10  # 10 <= 22 -> truncate
    got = ner.predict_batch([[tok] * n_trunc])[0]
    assert len(got) == MAX_PREDICT_SENT_LENGTH and set(got) == {lab}

    n_chunk = MAX_PREDICT_SENT_LENGTH * 2 + 50  # > 10% -> chunked, all labeled
    got = ner.predict_batch([[tok] * n_chunk])[0]
    assert len(got) == n_chunk and set(got) == {lab}


def test_batched_equals_single():
    pos, _ = taggers()
    sents = [list(pos_token_label())[:7], list(pos_token_label())[7:12], ["_xyz9"]]
    batched = pos.predict_batch(sents)
    single = [pos.predict_batch([s])[0] for s in sents]
    assert batched == single


def test_entity_dictionary_shape():
    rows = entity_dictionary()
    ids = [r["entity_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["type"] in ("PER", "ORG", "LOC") for r in rows)
    canons = {r["canonical"] for r in rows}
    assert "Виктор Нечаев" not in canons  # deliberate NIL entity
