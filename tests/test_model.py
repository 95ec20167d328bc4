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


def test_predict_batch_padding_invariant():
    """A sentence's labels must not depend on batch composition: alone,
    padded next to a 200-token straggler (flat-pad worst case), duplicated,
    or memo-warm — all identical. This pins the dedup+bucketing fast path
    (tagger.py predict_batch/_forward_unique) to the flat-padded semantics:
    masked keys underflow to exactly 0.0 in the attention softmax."""
    pos, _ = taggers()
    vocab_toks = list(pos_token_label())
    short = vocab_toks[:5] + ["_unk_pad_x"]
    long = (vocab_toks * 40)[:200]

    alone = pos.predict_batch([short])[0]
    pos._label_memo.clear()
    with_straggler = pos.predict_batch([long, short, short])
    assert with_straggler[1] == alone and with_straggler[2] == alone
    # memo-warm replay (same worker, later batch)
    assert pos.predict_batch([short])[0] == alone
    # forced memo clear mid-stream changes nothing
    pos._label_memo.clear()
    assert pos.predict_batch([short, long])[0] == alone


def test_predict_batch_memo_bounded():
    pos, _ = taggers()
    pos._label_memo.clear()
    old_cap = pos._MEMO_CAP
    try:
        type(pos).__dict__  # keep attribute on instance, not class
        pos.__dict__["_MEMO_CAP"] = 8
        for i in range(40):
            pos.predict_batch([[f"_m{i}_{j}" for j in range(3)]])
        assert len(pos._label_memo) <= 8
    finally:
        pos.__dict__.pop("_MEMO_CAP", None)
        assert pos._MEMO_CAP == old_cap
        pos._label_memo.clear()


def test_entity_dictionary_shape():
    rows = entity_dictionary()
    ids = [r["entity_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["type"] in ("PER", "ORG", "LOC") for r in rows)
    canons = {r["canonical"] for r in rows}
    assert "Виктор Нечаев" not in canons  # deliberate NIL entity


def test_artifact_roundtrip(tmp_path):
    """save_artifact -> load_artifact reproduces identical predictions
    (the .s2s save/load analogue, BaseSeq2SeqFramework.cs:172-228)."""
    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import (
        load_artifact,
        save_artifact,
    )

    pos, _ = taggers()
    manifest = save_artifact(pos, tmp_path / "pos.npz")
    assert manifest["format"] == "npz-v1" and manifest["n_weight_tensors"] > 0
    loaded = load_artifact(tmp_path / "pos.npz")
    assert loaded.src_vocab.word_to_index == pos.src_vocab.word_to_index
    assert loaded.labels == pos.labels
    toks = list(pos_token_label())[:50]
    assert loaded.predict_batch([toks]) == pos.predict_batch([toks])
    for k in pos.w:
        np.testing.assert_array_equal(loaded.w[k], pos.w[k])


def test_artifact_tamper_detection(tmp_path):
    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import (
        load_artifact,
        save_artifact,
    )

    pos, _ = taggers()
    save_artifact(pos, tmp_path / "pos.npz")
    data = (tmp_path / "pos.npz").read_bytes()
    (tmp_path / "pos.npz").write_bytes(data[:-8] + b"\x00" * 8)
    import pytest

    with pytest.raises(ValueError, match="hash mismatch"):
        load_artifact(tmp_path / "pos.npz")
    # pristine artifact + verify=False skips the integrity check
    save_artifact(pos, tmp_path / "pos2.npz")
    load_artifact(tmp_path / "pos2.npz", verify=False)


def test_ensure_default_artifacts_idempotent(tmp_path):
    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import (
        ensure_default_artifacts,
        load_taggers,
    )

    d1 = ensure_default_artifacts(tmp_path / "models")
    m1 = (tmp_path / "models" / "pos.npz").stat().st_mtime_ns
    d2 = ensure_default_artifacts(tmp_path / "models")
    assert d1 == d2
    assert (tmp_path / "models" / "pos.npz").stat().st_mtime_ns == m1  # no rewrite
    pos, ner = load_taggers(d1)
    assert pos.max_ending_length == 4 and ner.max_ending_length == 10000


def test_topk_class_probs():
    """Class-probability ranking per token (SeqLabel.cs:205-213) — top-1
    must agree with argmax predict, probs sorted desc and sum≈softmax."""
    pos, _ = taggers()
    toks = list(pos_token_label())[:20]
    ranked = pos.topk_class_probs([toks], k=3)[0]
    argmax = pos.predict_batch([toks])[0]
    assert len(ranked) == len(toks)
    for token_ranks, top_label in zip(ranked, argmax):
        labels = [l for l, _ in token_ranks]
        probs = [p for _, p in token_ranks]
        assert labels[0] == top_label
        assert probs == sorted(probs, reverse=True)
        assert 0.0 < probs[0] <= 1.0


def test_memo_overflow_mid_batch():
    """When the label memo clears mid-stream, keys that were memoized
    BEFORE the clear but needed by the current batch must be recomputed
    (the drop-and-KeyError bug hit at ≥2^17 unique sentences/worker)."""
    pos, _ = taggers()
    pos._label_memo.clear()
    s1, s2 = ["_ovf_a"], ["_ovf_b"]
    try:
        pos.__dict__["_MEMO_CAP"] = 2
        alone = pos.predict_batch([s1])[0]
        pos.predict_batch([s2])  # memo now holds 2 keys == cap
        # batch needs s1 (memoized) + two new keys -> forces a clear;
        # s1 must still resolve
        got = pos.predict_batch([["_ovf_c"], s1, ["_ovf_d"]])
        assert got[1] == alone
    finally:
        pos.__dict__.pop("_MEMO_CAP", None)
        pos._label_memo.clear()
