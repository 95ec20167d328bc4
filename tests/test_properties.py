"""Property-based robustness tests (hypothesis) for the textkit layer:
span invariants that must hold for ANY input, including junk unicode."""
from hypothesis import given, settings
from hypothesis import strategies as st

from lingvo__postagger_ner_ru_dnn_ray.textkit import xlat
from lingvo__postagger_ner_ru_dnn_ray.textkit.sentsplit import split_sents_simple
from lingvo__postagger_ner_ru_dnn_ray.textkit.tokenizer import Word, tokenize_text
from lingvo__postagger_ner_ru_dnn_ray.textkit.urls import allocate_urls

# BMP text incl. cyrillic, punctuation, digits, whitespace
_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0xFFFF, blacklist_categories=("Cs",)),
    max_size=200,
)
_ru_text = st.text(
    alphabet="абвгдеё ЖЗИЙ .,!?…«»-–—0123456789:\nwww.ru@АБВ",
    max_size=120,
)


@settings(max_examples=150, deadline=None)
@given(_text)
def test_sents_are_disjoint_ordered_spans(text):
    u = xlat.to_u16(text)
    prev_end = 0
    for s in split_sents_simple(text, u):
        assert 0 <= s.start <= len(u)
        assert s.length > 0
        assert s.start >= prev_end
        assert s.start + s.length <= len(u)
        prev_end = s.start + s.length


@settings(max_examples=150, deadline=None)
@given(_ru_text)
def test_tokens_are_ordered_in_text_spans(text):
    u = xlat.to_u16(text)
    for sent in tokenize_text(text):
        prev_end = -1
        for w in sent:
            assert isinstance(w, Word)
            assert 0 <= w.start < len(u) or w.length == 0
            assert w.start + w.length <= len(u)
            assert w.start >= prev_end  # non-overlapping, sorted
            prev_end = w.start + w.length if w.length > 0 else prev_end
            assert w.value != ""


@settings(max_examples=150, deadline=None)
@given(_ru_text)
def test_non_placeholder_tokens_reconstruct_from_text(text):
    for sent in tokenize_text(text, replace_nums=False):
        for w in sent:
            raw = xlat.from_u16(xlat.to_u16(text), w.start, w.length)
            # punctuation canonicalization may rewrite the value; the raw
            # span must still be inside the text and same length
            assert len(raw) == w.length
            if w.value == raw:
                continue
            assert len(w.value) <= max(w.length, 1)


@settings(max_examples=100, deadline=None)
@given(_text)
def test_url_detector_never_crashes_and_spans_valid(text):
    u = xlat.to_u16(text)
    for span in allocate_urls(text, u):
        assert 0 <= span.start < max(1, len(u))
        assert span.length >= 1
        assert span.start + span.length <= len(u)


def test_bench_keep_sampling_decision():
    """Band-proof resampler policy (round-4 lesson: a steal band owned the
    whole driver session and recorded the headline at 2x its quiet value):
    resample on high spread or all-samples-over-band, never past max_runs,
    band rule only applies in the reference config."""
    import importlib.util
    import os
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parents[1] / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    # bench.py's import-time setdefaults (GRAFT_KG_MEMO_STATS, BLAS pins)
    # must not leak into the rest of the pytest process
    saved = {k: os.environ.get(k) for k in
             ("GRAFT_KG_MEMO_STATS", "OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS")}
    try:
        spec.loader.exec_module(bench)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    keep = bench._keep_sampling

    # under the minimum: always keep sampling
    assert keep([30.0], n_runs=3, max_runs=6, ref=11.5, ref_config=True)
    # quiet session at the minimum: stop
    assert not keep([12.0, 11.9, 12.1], 3, 6, 11.5, True)
    # band moved mid-session (spread > 1.5x): keep sampling
    assert keep([18.0, 11.9, 12.0], 3, 6, 11.5, True)
    # whole session in a band (all > 2x ref): keep sampling
    assert keep([25.0, 24.0, 26.0], 3, 6, 11.5, True)
    # same samples OUTSIDE the reference config: spread is fine, band rule
    # doesn't apply (no comparable reference)
    assert not keep([25.0, 24.0, 26.0], 3, 6, 11.5, False)
    # hard stop at max_runs even if still banded
    assert not keep([25.0] * 6, 3, 6, 11.5, True)
    # no reference known: only the spread rule fires
    assert not keep([25.0, 24.0, 26.0], 3, 6, None, True)
    assert keep([40.0, 24.0, 26.0], 3, 6, None, True)
