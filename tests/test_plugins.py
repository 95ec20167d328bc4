"""§2.11 plug-in surface: InputTypeProcessor / Metric registries
(IPosTaggerInputTypeProcessor + IMetric analogues)."""
import pyarrow as pa
import pytest


def test_registry_defaults_and_errors():
    from lingvo__postagger_ner_ru_dnn_ray import plugins
    from lingvo__postagger_ner_ru_dnn_ray.textkit.features import get_input_type

    assert plugins.input_type_processor(None) is None  # built-in fast path
    assert plugins.input_type_processor("en") is None
    assert plugins._INPUT_TYPE_PROCESSORS["en"] is get_input_type
    assert isinstance(get_input_type, plugins.InputTypeProcessor)
    assert callable(plugins.metric("seq_fscore"))
    assert callable(plugins.metric("length_histogram"))
    with pytest.raises(KeyError):
        plugins.input_type_processor("nope")
    with pytest.raises(KeyError):
        plugins.metric("nope")


def test_custom_input_type_processor_through_fused_stage():
    """Swap a custom graphemic classifier through KgStage by NAME (the
    TokenizerConfig.PosTaggerInputTypeProcessor slot): a processor that
    types EVERY token as Num must, via the Num->Numeral post-correction
    rule, wipe out all NER-driven triples — proving the plug-in reaches
    the tokenizer inside the fused chain."""
    from lingvo__postagger_ner_ru_dnn_ray import plugins
    from lingvo__postagger_ner_ru_dnn_ray.stages.fused import KgStage
    from lingvo__postagger_ner_ru_dnn_ray.textkit.features import (
        EX_INTEGER_NUMBER,
        IT_NUM,
    )

    def all_num(u, start, length):
        return IT_NUM, EX_INTEGER_NUMBER

    plugins.register_input_type_processor("test-all-num", all_num)
    try:
        batch = pa.table({
            "conv_id": pa.array(["c1", "c1"]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "text": pa.array([
                "Сергей Козлов возглавляет Транзас в Москве .",
                "СКР проверил Газпром .",
            ]),
        })
        default_out = KgStage()(batch)
        assert default_out.num_rows > 0  # NER mentions -> triples
        custom_out = KgStage(input_type_processor="test-all-num")(batch)
        assert custom_out.num_rows == 0  # every token Numeral, no mentions
    finally:
        plugins._INPUT_TYPE_PROCESSORS.pop("test-all-num", None)


def test_metric_registry_custom():
    from lingvo__postagger_ner_ru_dnn_ray import plugins

    def my_metric(ds, **kw):
        return None

    plugins.register_metric("test-m", my_metric)
    try:
        assert plugins.metric("test-m") is my_metric
    finally:
        plugins._METRICS.pop("test-m", None)
