"""Regression net over the reference's bundled test text
([resources]/input-text/input_pos_tagger_ru.txt patterns — reproduced
here as literals; BASELINE.md defines tag parity on these sentences).
Snapshot-style assertions pin the tokenizer's behavior on the exact
linguistic material the reference ships for eyeballing."""
from lingvo__postagger_ner_ru_dnn_ray.pipelines.oracle import oracle_tables
from lingvo__postagger_ner_ru_dnn_ray.textkit.tokenizer import (
    tokenize_text,
    tokenize_text_console,
)

# representative lines mirroring the bundled input text's phenomena
LINES = [
    "Эти типы стали есть в цехе.",
    "Вася, маша руками и коля дрова, морочил голову.",
    "Вася, Маша и Коля пошли гулять.",
    "Гло́кая ку́здра ште́ко будлану́ла бо́кра и курдя́чит бокрёнка.",
    "Варкалось. Хливкие шорьки пырялись по наве, и хрюкотали зелюки, как мюмзики в мове.",
    "В Петербурге перед судом предстанет высокопоставленный офицер Генерального штаба ВС РФ.",
    "Кроме того, по инициативе следствия представителем Минобороны России к С.Козлову заявлен гражданский иск о возмещении причиненного государству ущерба на сумму свыше 27 млн руб.",
    "По данным следователей, в июле 2010г. военный чиновник отдал подчиненному \"заведомо преступный приказ\" о заключении лицензионных договоров с компаниями \"Чарт-Пилот\" и \"Транзас\".",
    "В результате в 2006г. центральной жилищной комиссии Минобороны и Управления делами президента РФ С.Козлов был признан нуждающимся в жилье и в 2008г. получил от государства квартиру в Москве площадью 72 кв. м и стоимостью 18,5 млн руб.",
    "Против С. Козлова возбуждено дело по п.\"в\" ч.3 ст.286 и ч.4 ст.159 УК РФ.",
]


def test_every_line_tokenizes_on_both_paths():
    for line in LINES:
        simple = tokenize_text(line)
        console = tokenize_text_console(line)
        assert simple and console
        # all tokens non-empty and offsets inside the line
        for sent in simple:
            for w in sent:
                assert w.value
                assert 0 <= w.start and w.start + w.length <= len(line) + 2


def test_snapshot_token_counts():
    # snapshot: simple-path token counts per line (regression pin)
    got = [sum(len(s) for s in tokenize_text(line)) for line in LINES]
    assert got == [7, 11, 8, 9, 17, 12, 28, 33, 43, 20], got


def test_num_and_quota_phenomena():
    toks = [w.value for s in tokenize_text(LINES[8]) for w in s]
    assert toks.count("[%NUM%]") == 4  # 2006г., 2008г., 72, 18,5
    toks7 = [w.value for s in tokenize_text(LINES[7]) for w in s]
    assert toks7.count('"') == 6


def test_oracle_on_reference_material():
    import pyarrow as pa

    tbl = pa.table(
        {
            "conv_id": ["ref"] * len(LINES),
            "turn_idx": pa.array(range(len(LINES)), pa.int32()),
            "role": ["user"] * len(LINES),
            "text": LINES,
        }
    )
    out = oracle_tables(tbl)
    assert out["sentences"].num_rows >= len(LINES)
    assert out["mentions"].num_rows > 0
    # known mention: С.Козлову is NOT a lexicon surface on the simple path
    # (С + . + Козлову), but Минобороны / РФ / Москве are
    surfaces = set(out["mentions"].column("surface").to_pylist())
    assert "Минобороны" in surfaces
    assert "РФ" in surfaces
