"""Regenerate fixtures/reference_input_labels.json — POS/NER label
sequences for every sentence of the reference's bundled input text, on
both tokenizer dot variants (Simple web path / console batch path).

Hand-review guide (the invariants the snapshot pins, traceable to the
reference's rules):
  * [%NUM%] tokens       -> POS 'Numeral'   (PosTaggerExtensions.cs:23-26)
  * URL/Email tokens     -> POS 'Other'     (PosTaggerExtensions.cs:27-33)
  * punctuation-flagged  -> POS 'Punctuation' (PosTaggerExtensions.cs:34-37)
  * NER classes are BIO over {PER, ORG, LOC} + O (wwwroot/js/main.js:81-89)
  * known mentions from the bundled text: Петербурге/РФ/России/Истра/
    Москве -> LOC, СКР/Минобороны/Транзас -> ORG, Сергея Козлова -> B-PER
    I-PER (standalone Козлов(а/у) -> I-PER: the context-free lexicon maps
    surname forms to the I- slot they occupy in full-name mentions)
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa

from lingvo__postagger_ner_ru_dnn_ray.stages.tag import TaggerStage
from lingvo__postagger_ner_ru_dnn_ray.textkit.tokenizer import (
    tokenize_text,
    tokenize_text_console,
)

REF = "/root/reference/[resources]/input-text/input_pos_tagger_ru.txt"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "reference_input_labels.json")


def tag(sent_words, ts):
    batch = pa.table({
        "values": pa.array([[w.value for w in ws] for ws in sent_words],
                           pa.list_(pa.string())),
        "input_types": pa.array([[w.input_type for w in ws] for ws in sent_words],
                                pa.list_(pa.int32())),
        "extras": pa.array([[w.extra for w in ws] for ws in sent_words],
                           pa.list_(pa.int32())),
    })
    out = ts(batch)
    return out.column("pos").to_pylist(), out.column("ner").to_pylist()


def main():
    lines = [l for l in open(REF, encoding="utf-8-sig").read().splitlines()
             if l.strip()]
    ts = TaggerStage()
    snap = []
    for i, line in enumerate(lines):
        simple_sents = tokenize_text(line)
        s_pos, s_ner = tag(simple_sents, ts)
        console_words = tokenize_text_console(line)
        c_pos, c_ner = tag([console_words], ts)
        snap.append({
            "line_idx": i,
            "simple": [
                {"tokens": [w.value for w in ws], "pos": p, "ner": n}
                for ws, p, n in zip(simple_sents, s_pos, s_ner)
            ],
            "console": {
                "tokens": [w.value for w in console_words],
                "pos": c_pos[0],
                "ner": c_ner[0],
            },
        })
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(snap, f, ensure_ascii=False, indent=1)
    print(f"wrote {OUT}: {len(snap)} lines")


if __name__ == "__main__":
    main()
