"""Token↔id vocabulary with the reference's reserved ids.

Mirrors Models/Vocab.cs:14-57,154-194 and Corpus/BuildInTokens.cs:13-15:
ids 0=</s> (EOS/pad), 1=<s>, 2=<unk>; real entries start at 3
(START_MEANING_INDEX). Vocab build = frequency-desc truncation
(CorpusBatch.cs:171-221); ties broken by token string for determinism
(the reference's SortedDictionary enumeration order is unspecified).
"""
from __future__ import annotations

from collections import Counter
from collections.abc import Iterable

EOS = "</s>"
BOS = "<s>"
UNK = "<unk>"
EOS_ID, BOS_ID, UNK_ID = 0, 1, 2
START_MEANING_INDEX = 3

PREDEFINED = (EOS, BOS, UNK)


class Vocab:
    def __init__(self, items: Iterable[str]):
        self.word_to_index: dict[str, int] = {EOS: EOS_ID, BOS: BOS_ID, UNK: UNK_ID}
        for w in items:
            if w not in self.word_to_index:
                self.word_to_index[w] = len(self.word_to_index)
        self.index_to_word = {i: w for w, i in self.word_to_index.items()}

    def __len__(self) -> int:
        return len(self.word_to_index)

    def id(self, word: str) -> int:
        return self.word_to_index.get(word, UNK_ID)

    def ids(self, words: Iterable[str]) -> list[int]:
        g = self.word_to_index.get
        return [g(w, UNK_ID) for w in words]

    def word(self, idx: int) -> str:
        return self.index_to_word.get(idx, UNK)

    @classmethod
    def build(cls, token_counts: Counter, vocab_size: int | None = None) -> "Vocab":
        items = sorted(token_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if vocab_size is not None:
            items = items[: max(0, vocab_size - START_MEANING_INDEX)]
        return cls(w for w, _ in items)

    def to_dict(self) -> dict[str, int]:
        return dict(self.word_to_index)

    @classmethod
    def from_dict(cls, d: dict[str, int]) -> "Vocab":
        v = cls.__new__(cls)
        v.word_to_index = dict(d)
        v.index_to_word = {i: w for w, i in d.items()}
        return v
