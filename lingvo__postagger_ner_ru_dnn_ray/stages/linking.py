"""Ray Data stage: entity linking — broadcast hash join against the
canonical entity dictionary.

The dictionary is the small side (≪ mentions), so this is a broadcast
join, not a shuffle join (SURVEY.md §2.4): the driver ``ray.put``s the
normalized-surface-form → (entity_id, canonical) map ONCE; each actor
``ray.get``s it in __init__ (zero-copy from the local object store) and
does dict lookups per batch. Misses keep the NIL id (left-outer
semantics). At 10^12-turn scale the dictionary would still be broadcast
(it is entity-catalog sized); only if it outgrew worker memory would this
become a hash-partitioned join on the normalized key.

Surface normalization = the reference's model-token projection at
mel=10000: lower-invariant + ё→е + NonSpacingMark strip
(Tokenizer.ToPosTaggerToken, Tokenizer.cs:1282-1334), applied per word.
"""
from __future__ import annotations

import pyarrow as pa
import ray

from ..model.lexicon import entity_dictionary
from ..textkit.features import to_model_token_str

NIL = "NIL"


from functools import lru_cache


@lru_cache(maxsize=1 << 17)
def normalize_surface(surface: str) -> str:
    # memoized per worker process: real corpora draw surfaces from a
    # heavy-tailed distribution, so the cache absorbs the per-char
    # normalization cost (bounded LRU keeps memory flat at stream scale)
    return " ".join(to_model_token_str(w, 10000) for w in surface.split(" "))


def build_linking_dict() -> dict[str, tuple[str, str]]:
    """normalized surface form -> (entity_id, canonical)."""
    out: dict[str, tuple[str, str]] = {}
    for row in entity_dictionary():
        for sf in row["surface_forms"]:
            out.setdefault(sf, (row["entity_id"], row["canonical"]))
    return out


def put_linking_dict() -> "ray.ObjectRef":
    return ray.put(build_linking_dict())


class LinkerStage:
    """Adds ``<col>_id`` / ``<col>_canon`` for each configured surface column.

    Use ``fn_constructor_kwargs={"dict_ref": put_linking_dict(), "columns":
    [...]}`` so every actor fetches the broadcast dictionary once.
    """

    def __init__(self, dict_ref=None, columns=("subj", "obj")):
        if dict_ref is None:
            self.lookup = build_linking_dict()
        else:
            self.lookup = ray.get(dict_ref)
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        lookup = self.lookup
        for col in self.columns:
            surfaces = batch.column(col).to_pylist()
            ids: list[str] = []
            canons: list[str] = []
            for s in surfaces:
                hit = lookup.get(normalize_surface(s))
                if hit is None:
                    ids.append(NIL)
                    canons.append(normalize_surface(s))
                else:
                    ids.append(hit[0])
                    canons.append(hit[1])
            batch = batch.append_column(f"{col}_id", pa.array(ids, pa.string()))
            batch = batch.append_column(f"{col}_canon", pa.array(canons, pa.string()))
        return batch
