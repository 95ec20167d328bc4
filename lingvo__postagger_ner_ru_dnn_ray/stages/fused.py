"""Fused per-turn stage: tokenize → tag → extract triples → link, in ONE
actor-pool ``map_batches``.

The modular stages (stages/tokenize|tag|triples|linking) are composable
and individually testable, but chaining them as separate operators splits
the cluster between an actor pool and task pools — whichever side is
under-provisioned becomes the bottleneck. Since every step after the read
is a pure per-turn function, fusing them into one callable class lets the
single actor pool own all CPUs minus the read/sort/write tasks, which is
what a 256-node deployment would run.

Equivalence with the modular chain is BY CONSTRUCTION (the fused __call__
invokes the exact same stage callables) and asserted in
tests/test_pipeline_ray.py::test_fused_equals_modular.
"""
from __future__ import annotations

import pyarrow as pa

from .linking import LinkerStage
from .tag import TaggerStage
from .tokenize import tokenize_batch
from .triples import triples_batch


class KgStage:
    """transcript rows -> linked triple rows (one actor = both DNNs + the
    broadcast entity dictionary, loaded once)."""

    def __init__(self, dict_ref=None, artifact_dir: str | None = None):
        self.tagger = TaggerStage(artifact_dir=artifact_dir)
        self.linker = LinkerStage(dict_ref=dict_ref, columns=("subj", "obj"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sents = tokenize_batch(batch)
        tagged = self.tagger(sents)
        triples = triples_batch(tagged)
        return self.linker(triples)


_FUSED_SINGLETON: KgStage | None = None


def kg_stage_fn(batch: pa.Table) -> pa.Table:
    """Stateless-TASK variant of KgStage: state lives in a module-level
    singleton built once per WORKER PROCESS (Ray task workers are reused
    across executions, so a warm cluster pays zero per-execution actor
    startup, and the scheduler spreads tasks over every free CPU with no
    pool-size tuning). Valid here because the models + dictionary are
    deterministic module-level constructibles; a model shipped as a large
    external artifact would use the KgStage actor + ray.put broadcast
    instead."""
    global _FUSED_SINGLETON
    if _FUSED_SINGLETON is None:
        _FUSED_SINGLETON = KgStage(dict_ref=None)
    return _FUSED_SINGLETON(batch)
