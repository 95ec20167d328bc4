"""Single-process oracle: the same pure per-record transforms run
sequentially in plain Python (no Ray) over a pyarrow Table.

This is FIXTURES.md F5's golden generator: the distributed pipeline at any
parallelism must produce exactly these tables (compared order-insensitively)
— the test that partitioning, shuffles and actor pools add no
nondeterminism. The reference's analogous oracle is its single-threaded
console path (ConsoleDemo/Program.cs:243-315).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.conflate import edge_partials, node_partials
from ..stages.linking import LinkerStage
from ..stages.mentions import mentions_batch
from ..stages.tag import TaggerStage
from ..stages.tokenize import tokenize_batch
from ..stages.triples import triples_batch


def oracle_tables(transcripts: pa.Table) -> dict[str, pa.Table]:
    """sentences, mentions, triples, edges, nodes from a transcripts table."""
    transcripts = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    sents = tokenize_batch(transcripts)
    sents = TaggerStage()(sents)
    mentions = mentions_batch(sents)
    triples = triples_batch(sents)
    triples = LinkerStage(None)(triples)

    # final aggregates: the per-batch partial over the WHOLE table is exact
    edges = edge_partials(triples)
    edges = edges.sort_by([(c, "ascending") for c in ("subj_id", "pred", "obj_id")])
    nodes = node_partials(triples)
    nodes = nodes.sort_by([("entity_id", "ascending")])
    return {
        "sentences": sents,
        "mentions": mentions,
        "triples": triples,
        "edges": edges,
        "nodes": nodes,
    }


def pos_label_counts(sents: pa.Table) -> pa.Table:
    """Token count per corrected POS label (validation-metric shaped)."""
    flat = pc.list_flatten(sents.column("pos"))
    t = pa.Table.from_arrays([flat], names=["pos"])
    g = t.group_by(["pos"]).aggregate([([], "count_all")])
    return g.rename_columns(["pos", "n_tokens"]).sort_by([("pos", "ascending")])
