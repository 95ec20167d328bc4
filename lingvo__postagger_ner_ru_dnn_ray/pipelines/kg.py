"""The flagship pipeline: transcripts Parquet → knowledge-graph Parquet.

    read_parquet (column-pruned)
      -> [resume filter: drop conversations whose output partition is done]
      -> [optional sort(conv_id, turn_idx) — see run_kg_job(sort_turns=)]
      -> map_batches(tokenize_batch)      # stateless tasks, Arrow in/out
      -> map_batches(TaggerStage, concurrency=N)   # actor pool, 2 DNNs
      -> map_batches(triples_batch)       # per-sentence extraction
      -> map_batches(LinkerStage, ...)    # broadcast-dictionary hash join
      -> conflate (partial-agg + groupby) # edges / nodes
      -> write_parquet(partition_cols=[part]) + per-partition manifests

Partition id = crc32(conv_id) % P — a pure function of the data, so a
resumed run reproduces identical partition contents. Every map stage is
idempotent and deterministic (SURVEY.md §4 requirement).

Skew strategy (10^12-turn scale): extraction is PER-TURN (no cross-turn
state), so a 10^8-turn conversation never pins a worker — only the sort
needs conv locality, and Ray's sort range-partitions (conv_id, turn_idx)
so a huge conversation spreads across contiguous ranges. The entity/edge
conflation groupbys see skewed keys (hot entities), which the per-batch
partial aggregation collapses to one row per key per batch BEFORE the
shuffle — the combiner plays the role of salting (a salted two-phase
groupby would only be needed if a single batch couldn't hold one row per
distinct key, i.e. key cardinality ≈ batch size, which entity catalogs
don't approach).
"""
from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.conflate import EDGE_KEYS, conflate_edges, nodes_from_edges
from ..stages.linking import LinkerStage, put_linking_dict
from ..stages.mentions import mentions_batch
from ..stages.tag import TaggerStage
from ..stages.tokenize import tokenize_batch
from ..stages.triples import triples_batch
from ..state import manifest as mf

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def _crc_parts(conv_ids: list[str], p: int) -> np.ndarray:
    return np.array([zlib.crc32(c.encode("utf-8")) % p for c in conv_ids], dtype=np.int32)


def read_transcripts(input_path: str, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Column-pruned read. ``override_num_blocks`` sets shuffle/actor-pool
    granularity: an actor-pool task consumes one block, so blocks should
    outnumber pool actors ~8× to smooth stragglers (64 blocks over a
    30-actor pool = two waves + a long tail)."""
    return ray.data.read_parquet(
        input_path, columns=TRANSCRIPT_COLUMNS, override_num_blocks=override_num_blocks
    )


def tagged_sentences(
    ds: ray.data.Dataset,
    *,
    tag_concurrency: int | tuple[int, int] = 4,
    tag_batch_size: int = 512,
) -> ray.data.Dataset:
    ds = ds.map_batches(tokenize_batch, batch_format="pyarrow")
    return ds.map_batches(
        TaggerStage,
        batch_format="pyarrow",
        batch_size=tag_batch_size,
        concurrency=tag_concurrency,
    )


def linked_triples(
    sent_ds: ray.data.Dataset,
    *,
    link_concurrency: int | tuple[int, int] = 4,
    dict_ref=None,
) -> ray.data.Dataset:
    t = sent_ds.map_batches(triples_batch, batch_format="pyarrow")
    if dict_ref is None:
        dict_ref = put_linking_dict()
    # dict lookups are cheap: fractional CPU per linker actor so the pool
    # never starves the read/sort/write task operators (guide §actor-pools)
    return t.map_batches(
        LinkerStage,
        batch_format="pyarrow",
        concurrency=link_concurrency,
        num_cpus=0.25,
        fn_constructor_kwargs={"dict_ref": dict_ref, "columns": ("subj", "obj")},
    )


def mention_rows(sent_ds: ray.data.Dataset) -> ray.data.Dataset:
    return sent_ds.map_batches(mentions_batch, batch_format="pyarrow")


def fused_linked_triples(
    ds: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    dict_ref=None,
    artifact_dir: str | None = None,
) -> ray.data.Dataset:
    """transcripts → linked triples in ONE fused stage (stages/fused.py).

    Default (``concurrency=None``): stateless tasks with module-singleton
    state — warm workers are reused across executions and the scheduler
    uses every free CPU. Pass an int/tuple to run the KgStage actor pool
    instead — the layout for models shipped as external artifacts; give
    ``artifact_dir`` (see model/artifact.py) and each actor loads the
    sha-verified .npz weights once in __init__."""
    if concurrency is None:
        if artifact_dir is not None:
            raise ValueError(
                "artifact_dir requires the actor-pool mode (pass concurrency=): "
                "stateless-task mode uses the module-singleton lexicon taggers "
                "and would silently ignore the artifact weights"
            )
        from ..stages.fused import kg_stage_fn

        return ds.map_batches(kg_stage_fn, batch_format="pyarrow", batch_size=batch_size)
    from ..stages.fused import KgStage

    if dict_ref is None:
        dict_ref = put_linking_dict()
    return ds.map_batches(
        KgStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"dict_ref": dict_ref, "artifact_dir": artifact_dir},
    )


def _add_part(p: int):
    def fn(batch: pa.Table) -> pa.Table:
        parts = _crc_parts(batch.column("conv_id").to_pylist(), p)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    return fn


def _drop_done_parts(p: int, done: set[int]):
    done_arr = pa.array(sorted(done), pa.int32())

    def fn(batch: pa.Table) -> pa.Table:
        parts = pa.array(_crc_parts(batch.column("conv_id").to_pylist(), p), pa.int32())
        keep = pc.invert(pc.is_in(parts, value_set=done_arr))
        return batch.filter(keep)

    return fn


def _read_parts(base: str, parts: list[int], p: int) -> ray.data.Dataset:
    """Hive-partitioned read restricted to ``parts``. Fresh runs pass all
    ``p`` partitions -> plain full read (the benched hot path, unchanged).
    Resumes pass a subset -> full read + vectorized part filter
    (correctness over read pruning: hive partition dirs may legitimately
    hold zero data files — the manifest writer creates the dir even for
    empty partitions — so per-directory reads are brittle; the dropped
    rows never leave the first map)."""
    ds = ray.data.read_parquet(base)
    if len(parts) >= p:
        return ds
    want = pa.array([str(x) for x in parts], pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch.column("part"), pa.string())
        return batch.filter(pc.is_in(col, value_set=want))

    return ds.map_batches(keep, batch_format="pyarrow")


def run_kg_job(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    resume: bool = True,
    tag_concurrency: int | tuple[int, int] | None = None,
    tag_batch_size: int = 512,
    stats_out: list | None = None,
    sort_turns: bool = False,
    artifact_dir: str | None = None,
) -> dict:
    """End-to-end job: writes triples/, edges/, nodes/ under ``out_dir``,
    each hash-partitioned by conv_id (edges/nodes aggregated per partition —
    the global view is the sum over partitions) with lineage manifests.
    Returns summary counts. Idempotent: re-running after a partial failure
    completes only missing (table, partition) pairs — manifests publish
    PER TABLE right after that table's write, so a kill between stages
    resumes by rebuilding only the downstream aggregates from the written
    triples (the expensive tagging stage is skipped), partitions being
    (re)computed are cleared of any un-manifested orphan files a dead run
    flushed (a hive write would otherwise append beside them and
    double-count), and each aggregate stage reads ONLY the partitions it
    is rebuilding (deriving done partitions' aggregates again would
    append duplicates into their directories).

    ``sort_turns`` (default False) controls the global (conv_id,
    turn_idx) sort. Extraction is a pure per-turn function and every
    output row is uniquely keyed by (conv_id, turn_idx, sent_idx,
    triple_idx), so the emitted ROW SET — and the partitioned output
    files, keyed by hash(conv_id) — are identical either way (pinned by
    tests/test_pipeline_ray.py::test_kg_job_unsorted_equals_sorted): the
    stable-turn-ordering invariant is carried by the KEYS, not by
    physical block order. The sort was the single most expensive
    exchange in the job (≈40 s of a 63 s run at 32 CPUs on the
    960k-turn bench) and every downstream consumer is key-based, so the
    default skips it — "minimize shuffles" — and ``sort_turns=True``
    remains for consumers that want physically clustered conv ranges.
    ``stats_out``: optional list that
    receives (stage_name, ds.stats() text) per executed dataset — the
    epoch/throughput-counter surface (BaseSeq2SeqFramework.cs:261-321
    analogue) bench.py summarizes into its JSON."""
    p = num_partitions
    cfg = {"v": 1, "num_partitions": p, "input": str(input_path)}
    if artifact_dir is not None:
        # different weights -> different lineage: a resume must never mix
        # partitions produced by lexicon weights with artifact-loaded ones
        cfg["artifact_dir"] = str(artifact_dir)
    ch = mf.config_hash(cfg)
    tables = ("triples", "edges", "nodes")
    out = {t: str(Path(out_dir) / t) for t in tables}

    done_by = {t: (mf.completed_partitions(out[t], ch) if resume else set())
               for t in tables}
    done = done_by["triples"] & done_by["edges"] & done_by["nodes"]
    todo = sorted(set(range(p)) - done)
    if not todo:
        return {"skipped": True, "partitions_done": sorted(done)}
    # per-TABLE work lists: a kill between stage writes leaves e.g. triples
    # manifested but edges/nodes not — the resume then skips the expensive
    # tagging stage entirely and rebuilds only the downstream aggregates
    # from the written triples (manifests publish PER TABLE, right after
    # that table's write, below)
    need = {t: [part for part in todo if part not in done_by[t]] for t in tables}

    # crash hygiene: a killed run may have flushed partition files WITHOUT
    # publishing their manifests, and a config change reuses partition
    # paths with stale contents — either way write_parquet(partition_cols=)
    # would APPEND beside the orphans and duplicate rows in the read-back
    # view (for out-of-range stale dirs, the aggregate stages' full read
    # would also double-count: a previous num_partitions=8 run's part=4..7
    # holds the same conversations a num_partitions=4 rerun hashes into
    # part=0..3). Invariant after this pass: every partition dir present
    # under out_dir holds a complete SAME-CONFIG manifest — anything else
    # (orphans of a dead run, any-config stale dirs, out-of-range parts)
    # is cleared; done partitions are never touched.
    import shutil as _shutil

    for t in tables:
        root = Path(out[t])
        if not root.exists():
            continue
        for pdir in root.glob("part=*"):
            try:
                part = int(pdir.name.split("=", 1)[1])
            except ValueError:
                part = -1
            if part not in done_by[t]:
                if pdir.is_dir() and not pdir.is_symlink():
                    _shutil.rmtree(pdir)
                else:  # stray file / dangling or linked entry: heal, not crash
                    pdir.unlink()

    def _publish(table: str) -> None:
        for part in need[table]:
            mf.write_manifest(out[table], part, ch, inputs=cfg)

    if need["triples"]:
        if tag_concurrency is None:
            pool = int(ray.cluster_resources().get("CPU", 8))
        else:
            pool = tag_concurrency if isinstance(tag_concurrency, int) else tag_concurrency[-1]
        ds = read_transcripts(input_path, override_num_blocks=max(64, pool * 8))
        skip = set(range(p)) - set(need["triples"])
        if skip:
            ds = ds.map_batches(_drop_done_parts(p, skip), batch_format="pyarrow")
        if sort_turns:
            ds = ds.sort(["conv_id", "turn_idx"])

        triples = fused_linked_triples(
            ds, concurrency=tag_concurrency, batch_size=tag_batch_size,
            artifact_dir=artifact_dir,
        )
        triples = triples.map_batches(_add_part(p), batch_format="pyarrow")
        # coalesce before the hive-partitioned write: N blocks × P partition
        # values would otherwise explode into N·P tiny files (a 4000-file
        # 60 MB table costs more to re-open than to aggregate)
        triples = triples.repartition(max(p, 16))

        # write triples once; aggregate edges from the written Parquet;
        # derive nodes from the (already aggregated, small) edges table —
        # each triple contributes 1 to each endpoint, so per-endpoint sum
        # of edge weights equals conflate_nodes over the raw triples (one
        # fewer full pass)
        triples.write_parquet(out["triples"], partition_cols=["part"])
        if stats_out is not None:
            stats_out.append(("triples", triples.stats()))
        _publish("triples")

    if need["edges"]:
        tri_written = _read_parts(out["triples"], need["edges"], p)
        # NOTE: a repartition(1) single-task final combine
        # (conflate._single_task_agg) was tried here and REJECTED by a
        # temporally-adjacent A/B at 240k turns / 32 CPUs: 19.9 s vs 11.3 s
        # for the salted exchange (and 66.7 vs 40.9 in a steal band). The
        # single collector task serializes the combine AND the downstream
        # write, which costs more than the sort barrier it saves; the
        # salted exchange keeps combine + write parallel.
        edges_ds = conflate_edges(tri_written, extra_keys=["part"])
        edges_ds.write_parquet(out["edges"], partition_cols=["part"])
        if stats_out is not None:
            stats_out.append(("edges", edges_ds.stats()))
        _publish("edges")

    if need["nodes"]:
        edges_written = _read_parts(out["edges"], need["nodes"], p)
        nodes_ds = nodes_from_edges(edges_written, extra_keys=["part"])
        nodes_ds.write_parquet(out["nodes"], partition_cols=["part"])
        if stats_out is not None:
            stats_out.append(("nodes", nodes_ds.stats()))
        _publish("nodes")

    import json as _json

    rows = {}
    for t in tables:
        n = 0
        for part in todo:
            mp = mf.partition_dir(out[t], part) / mf.MANIFEST_NAME
            n += _json.loads(mp.read_text())["rows"]
        rows[t] = n
    return {"skipped": False, "partitions_done": sorted(done), "partitions_run": todo, "rows": rows}


def _assert_disjoint_runs(run_dirs: list[str]) -> None:
    """Raise if two delta runs share a conversation — merged edge weights
    would silently double-count. Two layers:

    1. manifest fast path: identical triples config hashes AND identical
       per-partition content stats (rows + file layout from the
       manifests) raise without touching data — the same input truly
       processed twice. A config-hash collision with DIFFERENT content
       (two disjoint drops staged through the same overwritten input
       path share {v, partitions, path}) only warns and falls through to
       the exact check, which decides;
    2. exact check: column-pruned read of each run's triples ``conv_id``
       only, per-batch distinct partials tagged with their run index,
       one salted exchange over O(distinct convs x runs) rows, raise on
       any conv seen in >= 2 runs. No driver pull beyond a 5-row sample
       of the violations. A run dir whose triples/ directory is absent
       (pruned fact log / edges-only run) is skipped with a warning —
       the merge itself only reads edges/.
    """
    import json as _json
    import warnings

    import numpy as np
    import pandas as pd

    seen_cfg: dict[str, tuple[str, str]] = {}  # cfg_hash -> (dir, content_fp)
    for d in run_dirs:
        sig: list = []
        chs: set[str] = set()
        for mpath in sorted(Path(d).glob("triples/part=*/" + mf.MANIFEST_NAME)):
            try:
                m = _json.loads(mpath.read_text())
            except (OSError, _json.JSONDecodeError):
                continue
            if m.get("config_hash"):
                chs.add(m["config_hash"])
                sig.append([m.get("partition"), m.get("rows"),
                            [[f.get("name"), f.get("rows")] for f in m.get("files", [])]])
        fp = mf.config_hash({"sig": sig})
        for ch in chs:
            if ch in seen_cfg and seen_cfg[ch][0] != d:
                if seen_cfg[ch][1] == fp:
                    raise ValueError(
                        f"merge_kg_runs: runs {seen_cfg[ch][0]!r} and {d!r} carry the "
                        f"same triples config hash {ch} and identical content stats — "
                        "the same input was processed twice; deltas must cover "
                        "disjoint conversation sets"
                    )
                warnings.warn(
                    f"merge_kg_runs: runs {seen_cfg[ch][0]!r} and {d!r} share triples "
                    f"config hash {ch} but differ in content (same staging path "
                    "reused?) — relying on the exact conv_id overlap check",
                    stacklevel=2,
                )
            else:
                seen_cfg[ch] = (d, fp)

    parts: list[ray.data.Dataset] = []
    for i, d in enumerate(run_dirs):
        if not Path(d, "triples").exists():
            warnings.warn(
                f"merge_kg_runs: {d!r} has no triples/ directory (edges-only or "
                "pruned run) — skipping its exact conv_id overlap check",
                stacklevel=2,
            )
            continue
        ds = ray.data.read_parquet(f"{d}/triples", columns=["conv_id"])

        def distinct_tag(batch: pa.Table, run: int = i) -> pa.Table:
            u = pc.unique(batch.column("conv_id"))
            h = pd.util.hash_pandas_object(
                pd.Series(u.to_pandas()), index=False
            ).to_numpy()
            return pa.Table.from_arrays(
                [u, pa.array(np.full(len(u), run, dtype=np.int32)),
                 pa.array((h % 512).astype("int64"))],
                names=["conv_id", "run", "salt"],
            )

        parts.append(ds.map_batches(distinct_tag, batch_format="pyarrow"))
    if len(parts) < 2:
        if len(run_dirs) >= 2:
            warnings.warn(
                "merge_kg_runs: fewer than 2 runs have a readable triples/ "
                "directory — the exact conv_id overlap check is VACUOUS for "
                "this merge; disjointness is the caller's responsibility",
                stacklevel=2,
            )
        return  # 0/1 checkable runs: nothing left to compare
    tagged = parts[0]
    for p_ in parts[1:]:
        tagged = tagged.union(p_)

    def overlaps(g: pd.DataFrame) -> pd.DataFrame:
        vc = g.drop_duplicates(["conv_id", "run"]).groupby("conv_id")["run"].nunique()
        bad = vc[vc > 1].index
        return pd.DataFrame({"conv_id": pd.Series(bad, dtype=g["conv_id"].dtype)})

    bad_rows = (
        tagged.groupby("salt")
        .map_groups(overlaps, batch_format="pandas")
        .take(5)
    )
    if bad_rows:
        sample = [r["conv_id"] for r in bad_rows]
        raise ValueError(
            "merge_kg_runs: delta runs overlap — conversations present in "
            f">=2 runs (sample: {sample}); merging would double-count edge "
            "weights. Pass check_overlap=False only for provably disjoint drops."
        )


def merge_kg_runs(
    run_dirs: list[str], out_dir: str, *, check_overlap: bool = True,
    overwrite: bool = False,
) -> dict:
    """Incremental KG maintenance: merge the AGGREGATED graph views of
    several delta runs (disjoint conversation sets — e.g. daily transcript
    drops each processed by ``run_kg_job``) into one edges/nodes view
    WITHOUT re-running extraction.

    ``check_overlap`` (default on) verifies the disjointness contract
    (see ``_assert_disjoint_runs``) — exact, column-pruned, one salted
    exchange bounded by distinct conversations, raising before any output
    is written. Disable only when disjointness is guaranteed upstream.

    Edge rows are already partial aggregates keyed (part, subj_id, pred,
    obj_id) with mergeable stats (weight = sum, canon/type = min), so the
    merge is exactly one salted final combine over the concatenated edge
    tables — input size O(distinct edges), never O(triples). Nodes are
    re-derived from the merged edges (each triple contributes 1 to each
    endpoint, same identity ``run_kg_job`` uses). Triples stay where each
    delta wrote them: they are an append-only fact log partitioned by
    hash(conv_id), and conversation-disjoint deltas never produce the
    same triple twice, so their union needs no rewrite.

    ``out_dir`` must not already hold edges/ or nodes/ partitions:
    write_parquet(partition_cols=) APPENDS files beside existing ones, so
    merging into a previous merge's directory would silently double the
    read-back view. Non-empty targets raise; ``overwrite=True`` replaces
    them atomically-enough (rmtree then write).

    This merged-view-equals-one-shot-run identity is pinned by
    tests/test_pipeline_ray.py::test_kg_incremental_merge."""
    import shutil

    from ..stages.conflate import _salted_final_agg

    # duplicate run dirs are the cheapest-to-catch double-count (and would
    # dodge the exact check entirely when their triples/ were pruned)
    seen_paths: set[str] = set()
    for d in run_dirs:
        rp = str(Path(d).resolve())
        if rp in seen_paths:
            raise ValueError(f"merge_kg_runs: {d!r} appears twice in run_dirs")
        seen_paths.add(rp)
    if str(Path(out_dir).resolve()) in seen_paths:
        raise ValueError(
            "merge_kg_runs: out_dir is one of the input run dirs — the "
            "merged write (or an overwrite rmtree) would clobber an input"
        )
    # validate the non-destructive preconditions FIRST: a failed overlap
    # check must leave a pre-existing merged view intact, so the
    # overwrite rmtree happens only after every check has passed (and
    # reads of the run dirs happen before anything under out_dir is
    # touched, in case out_dir nests near an input)
    for t in ("edges", "nodes"):
        tdir = Path(out_dir) / t
        if tdir.exists() and any(tdir.iterdir()) and not overwrite:
            raise FileExistsError(
                f"merge_kg_runs: {tdir} already contains output — a hive "
                "write would append beside it and double-count the merged "
                "view. Pass overwrite=True to replace, or merge into a "
                "fresh out_dir."
            )
    if check_overlap:
        _assert_disjoint_runs(run_dirs)
    for t in ("edges", "nodes"):
        tdir = Path(out_dir) / t
        if tdir.exists() and any(tdir.iterdir()):
            shutil.rmtree(tdir)
    reads = [ray.data.read_parquet(f"{d}/edges") for d in run_dirs]
    edges = reads[0]
    for r in reads[1:]:
        edges = edges.union(r)
    keys = ["part"] + EDGE_KEYS
    merged = _salted_final_agg(
        edges, keys,
        sums=["weight"],
        mins=["subj_type", "obj_type", "subj_canon", "obj_canon"],
    )
    out = {t: str(Path(out_dir) / t) for t in ("edges", "nodes")}
    merged.write_parquet(out["edges"], partition_cols=["part"])
    edges_written = ray.data.read_parquet(out["edges"])
    nodes_ds = nodes_from_edges(edges_written, extra_keys=["part"])
    nodes_ds.write_parquet(out["nodes"], partition_cols=["part"])
    return {
        "edges": ray.data.read_parquet(out["edges"]).count(),
        "nodes": ray.data.read_parquet(out["nodes"]).count(),
        "triples_dirs": [f"{d}/triples" for d in run_dirs],
    }


def _main() -> None:
    """CLI driver — `ray job submit -- python -m \
    lingvo__postagger_ner_ru_dnn_ray.pipelines.kg --input DIR --out DIR`.
    Owns its Ray session (guarded); library callers never init Ray."""
    import argparse
    import json

    parser = argparse.ArgumentParser(description="KG construction job")
    parser.add_argument("--input", required=True, help="transcript Parquet dir")
    parser.add_argument("--out", required=True, help="output dir (triples/edges/nodes)")
    parser.add_argument("--partitions", type=int, default=16)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args()

    import ray as _ray

    if not _ray.is_initialized():
        _ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    res = run_kg_job(
        args.input,
        args.out,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        tag_batch_size=args.batch_size,
    )
    print(json.dumps(res))
    _ray.shutdown()


if __name__ == "__main__":
    _main()
