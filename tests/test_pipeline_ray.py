"""End-to-end distributed tests: the Ray pipeline must equal the
single-process oracle exactly, at different block/parallelism layouts, and
resume must complete only missing partitions (FIXTURES.md F5/F6)."""
import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest
import ray.data

from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import (
    linked_triples,
    mention_rows,
    read_transcripts,
    run_kg_job,
    tagged_sentences,
)
from lingvo__postagger_ner_ru_dnn_ray.pipelines.oracle import oracle_tables
from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import (
    ensure_transcripts,
    synth_transcripts_table,
)
from lingvo__postagger_ner_ru_dnn_ray.stages.mentions import decode_bio

N_TURNS = 300
SEED = 7


@pytest.fixture(scope="module")
def fixture_path(ray_session):
    return ensure_transcripts(N_TURNS, seed=SEED, n_files=4)


@pytest.fixture(scope="module")
def oracle(fixture_path):
    return oracle_tables(synth_transcripts_table(N_TURNS, seed=SEED))


def _sorted_df(tbl, keys):
    df = tbl.to_pandas() if not hasattr(tbl, "sort_values") else tbl
    return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]


TRIPLE_KEYS = ["conv_id", "turn_idx", "sent_idx", "triple_idx"]


@pytest.mark.parametrize("num_blocks", [2, 16])
def test_distributed_equals_oracle(fixture_path, oracle, num_blocks):
    ds = read_transcripts(fixture_path).repartition(num_blocks)
    ds = ds.sort(["conv_id", "turn_idx"])
    sents = tagged_sentences(ds, tag_concurrency=2, tag_batch_size=64)
    tri = linked_triples(sents).to_pandas()
    want = oracle["triples"].to_pandas()
    assert _sorted_df(tri, TRIPLE_KEYS).equals(_sorted_df(want, TRIPLE_KEYS))


@pytest.mark.parametrize("concurrency", [None, 2])  # task mode and actor pool
def test_fused_equals_modular(fixture_path, oracle, concurrency):
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import fused_linked_triples

    ds = read_transcripts(fixture_path).sort(["conv_id", "turn_idx"])
    tri = fused_linked_triples(ds, concurrency=concurrency, batch_size=64).to_pandas()
    want = oracle["triples"].to_pandas()
    assert _sorted_df(tri, TRIPLE_KEYS).equals(_sorted_df(want, TRIPLE_KEYS))


def test_fused_actor_pool_from_artifact(fixture_path, oracle, tmp_path_factory):
    """Actor-pool mode loading the sha-verified .npz artifacts in actor
    __init__ (the production model-shipped-as-file path) must reproduce
    the oracle exactly."""
    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import ensure_default_artifacts
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import fused_linked_triples

    adir = ensure_default_artifacts(tmp_path_factory.mktemp("models"))
    ds = read_transcripts(fixture_path).sort(["conv_id", "turn_idx"])
    tri = fused_linked_triples(
        ds, concurrency=2, batch_size=64, artifact_dir=adir
    ).to_pandas()
    want = oracle["triples"].to_pandas()
    assert _sorted_df(tri, TRIPLE_KEYS).equals(_sorted_df(want, TRIPLE_KEYS))


def test_mentions_match_oracle(fixture_path, oracle):
    ds = read_transcripts(fixture_path).sort(["conv_id", "turn_idx"])
    m = mention_rows(tagged_sentences(ds, tag_concurrency=2)).to_pandas()
    want = oracle["mentions"].to_pandas()
    keys = ["conv_id", "turn_idx", "sent_idx", "mention_idx"]
    assert _sorted_df(m, keys).equals(_sorted_df(want, keys))


def test_bio_decode():
    assert decode_bio(["O", "B-PER", "I-PER", "O", "B-LOC"]) == [(1, 3, "PER"), (4, 5, "LOC")]
    # leading I- repairs to a span start; type switch without B starts new span
    assert decode_bio(["I-ORG", "I-PER"]) == [(0, 1, "ORG"), (1, 2, "PER")]
    assert decode_bio(["B-PER", "B-PER"]) == [(0, 1, "PER"), (1, 2, "PER")]
    assert decode_bio([]) == []


def test_kg_job_and_resume(fixture_path, oracle, tmp_path):
    out = tmp_path / "kg"
    res = run_kg_job(fixture_path, str(out), num_partitions=4, tag_concurrency=2)
    assert res["rows"]["triples"] == oracle["triples"].num_rows

    full_triples = pq.read_table(out / "triples").drop(["part"])
    assert _sorted_df(full_triples, TRIPLE_KEYS).equals(
        _sorted_df(oracle["triples"], TRIPLE_KEYS)
    )

    # second run is a no-op (all manifests complete)
    res2 = run_kg_job(fixture_path, str(out), num_partitions=4)
    assert res2["skipped"]

    # kill-simulation: destroy partitions 1 and 2, resume rebuilds ONLY them
    untouched = (out / "triples" / "part=0" / "_manifest.json").stat().st_mtime_ns
    EDGE_SORT = ["part", "subj_id", "pred", "obj_id"]
    full_edges = pq.read_table(out / "edges")
    for t in ("triples", "edges", "nodes"):
        for p in (1, 2):
            shutil.rmtree(out / t / f"part={p}", ignore_errors=True)
    res3 = run_kg_job(fixture_path, str(out), num_partitions=4, tag_concurrency=2)
    assert res3["partitions_run"] == [1, 2]
    assert (out / "triples" / "part=0" / "_manifest.json").stat().st_mtime_ns == untouched

    resumed = pq.read_table(out / "triples").drop(["part"])
    assert _sorted_df(resumed, TRIPLE_KEYS).equals(_sorted_df(full_triples, TRIPLE_KEYS))
    # the aggregate tables must NOT double-count the untouched partitions:
    # the pre-fix resume derived edges from the FULL triples read and the
    # hive write appended duplicates into done edges/nodes partitions
    # (found by an end-of-round SIGKILL stress: part=0 weights doubled)
    resumed_edges = pq.read_table(out / "edges")
    assert _sorted_df(resumed_edges, EDGE_SORT).equals(
        _sorted_df(full_edges, EDGE_SORT)
    ), "resume duplicated edges in already-complete partitions"

    # staged manifests: triples complete but edges/nodes destroyed -> the
    # resume must rebuild aggregates WITHOUT re-running the tagging stage
    for t in ("edges", "nodes"):
        for p in range(4):
            shutil.rmtree(out / t / f"part={p}", ignore_errors=True)
    stats3: list = []
    res_staged = run_kg_job(fixture_path, str(out), num_partitions=4,
                            tag_concurrency=2, stats_out=stats3)
    assert res_staged["partitions_run"] == [0, 1, 2, 3]
    assert [s[0] for s in stats3] == ["edges", "nodes"], (
        "tag-skip resume must not execute the triples stage"
    )
    assert _sorted_df(pq.read_table(out / "edges"), EDGE_SORT).equals(
        _sorted_df(full_edges, EDGE_SORT)
    )

    m = json.loads((out / "edges" / "part=3" / "_manifest.json").read_text())
    assert m["complete"] and m["rows"] >= 0 and m["config_hash"]

    # REAL crash shape: a killed run leaves partition files WITHOUT a
    # manifest (manifests publish last). The resume must clear such
    # orphans before re-writing, or the hive append would duplicate
    # every row the dead run had flushed.
    orphan_dir = out / "triples" / "part=1"
    orphan_rows = pq.read_table(orphan_dir).num_rows
    (orphan_dir / "_manifest.json").unlink()
    src = next(f for f in orphan_dir.glob("*.parquet"))
    shutil.copy(src, orphan_dir / "orphan_from_dead_run.parquet")
    res4 = run_kg_job(fixture_path, str(out), num_partitions=4, tag_concurrency=2)
    assert res4["partitions_run"] == [1]
    assert pq.read_table(orphan_dir).num_rows == orphan_rows, (
        "resume must not append beside a dead run's orphan files"
    )
    resumed2 = pq.read_table(out / "triples").drop(["part"])
    assert _sorted_df(resumed2, TRIPLE_KEYS).equals(_sorted_df(full_triples, TRIPLE_KEYS))


def test_kg_job_repartition_reuse(fixture_path, oracle, tmp_path):
    """Reusing an out_dir with a SMALLER num_partitions must clear the old
    run's out-of-range part dirs: the aggregate stages full-read the
    triples dir, so stale part=2..3 rows (same conversations, re-hashed
    into part=0..1 by the new config) would silently double every edge
    weight in the read-back view."""
    out = tmp_path / "kg_shrink"
    run_kg_job(fixture_path, str(out), num_partitions=4, tag_concurrency=2)
    res = run_kg_job(fixture_path, str(out), num_partitions=2, tag_concurrency=2)
    assert res["partitions_run"] == [0, 1]
    for t in ("triples", "edges", "nodes"):
        assert sorted(d.name for d in (out / t).glob("part=*")) == ["part=0", "part=1"], t
    got = pq.read_table(out / "triples").drop(["part"])
    assert _sorted_df(got, TRIPLE_KEYS).equals(
        _sorted_df(oracle["triples"], TRIPLE_KEYS)
    )
    # edge weights must equal the oracle-derived conflation, not 2x
    got_e = pq.read_table(out / "edges").to_pandas()
    assert int(got_e["weight"].sum()) == oracle["triples"].num_rows


def test_edges_nodes_global_view(fixture_path, oracle, tmp_path):
    out = tmp_path / "kg2"
    run_kg_job(fixture_path, str(out), num_partitions=2, tag_concurrency=2)
    e = pq.read_table(out / "edges").to_pandas()
    e_glob = e.groupby(["subj_id", "pred", "obj_id"], as_index=False).agg(
        weight=("weight", "sum"),
        subj_type=("subj_type", "min"),
        obj_type=("obj_type", "min"),
        subj_canon=("subj_canon", "min"),
        obj_canon=("obj_canon", "min"),
    )
    keys = ["subj_id", "pred", "obj_id"]
    assert _sorted_df(e_glob, keys).equals(_sorted_df(oracle["edges"], keys))

    n = pq.read_table(out / "nodes").to_pandas()
    n_glob = n.groupby(["entity_id"], as_index=False).agg(
        n_mentions=("n_mentions", "sum"),
        canonical=("canonical", "min"),
        type=("type", "min"),
    )
    assert _sorted_df(n_glob, ["entity_id"]).equals(_sorted_df(oracle["nodes"], ["entity_id"]))


def test_long_turn_chunking_e2e(ray_session):
    """A turn with a 500+-token sentence exercises Predict_Full chunking
    (SeqLabel.cs:259-311) through the full distributed pipeline."""
    import pyarrow as pa
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import fused_linked_triples
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.oracle import oracle_tables

    long_text = " ".join(["Сергей Козлов посетил Москву и"] * 100) + " уехал."
    tbl = pa.table(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "assistant"],
            "text": [long_text, "Иван Смирнов основал «Газпром»."],
            "tool": ["", ""],
            "ts": pa.array([0, 1], pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = fused_linked_triples(ds, batch_size=8).to_pandas()
    want = oracle_tables(tbl)["triples"].to_pandas()
    keys = ["conv_id", "turn_idx", "sent_idx", "triple_idx"]
    assert len(got) == len(want) > 50
    assert _sorted_df(got, keys).equals(_sorted_df(want, keys))


def test_driver_entry_contract(ray_session):
    """The driver smoke-check: entry() runs under an already-initialised
    Ray session and yields rows with a stable schema."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    cols = set(ds.schema().names)
    assert {"conv_id", "turn_idx", "subj", "pred", "obj", "subj_id", "obj_id"} <= cols
    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)  # every oracle has a query
    assert len(qs) >= 25


def test_extreme_conv_skew(ray_session, tmp_path):
    """One conversation owns ~95% of all turns (the 10^8-turn-conv story):
    the job must still partition, aggregate and match the oracle exactly —
    AND no single fused-stage task may process a disproportionate share.
    Work is split by row ranges (sort_turns=False default), never by
    conv_id, so a giant conversation spreads across tasks; the per-task
    row stats from ds.stats() pin that property (SURVEY §4)."""
    import re

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from lingvo__postagger_ner_ru_dnn_ray.pipelines.oracle import oracle_tables
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import synth_transcripts_table

    base = synth_transcripts_table(3000, seed=11).to_pandas()
    idx = base.index[: int(len(base) * 0.95)]
    base.loc[idx, "conv_id"] = "conv-hot"
    base.loc[idx, "turn_idx"] = np.arange(len(idx), dtype="int32")
    tbl = pa.Table.from_pandas(base, preserve_index=False)
    tbl = tbl.set_column(1, "turn_idx", tbl.column("turn_idx").cast(pa.int32()))

    src = tmp_path / "skew"
    src.mkdir()
    pq_mod.write_table(tbl, src / "part-0.parquet")

    out = tmp_path / "kg_skew"
    stats: list = []
    run_kg_job(str(src), str(out), num_partitions=4, tag_concurrency=2,
               stats_out=stats)
    got = pq_mod.read_table(out / "triples").drop(["part"])
    want = oracle_tables(tbl)["triples"]
    assert _sorted_df(got, TRIPLE_KEYS).equals(_sorted_df(want, TRIPLE_KEYS))

    # fused-stage task balance: max per-task rows <= 2x mean, several tasks
    triples_stats = dict(stats)["triples"]
    m = re.search(
        r"MapBatches\(KgStage\).*?Output rows per task: (\d+) min, (\d+) max, "
        r"(\d+) mean, (\d+) tasks used",
        triples_stats, re.S,
    )
    assert m, triples_stats[:2000]
    t_min, t_max, t_mean, n_tasks = map(int, m.groups())
    assert n_tasks >= 2
    assert t_max <= 2 * t_mean, (t_min, t_max, t_mean, n_tasks)


def test_deep_fused_equals_modular_chain(fixture_path, oracle):
    """The deep-fused single-pass path (Python structures end to end, one
    Arrow build) must be column-for-column identical to the stage-by-stage
    composition it replaces."""
    import pyarrow as pa

    from lingvo__postagger_ner_ru_dnn_ray.stages.fused import KgStage

    stage = KgStage()
    tbl = pa.concat_tables(
        [b for b in read_transcripts(fixture_path).sort(["conv_id", "turn_idx"])
         .to_pandas().pipe(lambda df: [pa.Table.from_pandas(df, preserve_index=False)])]
    )
    deep = stage(tbl).to_pandas()
    modular = stage.call_modular(tbl).to_pandas()
    assert list(deep.columns) == list(modular.columns)
    k = TRIPLE_KEYS
    assert _sorted_df(deep, k).equals(_sorted_df(modular, k))


def test_kg_job_unsorted_equals_sorted(fixture_path, tmp_path):
    """The global (conv_id, turn_idx) sort is physical layout only: with
    or without it, the job emits the identical keyed ROW SET into the
    identical hash(conv_id) partitions — the stable-turn-ordering
    invariant lives in the keys. This pins the sort_turns=False default
    of run_kg_job."""
    out_a = tmp_path / "kg_sorted"
    out_b = tmp_path / "kg_unsorted"
    run_kg_job(fixture_path, str(out_a), num_partitions=4, tag_concurrency=2,
               sort_turns=True)
    run_kg_job(fixture_path, str(out_b), num_partitions=4, tag_concurrency=2,
               sort_turns=False)
    for table, keys in (
        ("triples", TRIPLE_KEYS + ["part"]),
        ("edges", ["part", "subj_id", "pred", "obj_id"]),
        ("nodes", ["part", "entity_id"]),
    ):
        a = pq.read_table(out_a / table)
        b = pq.read_table(out_b / table)
        assert _sorted_df(a, keys).equals(_sorted_df(b, keys)), table


def test_kg_incremental_merge(ray_session, tmp_path):
    """Incremental maintenance: two conversation-disjoint delta runs,
    merged by merge_kg_runs over the AGGREGATED edge tables only, must
    produce byte-identical edges/nodes to one job over the full input."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import merge_kg_runs

    base = synth_transcripts_table(400, seed=13).to_pandas()
    convs = sorted(base["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    for name, mask in (("a", base["conv_id"].isin(half)),
                       ("b", ~base["conv_id"].isin(half)),
                       ("full", base["conv_id"].notna())):
        d = tmp_path / f"src_{name}"
        d.mkdir()
        t = pa.Table.from_pandas(base[mask], preserve_index=False)
        t = t.set_column(
            t.schema.get_field_index("turn_idx"), "turn_idx",
            t.column("turn_idx").cast(pa.int32()),
        )
        pq_mod.write_table(t, d / "part-0.parquet")

    outs = {}
    for name in ("a", "b", "full"):
        outs[name] = tmp_path / f"kg_{name}"
        run_kg_job(str(tmp_path / f"src_{name}"), str(outs[name]),
                   num_partitions=4, tag_concurrency=2)

    merged = tmp_path / "kg_merged"
    res = merge_kg_runs([str(outs["a"]), str(outs["b"])], str(merged))
    assert res["edges"] > 0 and res["nodes"] > 0

    for t, keys in (("edges", ["part", "subj_id", "pred", "obj_id"]),
                    ("nodes", ["part", "entity_id"])):
        got = pq_mod.read_table(merged / t).to_pandas()
        want = pq_mod.read_table(outs["full"] / t).to_pandas()
        got["part"] = got["part"].astype("int64")
        want["part"] = want["part"].astype("int64")
        assert _sorted_df(got, keys).equals(_sorted_df(want, keys)), t

    # overlapping deltas must raise BEFORE writing anything: run "a" and
    # the full run share conversations, so merging them would silently
    # double-count edge weights
    with pytest.raises(ValueError, match="overlap|processed twice"):
        merge_kg_runs([str(outs["a"]), str(outs["full"])],
                      str(tmp_path / "kg_bad"))
    assert not (tmp_path / "kg_bad" / "edges").exists()
    # merging the SAME run twice is the same mistake — caught upfront by
    # the duplicate-path guard (works even for pruned edges-only runs
    # that the manifest/exact checks can't see)
    with pytest.raises(ValueError, match="appears twice"):
        merge_kg_runs([str(outs["a"]), str(outs["a"])],
                      str(tmp_path / "kg_bad2"))
    # out_dir colliding with an input would rmtree an input on overwrite
    with pytest.raises(ValueError, match="out_dir is one of"):
        merge_kg_runs([str(outs["a"]), str(outs["b"])], str(outs["a"]),
                      overwrite=True)
    # a FAILED overlap check must leave a pre-existing merged view intact
    # even with overwrite=True (validation precedes the destructive rmtree)
    merged_keep = tmp_path / "kg_keep"
    merge_kg_runs([str(outs["a"]), str(outs["b"])], str(merged_keep))
    before = sorted(p.name for p in (merged_keep / "edges").rglob("*.parquet"))
    with pytest.raises(ValueError, match="overlap|processed twice"):
        merge_kg_runs([str(outs["a"]), str(outs["full"])], str(merged_keep),
                      overwrite=True)
    after = sorted(p.name for p in (merged_keep / "edges").rglob("*.parquet"))
    assert before == after and before, "failed check must not destroy output"


def test_kg_merge_output_guard_and_pruned_triples(ray_session, tmp_path):
    """Round-5 merge hardening: (1) merging into an out_dir that already
    holds edges/ or nodes/ partitions raises (a hive write would APPEND
    beside them and double-count the merged view) unless overwrite=True,
    which replaces them and reproduces the fresh-merge output exactly;
    (2) a run dir whose triples/ was pruned (edges-only retention) merges
    with a warning — the exact conv_id overlap check is skipped for it,
    not failed."""
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import merge_kg_runs

    base = synth_transcripts_table(200, seed=29).to_pandas()
    convs = sorted(base["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    outs = {}
    # both deltas staged through the SAME input path (the production
    # drop-dir pattern): their manifests share config_hash {v, partitions,
    # input path} even though the content is disjoint — the manifest fast
    # path must WARN and defer to the exact conv_id check, not raise
    # (round-4 ADVICE item)
    src = tmp_path / "drop_dir"
    for name, mask in (("a", base["conv_id"].isin(half)),
                       ("b", ~base["conv_id"].isin(half))):
        shutil.rmtree(src, ignore_errors=True)
        src.mkdir()
        t = pa.Table.from_pandas(base[mask], preserve_index=False)
        t = t.set_column(
            t.schema.get_field_index("turn_idx"), "turn_idx",
            t.column("turn_idx").cast(pa.int32()),
        )
        pq_mod.write_table(t, src / "part-0.parquet")
        outs[name] = tmp_path / f"kg_{name}"
        run_kg_job(str(src), str(outs[name]), num_partitions=2, tag_concurrency=2)

    runs = [str(outs["a"]), str(outs["b"])]
    merged = tmp_path / "kg_merged"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_kg_runs(runs, str(merged))
    assert any("differ in content" in str(x.message) for x in w), (
        "same staging path should trigger the hash-collision warning"
    )
    edges_before = pq_mod.read_table(merged / "edges").to_pandas()

    # re-merge into the SAME dir: must refuse (append would double-count)
    with pytest.raises(FileExistsError, match="already contains output"):
        merge_kg_runs(runs, str(merged))
    # overwrite=True replaces and reproduces the same view
    merge_kg_runs(runs, str(merged), overwrite=True)
    edges_after = pq_mod.read_table(merged / "edges").to_pandas()
    keys = ["part", "subj_id", "pred", "obj_id"]
    for df in (edges_before, edges_after):
        df["part"] = df["part"].astype("int64")
    assert _sorted_df(pa.Table.from_pandas(edges_before), keys).equals(
        _sorted_df(pa.Table.from_pandas(edges_after), keys)
    )
    # row count stayed flat (no silent append)
    assert len(edges_after) == len(edges_before)

    # prune run b's triples (edges-only retention): merge still works,
    # with a warning that b's exact overlap check was skipped
    shutil.rmtree(outs["b"] / "triples")
    merged2 = tmp_path / "kg_merged2"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        merge_kg_runs(runs, str(merged2))
    assert any("no triples/ directory" in str(x.message) for x in w)
    edges2 = pq_mod.read_table(merged2 / "edges").to_pandas()
    edges2["part"] = edges2["part"].astype("int64")
    assert _sorted_df(pa.Table.from_pandas(edges2), keys).equals(
        _sorted_df(pa.Table.from_pandas(edges_before), keys)
    )


def test_kg_job_artifact_path(ray_session, tmp_path, tmp_path_factory):
    """run_kg_job(artifact_dir=) — the production deployment layout end to
    end: actor pool, sha-verified .npz loaded per actor, output identical
    to the lexicon-weights job; the lineage config hash folds the artifact
    dir in (a resume must never mix weight sources); task mode + artifact
    raises instead of silently ignoring the weights."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import ensure_default_artifacts
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import fused_linked_triples

    src = tmp_path / "src"
    src.mkdir()
    t = synth_transcripts_table(200, seed=31)
    pq_mod.write_table(t, src / "part-0.parquet")
    adir = ensure_default_artifacts(tmp_path_factory.mktemp("models2"))

    out_lex = tmp_path / "kg_lex"
    out_art = tmp_path / "kg_art"
    run_kg_job(str(src), str(out_lex), num_partitions=2, tag_concurrency=2)
    run_kg_job(str(src), str(out_art), num_partitions=2, tag_concurrency=2,
               artifact_dir=adir)
    keys = ["part", "subj_id", "pred", "obj_id"]
    lex = pq_mod.read_table(out_lex / "edges").to_pandas()
    art = pq_mod.read_table(out_art / "edges").to_pandas()
    for df in (lex, art):
        df["part"] = df["part"].astype("int64")
    assert _sorted_df(pa.Table.from_pandas(lex), keys).equals(
        _sorted_df(pa.Table.from_pandas(art), keys)
    )
    # lineage hashes differ: the artifact run can't resume-skip into a
    # lexicon run's partitions
    m_lex = json.loads((out_lex / "triples" / "part=0" / "_manifest.json").read_text())
    m_art = json.loads((out_art / "triples" / "part=0" / "_manifest.json").read_text())
    assert m_lex["config_hash"] != m_art["config_hash"]

    with pytest.raises(ValueError, match="actor-pool mode"):
        fused_linked_triples(
            read_transcripts(str(src)), concurrency=None, artifact_dir=str(adir)
        )


def test_linker_fuzzy_fallback(ray_session):
    """Opt-in ED<=1 linking: a typo'd known surface form links through the
    per-actor FastSS deletion index; exact mode (the default, which the
    kg oracles pin) still NILs it. Selection is deterministic (lexico-
    graphically smallest verified surface)."""
    import pyarrow as pa

    from lingvo__postagger_ner_ru_dnn_ray.stages.linking import (
        NIL,
        LinkerStage,
        build_linking_dict,
    )

    lookup = build_linking_dict()
    sf = next(s for s in sorted(lookup) if len(s) >= 5 and " " not in s)
    typo = sf[:2] + sf[3:]
    assert typo not in lookup
    batch = pa.table({"subj": [typo], "obj": [sf]})

    exact = LinkerStage()(batch)
    assert exact.column("subj_id")[0].as_py() == NIL
    assert exact.column("obj_id")[0].as_py() == lookup[sf][0]

    fz = LinkerStage(fuzzy=True)(batch)
    got = fz.column("subj_id")[0].as_py()
    assert got != NIL
    assert fz.column("obj_id")[0].as_py() == lookup[sf][0]  # exact path intact
    # deterministic across instances
    assert LinkerStage(fuzzy=True)(batch).column("subj_id")[0].as_py() == got


def test_single_task_agg_equals_salted(ray_session):
    """The barrier-free small-stream combine and the salted exchange must
    produce identical edge/node tables (same aggregates, different
    physical plans) — the size hint only changes the route."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from lingvo__postagger_ner_ru_dnn_ray.stages.conflate import (
        _salted_final_agg,
        _single_task_agg,
    )

    rng = np.random.RandomState(5)
    n = 20_000
    # every 97th k2 is NULL: both routes must aggregate null keys as a
    # real group (regression: pandas groupby default dropna=True silently
    # dropped them on the single-task route)
    tbl = pa.table({
        "k1": pa.array(rng.randint(0, 500, n), pa.int64()),
        "k2": pa.array([None if i % 97 == 0 else f"p{i%7}" for i in range(n)], pa.string()),
        "weight": pa.array(rng.randint(1, 9, n), pa.int64()),
        "canon": pa.array([f"c{rng.randint(0, 9)}" for _ in range(n)], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(32)
    a = _single_task_agg(ds, ["k1", "k2"], sums=["weight"], mins=["canon"]).to_pandas()
    b = _salted_final_agg(ds, ["k1", "k2"], sums=["weight"], mins=["canon"]).to_pandas()
    key = ["k1", "k2"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b[a.columns].sort_values(key).reset_index(drop=True)
    assert a["k2"].isna().any()  # the null-key groups survived
    pd.testing.assert_frame_equal(a, b)


def test_turn_memo_overflow_mid_batch(ray_session):
    """Same overflow discipline for the fused stage's turn memo: a batch
    whose texts straddle a memo clear must still emit every turn's rows
    (KeyError at ≥2^18 unique turns/worker before the fix)."""
    import pyarrow as pa

    from lingvo__postagger_ner_ru_dnn_ray.stages import fused as fz

    st = fz.KgStage(dict_ref=None)
    t1 = "Иван Смирнов встретил «СКР»."
    t2 = "Ущерб составил более 9,5 млн руб."
    mk = lambda texts: pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array(list(range(len(texts))), pa.int32()),
        "text": pa.array(texts),
    })
    base = st(mk([t1])).num_rows
    import lingvo__postagger_ner_ru_dnn_ray.stages.fused as fmod

    # shrink the cap by monkeypatching the literal via instance memo fill
    st._turn_memo.clear()
    st(mk([t1]))  # memo: {t1}
    # simulate the cap being reached: preload memo to the clear threshold
    for i in range((1 << 18)):
        if len(st._turn_memo) >= (1 << 18):
            break
        st._turn_memo[f"_pad{i}"] = []
    out = st(mk([t2, t1]))  # t1 memoized, t2 new -> clear fires
    assert out.num_rows >= base  # t1's rows survived the clear
