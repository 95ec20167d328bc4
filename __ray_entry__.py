"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship KG pipeline on sf0.001-scaled synthetic transcripts.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
training-data ops); each takes ``sf_dir`` and returns a Dataset / DataFrame
/ pyarrow Table.
``oracle_sql()`` — DuckDB-equivalent SQL per query. For the KG pipeline
(tokenizer + DNN tagging is not SQL-expressible) the oracle is the
SINGLE-PROCESS reference implementation (pipelines/oracle.py — same pure
transforms run sequentially without Ray) materialized to Parquet and read
via read_parquet(): the comparison therefore checks that the distributed
execution adds no nondeterminism. Pure-SQL semantic oracles cover the
relational / dedup / similarity / windowing operators over the driver
tables.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().
"""
from __future__ import annotations

import os
import zlib
from collections.abc import Callable
from pathlib import Path
from typing import Any

_PKG = Path(__file__).parent / "lingvo__postagger_ner_ru_dnn_ray"


def _code_fingerprint() -> str:
    """Hash of the pipeline sources — keys the /tmp caches so results are
    never reused across code changes."""
    h = 0
    for f in sorted(_PKG.rglob("*.py")):
        h = zlib.crc32(f.read_bytes(), h)
    return f"{h:08x}"


def _kg_dirs(sf_dir: str) -> tuple[str, str]:
    """(ray_products_dir, oracle_dir) for this scale — both deterministic,
    cached by (n_turns, seed, code fingerprint)."""
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import sf_of_dir

    n = max(200, int(600_000 * sf_of_dir(sf_dir)))
    fp = _code_fingerprint()
    base = Path("/tmp/graft_data")
    return str(base / f"kg_ray_n{n}_{fp}"), str(base / f"kg_oracle_n{n}_{fp}")


def _ensure_kg_oracle(sf_dir: str) -> str:
    """Materialize the single-process oracle tables (FIXTURES.md F5) once."""
    import pyarrow.parquet as pq

    from lingvo__postagger_ner_ru_dnn_ray.pipelines.oracle import oracle_tables
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import (
        sf_of_dir,
        synth_transcripts_table,
    )

    _, out = _kg_dirs(sf_dir)
    outp = Path(out)
    if (outp / "_SUCCESS").exists():
        return out
    if outp.exists():
        import shutil

        shutil.rmtree(outp)
    n = max(200, int(600_000 * sf_of_dir(sf_dir)))
    tables = oracle_tables(synth_transcripts_table(n, seed=42))
    outp.mkdir(parents=True, exist_ok=True)
    for name, tbl in tables.items():
        pq.write_table(tbl, outp / f"{name}.parquet")
    (outp / "_SUCCESS").touch()
    return out


def _ensure_kg_ray(sf_dir: str) -> str:
    """Run the DISTRIBUTED pipeline once per scale and materialize its five
    output tables; the kg_* queries read from here (one Ray execution is
    shared by the whole query family instead of re-tagging per query)."""
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import (
        linked_triples,
        mention_rows,
        read_transcripts,
        tagged_sentences,
    )
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import transcripts_for_sf
    from lingvo__postagger_ner_ru_dnn_ray.stages.conflate import conflate_edges, conflate_nodes

    out, _ = _kg_dirs(sf_dir)
    outp = Path(out)
    if (outp / "_SUCCESS").exists():
        return out
    if outp.exists():
        import shutil

        shutil.rmtree(outp)
    path = transcripts_for_sf(sf_dir)
    ds = read_transcripts(path).sort(["conv_id", "turn_idx"])
    import ray
    import ray.data

    # size the tagger pool from the cluster (same as entry()) instead of
    # the default 4 — the kg-family replay otherwise underuses 32 CPUs
    pool = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    sents = tagged_sentences(ds, tag_concurrency=pool)

    sents.write_parquet(str(outp / "sentences"))
    sents_w = ray.data.read_parquet(str(outp / "sentences"))
    mention_rows(sents_w).write_parquet(str(outp / "mentions"))
    triples = linked_triples(sents_w)
    triples.write_parquet(str(outp / "triples"))
    tri_w = ray.data.read_parquet(str(outp / "triples"))
    conflate_edges(tri_w).write_parquet(str(outp / "edges"))
    conflate_nodes(tri_w).write_parquet(str(outp / "nodes"))
    (outp / "_SUCCESS").touch()
    return out


def _kg_table(sf_dir: str, name: str):
    import ray.data

    out = _ensure_kg_ray(sf_dir)
    return ray.data.read_parquet(f"{out}/{name}")


def _webjson_paths(sf_dir: str) -> tuple[str, str, str]:
    """(requests_jsonl, ray_out_dir, oracle_parquet) for the batch JSON
    boundary at this scale — all deterministic, keyed by (n_turns, code
    fingerprint) like the kg fixtures."""
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import sf_of_dir

    n = max(200, int(600_000 * sf_of_dir(sf_dir)))
    fp = _code_fingerprint()
    base = Path("/tmp/graft_data")
    return (
        str(base / f"webjson_reqs_n{n}_{fp}.jsonl"),
        str(base / f"webjson_ray_n{n}_{fp}"),
        str(base / f"webjson_oracle_n{n}_{fp}.parquet"),
    )


def _webjson_requests_table(sf_dir: str):
    """The request set: one ``{"id": "conv:turn", "text": ...}`` record per
    synthetic transcript turn (the same deterministic fixture the kg family
    replays), already in the transcript shape WebJsonStage consumes."""
    import pyarrow as pa

    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import (
        sf_of_dir,
        synth_transcripts_table,
    )

    n = max(200, int(600_000 * sf_of_dir(sf_dir)))
    tbl = synth_transcripts_table(n, seed=42)
    ids = [
        f"{c}:{t}"
        for c, t in zip(tbl.column("conv_id").to_pylist(), tbl.column("turn_idx").to_pylist())
    ]
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.string()),
            pa.array([0] * len(ids), pa.int32()),
            pa.array(["user"] * len(ids), pa.string()),
            tbl.column("text"),
        ],
        names=["conv_id", "turn_idx", "role", "text"],
    )


def _ensure_webjson_requests(sf_dir: str) -> str:
    """Write (once) the request JSONL the Ray side ingests."""
    import json

    reqs_path, _, _ = _webjson_paths(sf_dir)
    p = Path(reqs_path)
    if p.exists():
        return reqs_path
    tbl = _webjson_requests_table(sf_dir)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(reqs_path + ".tmp")
    with tmp.open("w", encoding="utf-8") as f:
        for cid, text in zip(
            tbl.column("conv_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            f.write(json.dumps({"id": cid, "text": text}, ensure_ascii=False) + "\n")
    os.replace(tmp, p)
    return reqs_path


def _ensure_webjson_ray(sf_dir: str) -> str:
    """Run (once) the DISTRIBUTED batch JSON boundary — JSONL ingest →
    WebJsonStage actor pool — and materialize its (id, sents_json) rows."""
    import ray

    from lingvo__postagger_ner_ru_dnn_ray.sources.jsonio import (
        read_json_requests,
        tag_requests,
    )

    _, out, _ = _webjson_paths(sf_dir)
    outp = Path(out)
    if (outp / "_SUCCESS").exists():
        return out
    if outp.exists():
        import shutil

        shutil.rmtree(outp)
    reqs = read_json_requests(_ensure_webjson_requests(sf_dir))
    pool = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    tag_requests(reqs, model_type="ner", concurrency=pool).write_parquet(out)
    (outp / "_SUCCESS").touch()
    return out


def _ensure_webjson_oracle(sf_dir: str) -> str:
    """Single-process oracle for the batch JSON boundary: ONE WebJsonStage
    call over the whole request table (the FIXTURES.md F5 pattern — same
    pure transforms, no Ray), materialized to Parquet for the SQL side."""
    import pyarrow.parquet as pq

    from lingvo__postagger_ner_ru_dnn_ray.sources.jsonio import WebJsonStage

    _, _, orc = _webjson_paths(sf_dir)
    p = Path(orc)
    if p.exists():
        return orc
    out = WebJsonStage(model_type="ner")(_webjson_requests_table(sf_dir))
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(orc + ".tmp")
    pq.write_table(out, tmp)
    os.replace(tmp, p)
    return orc


def _web_json_tagged(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(_ensure_webjson_ray(sf_dir))


def entry() -> Any:
    """Flagship: transcripts → sorted → tokenize → tag (actor pool) →
    triples → linked triples, at sf0.001 scale."""
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import (
        linked_triples,
        read_transcripts,
        tagged_sentences,
    )
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import transcripts_for_sf

    import ray

    path = transcripts_for_sf("/root/testdata/sf0.001")
    ds = read_transcripts(path).sort(["conv_id", "turn_idx"])
    # size the tagger pool from the cluster the driver gave us (leave a
    # few CPUs for read/sort/link tasks) instead of a hardcoded 2
    pool = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return linked_triples(tagged_sentences(ds, tag_concurrency=pool))


def _seqlabel_f1(sf_dir: str):
    """Per-class validation counters (Validator.cs:36-67 analogue) over
    the tagged sentences, with deterministically perturbed ref labels —
    see pipelines/validation.py."""
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.validation import seqlabel_f1_counts

    return seqlabel_f1_counts(_kg_table(sf_dir, "sentences"))


def _kg_sentence_len_histogram(sf_dir: str):
    """Sentence token-length histogram over the tagged sentences — the
    Corpus.cs:210-316 length-bucket analogue (partial counts → tiny sum)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    sents = _kg_table(sf_dir, "sentences")

    def partials(batch: pa.Table) -> pa.Table:
        lens = pc.list_value_length(batch.column("values"))
        b = pc.divide(pc.cast(lens, pa.int64()), 10)
        t = pa.Table.from_arrays([b], names=["len_bucket"])
        g = t.group_by(["len_bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["len_bucket", "n_sents"])

    part = sents.map_batches(partials, batch_format="pyarrow")
    return part.groupby("len_bucket").aggregate(Sum("n_sents", alias_name="n_sents"))


def _kg_pos_label_counts(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    sents = _kg_table(sf_dir, "sentences")

    def partials(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch.column("pos"))
        t = pa.Table.from_arrays([flat], names=["pos"])
        g = t.group_by(["pos"]).aggregate([([], "count_all")])
        return g.rename_columns(["pos", "n_tokens"])

    part = sents.map_batches(partials, batch_format="pyarrow")
    return part.groupby("pos").aggregate(Sum("n_tokens", alias_name="n_tokens"))


def _kg_edges_artifact(sf_dir: str):
    """kg edges computed through the ARTIFACT deployment path: KgStage
    ACTOR POOL, each actor loading the sha256-verified .npz weights once
    in __init__ — the reference's model-shipped-as-file layout
    (ConcurrentFactory.cs:56-108 / BaseSeq2SeqFramework.cs:204-228). The
    oracle is the same edges table as kg_edges: the artifact round-trip
    is exact, so the two weight sources must produce identical graphs."""
    import ray

    from lingvo__postagger_ner_ru_dnn_ray.model.artifact import ensure_default_artifacts
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.kg import (
        fused_linked_triples,
        read_transcripts,
    )
    from lingvo__postagger_ner_ru_dnn_ray.sources.transcripts import transcripts_for_sf
    from lingvo__postagger_ner_ru_dnn_ray.stages.conflate import conflate_edges

    adir = ensure_default_artifacts()
    pool = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    tri = fused_linked_triples(
        read_transcripts(transcripts_for_sf(sf_dir)),
        concurrency=(2, pool),
        batch_size=256,
        artifact_dir=adir,
    )
    return conflate_edges(tri)


def _media_features(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import media_features

    return media_features(sf_dir)


def _media_stats(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import media_stats

    return media_stats(sf_dir)


def _ivf_dir(sf_dir: str) -> str:
    """Deterministic materialization path for the IVF result at this scale
    (shared by the emb_ann_ivf_recall query and its SQL oracle)."""
    tag = Path(sf_dir).name
    return f"/tmp/graft_data/ivf_{tag}_{_code_fingerprint()}"


def _ivf_cent_dir(sf_dir: str) -> str:
    """Pinned IVF centroid fixture for this scale — the shared state the
    emb_ann_ivf DIRECT hash oracle (ann_ivf_oracle_sql) derives from."""
    tag = Path(sf_dir).name
    return f"/tmp/graft_data/ivf_cent_{tag}_{_code_fingerprint()}"


def _emb_ann_ivf(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import emb_ann_ivf

    return emb_ann_ivf(sf_dir, centroids_path=_ivf_cent_dir(sf_dir))


def _emb_ann_ivf_recall(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import emb_ann_ivf_recall

    return emb_ann_ivf_recall(
        sf_dir, ivf_path=_ivf_dir(sf_dir), centroids_path=_ivf_cent_dir(sf_dir)
    )


def _pq_dir(sf_dir: str) -> str:
    """Deterministic materialization path for the PQ/ADC result at this
    scale (shared by the emb_pq_recall query and its SQL oracle)."""
    tag = Path(sf_dir).name
    return f"/tmp/graft_data/pq_{tag}_{_code_fingerprint()}"


def _pq_fix_dir(sf_dir: str) -> str:
    """Pinned PQ codebook + ADC-table fixture — the shared state the
    emb_pq_topk DIRECT hash oracle (pq_topk_oracle_sql) derives from."""
    tag = Path(sf_dir).name
    return f"/tmp/graft_data/pq_fix_{tag}_{_code_fingerprint()}"


def _emb_pq_topk(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import emb_pq_topk

    return emb_pq_topk(sf_dir, fixture_path=_pq_fix_dir(sf_dir))


def _emb_pq_recall(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import emb_pq_recall

    return emb_pq_recall(
        sf_dir, pq_path=_pq_dir(sf_dir), fixture_path=_pq_fix_dir(sf_dir)
    )


def _interval_q(sf_dir: str):
    from lingvo__postagger_ner_ru_dnn_ray.stages.intervals import (
        events_interval_join,
    )

    return events_interval_join(sf_dir)


def _bloom_q(name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from lingvo__postagger_ner_ru_dnn_ray.stages import bloom as b

        return getattr(b, name)(sf_dir)

    return run


def _graph_q(name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        from lingvo__postagger_ner_ru_dnn_ray.stages import graph as g

        return getattr(g, name)(sf_dir)

    return run


def _typed_empty_ok(fn: Callable[[str], Any], cols: list[str]) -> Callable[[str], Any]:
    """Adapt a Dataset-returning query for the driver compare: an all-empty
    Ray dataset loses its schema under to_pandas(), so substitute a typed
    int64 empty frame with the declared column names."""

    def run(sf_dir: str):
        import pandas as pd

        df = fn(sf_dir).to_pandas()
        if df.shape[1] == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        return df

    return run


def queries() -> dict[str, Callable[[str], Any]]:
    """Iteration order is deliberate (round-3 lesson: the driver's
    correctness replay records a strict 50-entry PREFIX of this dict, so
    order is coverage policy, not cosmetics). Round-5 ordering:

    1. queries whose operator CODE or ORACLE changed after their last
       driver verdict, cheapest first — the r4 cap-exact oracle rewrites
       (minhash/simhash/LSH), the r4 CC-contraction fix (graph family),
       the r5 IVF/PQ direct hash oracles, the new artifact-path variant,
       and the kg family (its fused stage gained opt-in memo counters in
       r5). Their standing rows are r3-era or absent; this converts the
       r4/r5 changes from locally-replayed to driver-adjudicated.
    2. queries whose standing verdict is r3-era but whose code/oracle is
       unchanged since — refreshed while the budget allows.
    3. everything driver-green in r4 (the freshest verdicts), cheapest
       first, so any count/time cap cuts only queries that already have a
       current recorded verdict.
    """
    from lingvo__postagger_ner_ru_dnn_ray.stages import dataops as d

    return {
        # ---- group 1: code/oracle changed since last driver verdict ----
        # 0.45 = the only threshold with nonzero pairs on the synthetic
        # vectors (documented low-recall LSH regime); the production 0.9
        # default is driver-checked as emb_neardup_lsh_prod in group 3
        "emb_neardup_lsh": lambda sf: d.emb_neardup_lsh(sf, threshold=0.45),
        "doc_simhash_neardup_pairs": d.doc_simhash_neardup_pairs,
        "emb_ann_ivf": _emb_ann_ivf,
        "emb_pq_topk": _emb_pq_topk,
        "emb_ann_ivf_recall": _emb_ann_ivf_recall,
        "emb_pq_recall": _emb_pq_recall,
        "doc_minhash_pairs": d.doc_minhash_pairs,
        "doc_dedup_minhash": d.doc_dedup_minhash,
        "doc_dedup_cc": _graph_q("doc_dedup_cc"),
        "doc_dup_components": _graph_q("doc_dup_components"),
        "doc_dup_triangles": _graph_q("doc_dup_triangles"),
        "doc_dup_pagerank": _graph_q("doc_dup_pagerank"),
        "kg_edges_artifact": _kg_edges_artifact,
        # new in r5 session 3/4: the batch JSON boundary (web surface
        # replay) — actor-pool path vs the single-process oracle
        "web_json_tagged": _web_json_tagged,
        "kg_triples": lambda sf: _kg_table(sf, "triples"),
        "kg_mentions": lambda sf: _kg_table(sf, "mentions"),
        "kg_edges": lambda sf: _kg_table(sf, "edges"),
        "kg_nodes": lambda sf: _kg_table(sf, "nodes"),
        "kg_pos_label_counts": _kg_pos_label_counts,
        "kg_sentence_len_histogram": _kg_sentence_len_histogram,
        "seqlabel_f1": _seqlabel_f1,
        # ---- group 2: r3-era verdict, unchanged since (refresh) ----
        "doc_token_cms_registers": d.doc_token_cms_registers,
        "doc_token_hll_registers": d.doc_token_hll_registers,
        "doc_token_freq": d.doc_token_freq,
        "doc_decontaminate": d.doc_decontaminate,
        "emb_ann_topk": d.emb_ann_topk,
        "emb_neardup_pairs": d.emb_neardup_pairs,
        "events_window_sliding": d.events_window_sliding,
        "doc_bm25_topk": d.doc_bm25_topk,
        "doc_dedup_exact": d.doc_dedup_exact,
        "events_value_quantiles": d.events_value_quantiles,
        "doc_charlm_ppl": d.doc_charlm_ppl,
        "doc_token_cms_estimate": d.doc_token_cms_estimate,
        "doc_token_heavy_hitters": d.doc_token_heavy_hitters,
        "events_window": d.events_window,
        "media_features": _media_features,
        "doc_tfidf_topk": d.doc_tfidf_topk,
        "events_sessions": d.events_sessions,
        "doc_dup_spans": d.doc_dup_spans,
        "events_user_cumsum": d.events_user_cumsum,
        "doc_jaccard_pairs": d.doc_jaccard_pairs,
        "doc_clean_corpus": d.doc_clean_corpus,
        "doc_jaccard_join_prefix": d.doc_jaccard_join_prefix,
        # ---- group 3: driver-green in r4 (cheap -> expensive) ----
        "doc_sample": d.doc_sample,
        "doc_sample_stratified": d.doc_sample_stratified,
        "doc_table_checksum": d.doc_table_checksum,
        "lineitem_pricing": d.lineitem_pricing,
        "lineitem_rollup": d.lineitem_rollup,
        "part_topk": d.part_topk,
        "doc_quality": d.doc_quality,
        "doc_token_count": d.doc_token_count,
        "doc_fingerprint": d.doc_fingerprint,
        "doc_langid": d.doc_langid,
        "doc_len_histogram": d.doc_len_histogram,
        "doc_simhash": d.doc_simhash,
        "doc_token_hll_estimate": d.doc_token_hll_estimate,
        "media_stats": _media_stats,
        "doc_rep_ngram_signals": d.doc_rep_ngram_signals,
        "doc_bpe_pair_counts": d.doc_bpe_pair_counts,
        "events_daily_hll_registers": d.events_daily_hll_registers,
        "events_props_extract": d.events_props_extract,
        "events_top_users": d.events_top_users,
        "events_user_type_set": d.events_user_type_set,
        "supplier_stats": d.supplier_stats,
        "supplier_topk_per_nation": d.supplier_topk_per_nation,
        "doc_posting_lists": d.doc_posting_lists,
        "events_interval_join": _interval_q,
        "events_type_pivot": d.events_type_pivot,
        "orders_bloom_registers": _bloom_q("orders_bloom_registers"),
        "orders_by_month": d.orders_by_month,
        "region_nation_counts": d.region_nation_counts,
        "events_attribution": d.events_attribution,
        "events_daily_hll_estimate": d.events_daily_hll_estimate,
        "events_distinct_users": d.events_distinct_users,
        "events_retention_cohorts": d.events_retention_cohorts,
        "events_funnel": d.events_funnel,
        "customers_without_orders": d.customers_without_orders,
        "events_percent_rank": d.events_percent_rank,
        "orders_upsert_merge": d.orders_upsert_merge,
        "part_spelling_variants": d.part_spelling_variants,
        "orders_by_nation": d.orders_by_nation,
        "events_user_rolling": d.events_user_rolling,
        "lineitem_bloom_semijoin": _bloom_q("lineitem_bloom_semijoin"),
        "events_type_transitions": d.events_type_transitions,
        "lineitem_bloom_fp_stats": _bloom_q("lineitem_bloom_fp_stats"),
        # 0.9 on the synthetic vectors legitimately yields zero pairs, and
        # Ray's Dataset.to_pandas() drops the schema of an all-empty
        # dataset, so hand the driver a typed frame (the oracle compares
        # column names)
        "emb_neardup_lsh_prod": _typed_empty_ok(
            d.emb_neardup_lsh, ["vec_a", "vec_b"]
        ),
    }


def _kg_sql(orc: str) -> dict[str, str]:
    return {
        "kg_triples": f"SELECT * FROM read_parquet('{orc}/triples.parquet')",
        "kg_mentions": f"SELECT * FROM read_parquet('{orc}/mentions.parquet')",
        "kg_edges": f"SELECT * FROM read_parquet('{orc}/edges.parquet')",
        # artifact-loaded actor pool must reproduce the lexicon-weights
        # graph exactly (save/load round trip is bitwise on the weights)
        "kg_edges_artifact": f"SELECT * FROM read_parquet('{orc}/edges.parquet')",
        "kg_nodes": f"SELECT * FROM read_parquet('{orc}/nodes.parquet')",
        "kg_pos_label_counts": (
            "SELECT pos, count(*)::BIGINT AS n_tokens FROM ("
            f"SELECT unnest(pos) AS pos FROM read_parquet('{orc}/sentences.parquet')"
            ") GROUP BY pos"
        ),
    }


def _dataops_sql() -> dict[str, str]:
    """Pure-SQL semantic oracles (no side effects; unit-testable at any sf).
    The md5-hash-seeded operators (minhash/simhash/fingerprint/charlm) are
    reproduced EXACTLY in SQL via DuckDB's md5_number_upper — see the
    *_ORACLE_SQL constants next to each operator in stages/dataops.py."""
    from lingvo__postagger_ner_ru_dnn_ray.stages import dataops as d
    from lingvo__postagger_ner_ru_dnn_ray.stages import graph as _g

    return {
        "doc_minhash_pairs": d.minhash_oracle_sql(),
        "doc_dup_components": _g.dup_components_oracle_sql(),
        "doc_dedup_cc": _g.dedup_cc_oracle_sql(),
        "doc_dup_pagerank": _g.dup_pagerank_oracle_sql(),
        "doc_dup_triangles": _g.dup_triangles_oracle_sql(),
        "doc_dedup_minhash": d.dedup_minhash_oracle_sql(),
        "doc_clean_corpus": d.clean_corpus_oracle_sql(),
        "events_window_sliding": (
            "WITH x AS (SELECT event_type, epoch_us(ts) AS t, "
            "cast(round(value*100) AS BIGINT) AS cents FROM events), "
            "w AS (SELECT event_type, "
            "((t // 900000000) * 900000000 - i * 900000000) AS ws, cents "
            "FROM x, generate_series(0, 3) g(i)) "
            "SELECT event_type, make_timestamp(ws) AS window_start, "
            "sum(cents)::BIGINT AS sum_cents, count(*)::BIGINT AS n_events "
            "FROM w GROUP BY event_type, ws"
        ),
        "lineitem_rollup": (
            "SELECT 0::BIGINT AS level, l_returnflag, l_linestatus, "
            "sum(cast(round(l_extendedprice*100) AS BIGINT))::BIGINT AS sum_cents, "
            "count(*)::BIGINT AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "UNION ALL SELECT 1, l_returnflag, '(all)', "
            "sum(cast(round(l_extendedprice*100) AS BIGINT))::BIGINT, count(*)::BIGINT "
            "FROM lineitem GROUP BY l_returnflag "
            "UNION ALL SELECT 2, '(all)', '(all)', "
            "sum(cast(round(l_extendedprice*100) AS BIGINT))::BIGINT, count(*)::BIGINT "
            "FROM lineitem"
        ),
        "doc_simhash": d.SIMHASH_ORACLE_SQL,
        "doc_simhash_neardup_pairs": d.SIMHASH_NEARDUP_ORACLE_SQL,
        "doc_fingerprint": d.FINGERPRINT_ORACLE_SQL,
        "doc_charlm_ppl": d.CHARLM_ORACLE_SQL,
        "doc_len_histogram": (
            "SELECT length(text) // 100 AS len_bucket, count(*)::BIGINT AS n_docs "
            "FROM documents GROUP BY length(text) // 100"
        ),
        "doc_dedup_exact": (
            "SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY md5(text)"
        ),
        "doc_jaccard_pairs": (
            "WITH s AS (SELECT doc_id, list_distinct(list_transform("
            "generate_series(1, len(string_split(text,' '))-2), i -> "
            "string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || "
            "string_split(text,' ')[i+2])) AS sh FROM documents WHERE doc_id < 500) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "100*len(list_intersect(a.sh,b.sh)) // "
            "(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))) AS jaccard_pct "
            "FROM s a, s b WHERE a.doc_id < b.doc_id "
            "AND len(list_intersect(a.sh,b.sh)) > 0 "
            "AND 100*len(list_intersect(a.sh,b.sh)) // "
            "(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))) >= 1"
        ),
        "doc_token_count": (
            "SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_ws_tokens, "
            "len(regexp_extract_all(text,'\\w+|[^\\w\\s]'))::BIGINT AS n_rx_tokens, "
            "length(text)::BIGINT AS n_chars FROM documents"
        ),
        "doc_quality": (
            "SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_words, "
            "len(list_filter(string_split(text,' '), x -> x IN "
            "('the','a','of','and','to')))::BIGINT AS n_stop, "
            "list_max(list_transform(string_split(text,' '), x -> length(x)))::BIGINT "
            "AS max_word_len FROM documents"
        ),
        "doc_langid": (
            "SELECT doc_id, CASE WHEN len(regexp_extract_all(text,'[а-яА-ЯёЁ]')) > "
            "len(regexp_extract_all(text,'[a-zA-Z]')) THEN 'ru' ELSE 'en' END AS lang_pred "
            "FROM documents"
        ),
        "doc_token_freq": (
            "SELECT token, count(*)::BIGINT AS freq FROM ("
            "SELECT unnest(string_split(text,' ')) AS token FROM documents) "
            "GROUP BY token ORDER BY freq DESC, token LIMIT 100"
        ),
        "emb_ann_topk": (
            "SELECT q.vec_id AS query_id, row_number() OVER ("
            "PARTITION BY q.vec_id ORDER BY "
            "list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank, "
            "c.vec_id AS neighbor_id "
            "FROM embeddings q, embeddings c WHERE q.vec_id < 5 AND c.vec_id >= 5 "
            "QUALIFY rank <= 3"
        ),
        "emb_neardup_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM embeddings a, embeddings b "
            "WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000 "
            "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
        ),
        "emb_neardup_lsh": d.emb_neardup_lsh_oracle_sql(threshold=0.45),
        "emb_neardup_lsh_prod": d.emb_neardup_lsh_oracle_sql(),
        "events_window": (
            "SELECT user_id, event_type, date_trunc('hour', ts) AS window_start, "
            "sum(cast(round(value*100) AS BIGINT))::BIGINT AS sum_cents, "
            "count(*)::BIGINT AS n_events "
            "FROM events GROUP BY user_id, event_type, date_trunc('hour', ts)"
        ),
        "events_sessions": (
            "WITH x AS (SELECT user_id, ts, CASE WHEN "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR "
            "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "y AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sess FROM x) "
            "SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, "
            "count(*)::BIGINT AS n_events FROM y GROUP BY user_id, sess"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(cast(l_quantity AS BIGINT))::BIGINT AS sum_qty, "
            "sum(cast(round(l_extendedprice*100) AS BIGINT))::BIGINT AS sum_price_cents, "
            "count(*)::BIGINT AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_nation": (
            "SELECT n.n_name AS nation, "
            "sum(cast(round(o.o_totalprice*100) AS BIGINT))::BIGINT AS sum_cents, "
            "count(*)::BIGINT AS n_orders "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "part_topk": (
            "SELECT p_partkey, cast(round(p_retailprice*100) AS BIGINT) AS price_cents "
            "FROM part ORDER BY price_cents DESC, p_partkey LIMIT 10"
        ),
        "supplier_stats": (
            "SELECT s_nationkey, "
            "min(cast(round(s_acctbal*100) AS BIGINT))::BIGINT AS min_bal, "
            "max(cast(round(s_acctbal*100) AS BIGINT))::BIGINT AS max_bal, "
            "sum(cast(round(s_acctbal*100) AS BIGINT))::BIGINT AS sum_bal, "
            "count(*)::BIGINT AS n_suppliers "
            "FROM supplier GROUP BY s_nationkey"
        ),
        "orders_by_month": (
            "SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus, "
            "sum(cast(round(o_totalprice*100) AS BIGINT))::BIGINT AS sum_cents, "
            "count(*)::BIGINT AS n_orders "
            "FROM orders GROUP BY date_trunc('month', o_orderdate), o_orderstatus"
        ),
        "region_nation_counts": (
            "SELECT r.r_name AS region, count(*)::BIGINT AS n_customers "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
        ),
        "events_top_users": (
            "SELECT user_id, count(*)::BIGINT AS n_events FROM events "
            "GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 20"
        ),
        "doc_sample": d.doc_sample_oracle_sql(),
        "supplier_topk_per_nation": (
            "SELECT s_nationkey, row_number() OVER (PARTITION BY s_nationkey "
            "ORDER BY cast(round(s_acctbal*100) AS BIGINT) DESC, s_suppkey) AS rank, "
            "s_suppkey, cast(round(s_acctbal*100) AS BIGINT) AS bal_cents "
            "FROM supplier QUALIFY rank <= 3"
        ),
        "customers_without_orders": (
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '1997-06-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-07-01')"
        ),
        "events_user_cumsum": (
            "SELECT user_id, ts, sum(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents FROM ("
            "SELECT user_id, ts, sum(cast(round(value*100) AS BIGINT)) AS cents "
            "FROM events GROUP BY user_id, ts)"
        ),
        "events_value_quantiles": (
            "SELECT event_type, quantile_disc(cents, 0.50)::BIGINT AS p50_cents, "
            "quantile_disc(cents, 0.90)::BIGINT AS p90_cents, "
            "quantile_disc(cents, 0.99)::BIGINT AS p99_cents FROM ("
            "SELECT event_type, cast(round(value*100) AS BIGINT) AS cents FROM events) "
            "GROUP BY event_type"
        ),
        "doc_jaccard_join_prefix": d.prefix_join_oracle_sql(),
        "events_attribution": d.ATTRIBUTION_ORACLE_SQL,
        "events_funnel": d.FUNNEL_ORACLE_SQL,
        "events_distinct_users": (
            "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "doc_sample_stratified": d.stratified_sample_oracle_sql(),
        "doc_token_hll_registers": d.HLL_REGISTERS_ORACLE_SQL,
        "doc_token_hll_estimate": d.HLL_ESTIMATE_ORACLE_SQL,
        "events_daily_hll_registers": d.DAILY_HLL_REGISTERS_ORACLE_SQL,
        "events_daily_hll_estimate": d.DAILY_HLL_ESTIMATE_ORACLE_SQL,
        "events_props_extract": d.PROPS_EXTRACT_ORACLE_SQL,
        "events_percent_rank": d.PERCENT_RANK_ORACLE_SQL,
        "events_type_pivot": d.pivot_oracle_sql(),
        "events_user_rolling": d.ROLLING_ORACLE_SQL,
        "events_retention_cohorts": d.RETENTION_ORACLE_SQL,
        "events_user_type_set": d.TYPE_SET_ORACLE_SQL,
        "doc_posting_lists": d.POSTING_LISTS_ORACLE_SQL,
        "doc_bpe_pair_counts": d.BPE_PAIR_ORACLE_SQL,
        "doc_table_checksum": d.TABLE_CHECKSUM_ORACLE_SQL,
        "orders_upsert_merge": d.UPSERT_ORACLE_SQL,
        "events_type_transitions": d.TYPE_TRANSITIONS_ORACLE_SQL,
        "doc_token_cms_registers": d.CMS_REGISTERS_ORACLE_SQL,
        "doc_token_cms_estimate": d.CMS_ESTIMATE_ORACLE_SQL,
        "doc_token_heavy_hitters": d.HEAVY_HITTERS_ORACLE_SQL,
        "part_spelling_variants": d.SPELLING_VARIANTS_ORACLE_SQL,
        "doc_tfidf_topk": d.tfidf_oracle_sql(),
        "doc_bm25_topk": d.bm25_oracle_sql(),
        "doc_rep_ngram_signals": d.REP_NGRAM_ORACLE_SQL,
        "doc_decontaminate": d.DECONTAMINATE_ORACLE_SQL,
        "doc_dup_spans": d.DUP_SPANS_ORACLE_SQL,
        # media_features / media_stats oracles are added in oracle_sql()
        # (they need the materialized payload path)
    } | _interval_bloom_sql()


def _interval_bloom_sql() -> dict[str, str]:
    from lingvo__postagger_ner_ru_dnn_ray.stages import bloom as b
    from lingvo__postagger_ner_ru_dnn_ray.stages import intervals as iv

    return {
        "events_interval_join": iv.EVENTS_INTERVAL_ORACLE_SQL,
        "orders_bloom_registers": b.bloom_registers_oracle_sql(),
        "lineitem_bloom_semijoin": b.bloom_semijoin_oracle_sql(),
        "lineitem_bloom_fp_stats": b.bloom_fp_stats_oracle_sql(),
    }


def oracle_sql() -> dict[str, str]:
    # the kg_* oracles read the single-process reference run at sf0.01 (the
    # driver's correctness scale); materialized here so the SQL can read it.
    # emb_ann_ivf_recall's oracle reads the materialized IVF result and
    # recomputes the exact top-k independently in SQL.
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import (
        ann_ivf_recall_oracle_sql,
        emb_ann_ivf_recall,
    )

    # The driver's correctness gate runs both sides at sf0.01, so the
    # kg-family oracle fixtures (sequential-run parquet) and the IVF/PQ
    # materialization paths default to that scale. GRAFT_ORACLE_SF_DIR
    # lets local replays validate the same families at other scales
    # (e.g. scripts/check_correctness.py /root/testdata/sf0.1) — the
    # driver never sets it, so its behavior is unchanged.
    sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    from lingvo__postagger_ner_ru_dnn_ray.pipelines.validation import (
        seqlabel_f1_oracle_sql,
    )

    sql = _dataops_sql()
    orc = _ensure_kg_oracle(sf)
    sql.update(_kg_sql(orc))
    sql["web_json_tagged"] = (
        f"SELECT * FROM read_parquet('{_ensure_webjson_oracle(sf)}')"
    )
    sql["seqlabel_f1"] = seqlabel_f1_oracle_sql(f"{orc}/sentences.parquet")
    sql["kg_sentence_len_histogram"] = (
        "SELECT len(\"values\") // 10 AS len_bucket, count(*)::BIGINT AS n_sents "
        f"FROM read_parquet('{orc}/sentences.parquet') GROUP BY len(\"values\") // 10"
    )
    ivf_path = _ivf_dir(sf)
    emb_ann_ivf_recall(
        sf, ivf_path=ivf_path, centroids_path=_ivf_cent_dir(sf)
    ).count()  # materialize once
    sql["emb_ann_ivf_recall"] = ann_ivf_recall_oracle_sql(ivf_path)
    # DIRECT hash oracles for the IVF / PQ searches themselves (round-5):
    # pin the trained centroids / codebooks+ADC-table once, re-derive the
    # full search in SQL from the same fixture
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import (
        ann_ivf_oracle_sql,
        emb_pq_recall,
        materialize_ivf_centroids,
        materialize_pq_fixture,
        pq_recall_oracle_sql,
        pq_topk_oracle_sql,
    )

    materialize_ivf_centroids(sf, _ivf_cent_dir(sf))
    sql["emb_ann_ivf"] = ann_ivf_oracle_sql(_ivf_cent_dir(sf))
    materialize_pq_fixture(sf, _pq_fix_dir(sf))
    sql["emb_pq_topk"] = pq_topk_oracle_sql(_pq_fix_dir(sf))

    pq_path = _pq_dir(sf)
    emb_pq_recall(
        sf, pq_path=pq_path, fixture_path=_pq_fix_dir(sf)
    ).count()  # materialize once
    sql["emb_pq_recall"] = pq_recall_oracle_sql(pq_path)
    from lingvo__postagger_ner_ru_dnn_ray.stages.multimodal import (
        ensure_media_parquet,
        media_features_oracle_sql,
        media_stats_oracle_sql,
    )

    media_path = ensure_media_parquet(sf)
    sql["media_stats"] = media_stats_oracle_sql(media_path)
    # real BMP/WAV header parsing -> value-checked (video rows byte_sum
    # over the whole payload; width/height 0 — the stub part, still exact)
    sql["media_features"] = media_features_oracle_sql(media_path)
    return sql
