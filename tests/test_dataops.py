"""Dataops operators vs their DuckDB oracles at sf0.001 (fast), mirroring
the driver's correctness gate. KG queries are covered by
tests/test_pipeline_ray.py against the single-process oracle."""
import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SQL_QUERIES = [
    "doc_dedup_exact",
    "doc_jaccard_pairs",
    "doc_token_count",
    "doc_quality",
    "doc_langid",
    "doc_token_freq",
    "emb_ann_topk",
    "emb_neardup_pairs",
    "events_window",
    "events_sessions",
    "lineitem_pricing",
    "orders_by_nation",
    "part_topk",
    "supplier_stats",
    "orders_by_month",
    "region_nation_counts",
    "events_top_users",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_dataops_vs_duckdb(ray_session, con, name):
    import __ray_entry__ as e

    got = e.queries()[name](SF)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = con.execute(e._dataops_sql()[name]).fetchdf()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w), (len(g), len(w))
    if not g.equals(w):
        assert g.astype(str).equals(w.astype(str)), f"{name} value mismatch"


def test_minhash_subset_of_exact(ray_session):
    # LSH candidates verified ≥ threshold must be a subset of the exact
    # all-pairs result at the same threshold (recall < 1 is expected)
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import (
        doc_jaccard_pairs,
        doc_minhash_pairs,
    )

    mh = doc_minhash_pairs(SF).to_pandas()
    ex = doc_jaccard_pairs(SF).to_pandas()
    exact = set(zip(ex["doc_a"], ex["doc_b"]))
    assert all((a, b) in exact for a, b in zip(mh["doc_a"], mh["doc_b"]))


def test_simhash_deterministic(ray_session):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import doc_simhash

    a = doc_simhash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = doc_simhash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["simhash"].nunique() > 1


def test_ivf_recall_vs_bruteforce(ray_session):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import emb_ann_ivf, emb_ann_topk

    exact = emb_ann_topk(SF).to_pandas()
    approx = emb_ann_ivf(SF).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.4  # nprobe=4/16 buckets on random vectors
    # deterministic
    again = emb_ann_ivf(SF).to_pandas()
    assert approx.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
        again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    )


def test_charlm_ppl(ray_session):
    from lingvo__postagger_ner_ru_dnn_ray.stages.dataops import doc_charlm_ppl

    df = doc_charlm_ppl(SF).to_pandas()
    assert len(df) == 500
    assert df["ppl_millibits"].between(0, 64_000).all()
    # in-domain (training) docs should score no worse than the corpus mean
    train_mean = df[df["doc_id"] < 100]["ppl_millibits"].mean()
    assert train_mean <= df["ppl_millibits"].mean() + 100
    # deterministic
    again = doc_charlm_ppl(SF).to_pandas()
    assert df.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )
