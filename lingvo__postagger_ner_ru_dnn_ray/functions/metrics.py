"""Distributed sequence-labeling F-score metrics.

Re-implements the reference's validation metrics as a classic
partial+final aggregate (no locks — the reference merges per-thread
counters under lock, BaseSeq2SeqFramework.cs:984-1008):

  * per-class (hyp_count, ref_count, match_count) over position-aligned
    token labels, compared over min(len_ref, len_hyp)
    (Metrics/SeqLabelFscoreMetric.cs:23-53)
  * the 'all' multi-label score over every label except 'O'
    (Metrics/MultiLabelsFscoreMetric.cs:40-99; wiring Validator.cs:87-97)

P = match/hyp, R = match/ref, F = 2PR/(P+R).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def fscore_counts_batch(batch: pa.Table, ref_col: str = "ref", hyp_col: str = "hyp") -> pa.Table:
    """Partial counts per label within one batch of
    (ref:list<string>, hyp:list<string>) rows."""
    refs = batch.column(ref_col).to_pylist()
    hyps = batch.column(hyp_col).to_pylist()
    counts: dict[str, list[int]] = {}
    for ref, hyp in zip(refs, hyps):
        m = min(len(ref), len(hyp))
        for i in range(m):
            r, h = ref[i], hyp[i]
            cr = counts.setdefault(r, [0, 0, 0])
            cr[1] += 1  # ref_count
            ch = counts.setdefault(h, [0, 0, 0])
            ch[0] += 1  # hyp_count
            if r == h:
                cr[2] += 1  # match
    labels = sorted(counts)
    return pa.Table.from_arrays(
        [
            pa.array(labels, pa.string()),
            pa.array([counts[l][0] for l in labels], pa.int64()),
            pa.array([counts[l][1] for l in labels], pa.int64()),
            pa.array([counts[l][2] for l in labels], pa.int64()),
        ],
        names=["label", "hyp_count", "ref_count", "match_count"],
    )


def seq_fscore(ds: ray.data.Dataset, ref_col: str = "ref", hyp_col: str = "hyp") -> pd.DataFrame:
    """Distributed per-class P/R/F1 + an 'all' row (labels except 'O').
    Returns a small driver-side DataFrame (one row per label)."""
    part = ds.map_batches(
        lambda b: fscore_counts_batch(b, ref_col, hyp_col), batch_format="pyarrow"
    )
    agg = part.groupby("label").aggregate(
        Sum("hyp_count", alias_name="hyp_count"),
        Sum("ref_count", alias_name="ref_count"),
        Sum("match_count", alias_name="match_count"),
    )
    df = agg.to_pandas()

    non_o = df[df["label"] != "O"]
    all_row = pd.DataFrame(
        [{
            "label": "all",
            "hyp_count": int(non_o["hyp_count"].sum()),
            "ref_count": int(non_o["ref_count"].sum()),
            "match_count": int(non_o["match_count"].sum()),
        }]
    )
    df = pd.concat([df, all_row], ignore_index=True)
    hyp = df["hyp_count"].where(df["hyp_count"] > 0, 1)
    ref = df["ref_count"].where(df["ref_count"] > 0, 1)
    df["precision"] = df["match_count"] / hyp
    df["recall"] = df["match_count"] / ref
    pr = df["precision"] + df["recall"]
    df["f1"] = (2 * df["precision"] * df["recall"] / pr.where(pr > 0, 1.0)).fillna(0.0)
    return df.sort_values("label").reset_index(drop=True)


def triple_prf(got: pd.DataFrame, want: pd.DataFrame, keys: list[str]) -> dict:
    """Set-style precision/recall/F1 of extracted triples vs a gold set
    (the BASELINE.md P/R≥0.95 parity criterion)."""
    g = set(map(tuple, got[keys].itertuples(index=False)))
    w = set(map(tuple, want[keys].itertuples(index=False)))
    tp = len(g & w)
    p = tp / len(g) if g else 1.0
    r = tp / len(w) if w else 1.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f, "got": len(g), "want": len(w)}


def length_histogram(ds: ray.data.Dataset, list_column: str, bucket: int = 100) -> pd.DataFrame:
    """Token-length histogram in len//bucket buckets (Corpus.cs:210-213,
    246-268): partial counts per batch -> tiny groupby sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        lens = pc.list_value_length(batch.column(list_column))
        b = pc.cast(pc.floor(pc.divide(pc.cast(lens, pa.float64()), float(bucket))), pa.int64())
        t = pa.Table.from_arrays([b], names=["bucket"])
        g = t.group_by(["bucket"]).aggregate([([], "count_all")])
        return g.rename_columns(["bucket", "n"])

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby("bucket").aggregate(
        Sum("n", alias_name="n")
    )
    return agg.to_pandas().sort_values("bucket").reset_index(drop=True)
