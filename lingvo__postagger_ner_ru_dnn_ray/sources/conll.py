"""CoNLL-ish labeled-corpus source and corpus utilities.

The reference ingests training/validation corpora as text files with one
``token<TAB or SPACE>label`` per line and a blank line as sentence boundary
(Corpus.ConvertTrainFile2SeqLabelFormat, Corpus/Corpus.cs:451-565,528-552),
converting to parallel src/tgt temp files plus a byte-offset map for
random access + epoch shuffling (Corpus.cs:35-118,195-319).

Ray-Data-native equivalent: FILES are the parallel unit (a corpus is many
shard files); each file parses in one task into rows
(src_tokens:list<string>, tgt_labels:list<string>) — no temp files, no
offset maps (Arrow blocks are random-access), and epoch shuffling is
``ds.random_shuffle()``. Train/valid split (CorpusCorrector Program.cs:
53-66) maps to ``Dataset.split_proportionately``.
"""
from __future__ import annotations

import pyarrow as pa
import ray.data

CORPUS_SCHEMA = pa.schema(
    [
        ("sent_id", pa.int64()),
        ("src_tokens", pa.list_(pa.string())),
        ("tgt_labels", pa.list_(pa.string())),
    ]
)


def parse_conll_text(text: str) -> list[tuple[list[str], list[str]]]:
    """Blank-line-delimited sentences; token/label split on first TAB else
    last SPACE (Corpus.cs:497-516 tries tab first, then space)."""
    sents: list[tuple[list[str], list[str]]] = []
    src: list[str] = []
    tgt: list[str] = []
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            if src:
                sents.append((src, tgt))
                src, tgt = [], []
            continue
        if "\t" in line:
            tok, _, lab = line.partition("\t")
        else:
            tok, _, lab = line.rpartition(" ")
        tok = tok.strip()
        lab = lab.strip()
        if not tok:
            tok, lab = lab, ""
        src.append(tok)
        tgt.append(lab)
    if src:
        sents.append((src, tgt))
    return sents


def read_conll(paths: str | list[str]) -> ray.data.Dataset:
    """Distributed CoNLL reader: one task per shard file; sent_id is
    file-order stable (hash(path), index) -> flattened to a global id."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        ids, srcs, tgts = [], [], []
        for path, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            import zlib

            base = zlib.crc32(str(path).encode()) << 20
            for i, (src, tgt) in enumerate(parse_conll_text(data.decode("utf-8"))):
                ids.append(base + i)
                srcs.append(src)
                tgts.append(tgt)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(srcs, pa.list_(pa.string())),
             pa.array(tgts, pa.list_(pa.string()))],
            schema=CORPUS_SCHEMA,
        )

    return files.map_batches(parse, batch_format="pyarrow")


def filter_too_long(ds: ray.data.Dataset, max_len: int = 220, truncate: bool = False) -> ray.data.Dataset:
    """TooLongSequence handling (Corpus.cs:21-25,272-274; SntPair.cs:35-47):
    drop or truncate sentences longer than MaxTrainSentLength."""

    def fn(batch: pa.Table) -> pa.Table:
        src = batch.column("src_tokens").to_pylist()
        tgt = batch.column("tgt_labels").to_pylist()
        ids = batch.column("sent_id").to_pylist()
        o_i, o_s, o_t = [], [], []
        for i, s, t in zip(ids, src, tgt):
            if len(s) > max_len:
                if not truncate:
                    continue
                s, t = s[:max_len], t[:max_len]
            o_i.append(i)
            o_s.append(s)
            o_t.append(t)
        return pa.Table.from_arrays(
            [pa.array(o_i, pa.int64()), pa.array(o_s, pa.list_(pa.string())),
             pa.array(o_t, pa.list_(pa.string()))],
            schema=CORPUS_SCHEMA,
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def train_valid_split(ds: ray.data.Dataset, valid_fraction: float = 0.1):
    """split_by_train_and_valid (CorpusCorrector Program.cs:53-66)."""
    train, valid = ds.split_proportionately([1.0 - valid_fraction])
    return train, valid


def build_vocab_table(ds: ray.data.Dataset, column: str = "src_tokens",
                      vocab_size: int | None = None) -> pa.Table:
    """Vocab build = distributed frequency count (partial per batch →
    groupby sum), freq-desc truncation, ids from START_MEANING_INDEX=3
    (CorpusBatch.InnerBuildVocab, Corpus/CorpusBatch.cs:156-221;
    Vocab.cs:27,48-54). Returns a small driver-side Arrow table
    (token, freq, id) — the vocab itself is broadcast-sized."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(batch.column(column))
        t = pa.Table.from_arrays([toks], names=["token"])
        g = t.group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "freq"])

    agg = ds.map_batches(partials, batch_format="pyarrow").groupby("token").aggregate(
        Sum("freq", alias_name="freq")
    )
    out = agg.sort(["freq", "token"], descending=[True, False])
    if vocab_size is not None:
        out = out.limit(max(0, vocab_size - 3))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    ids = pa.array(range(3, 3 + tbl.num_rows), pa.int64())
    return tbl.append_column("id", ids)
