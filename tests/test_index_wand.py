"""Index build + block-max WAND: rank identity vs brute-force oracle,
checkpoint/restart, lineage manifests (north-rule gates)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import (
    IndexParams,
    build_index,
    load_index,
)
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.wand import wand_topk

N_DOCS = 600
PARAMS = IndexParams(
    doc_block_span=128, n_sub_blocks=8, corpus_fingerprint=f"datagen:{N_DOCS}:42"
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("index"))
    docs = datagen.corpus(spark, N_DOCS, partitions=7)
    handle = build_index(spark, docs, idx_dir, PARAMS, text_col="content")
    return handle, docs


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in df.collect()
    )


def test_wand_rank_identical_to_bruteforce(spark, built):
    handle, docs = built
    queries = datagen.queries_df(spark)
    want = _rows(
        bm25_topk(docs, queries, k=10, text_col="content", id_col="doc_id")
    )
    got = _rows(wand_topk(spark, handle, queries, k=10))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert g[3] == pytest.approx(w[3], abs=1e-6)


@pytest.mark.parametrize("k", [1, 3, 25, 100])
def test_wand_rank_identity_various_k(spark, built, k):
    handle, docs = built
    queries = datagen.queries_df(spark)
    want = _rows(bm25_topk(docs, queries, k=k, text_col="content"))
    got = _rows(wand_topk(spark, handle, queries, k=k))
    assert [g[:3] for g in got] == [w[:3] for w in want]


def test_skew_term_query(spark, built):
    """The planted skew term appears in ~50% of docs; retrieval must still be
    exact and every returned doc must actually contain it."""
    handle, docs = built
    q = spark.createDataFrame(
        [(99, "shared buffer pool")], "query_id long, query_text string"
    )
    got = _rows(wand_topk(spark, handle, q, k=10))
    want = _rows(bm25_topk(docs, q, k=10, text_col="content"))
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert len(got) == 10


def test_qrels_docs_rank_first(spark, built):
    """Planted-identifier queries must retrieve their relevant docs at the
    top (the corpus plants the identifier verbatim, giving those docs all
    the rare query terms)."""
    handle, _ = built
    queries = datagen.queries_df(spark)
    qrels = {
        (r.query_id, r.doc_id)
        for r in datagen.qrels_df(spark, N_DOCS).collect()
    }
    top1 = {
        r.query_id: r.doc_id
        for r in wand_topk(spark, handle, queries, k=10).collect()
        if r.rank == 1
    }
    for qid, _, ident in datagen.QUERY_SET:
        if ident is None:
            continue
        assert (qid, top1[qid]) in qrels, (qid, top1.get(qid))


def test_lineage_manifests(spark, built):
    handle, _ = built
    mdir = os.path.join(handle.index_dir, "_manifest")
    stages = {"postings_raw", "doc_stats", "doc_lens", "term_stats", "segments"}
    have = {
        json.load(open(p))["stage"]
        for p in glob.glob(os.path.join(mdir, "*.json"))
        if "globals" not in p
    }
    assert stages <= have
    seg = json.load(open(os.path.join(mdir, "segments.json")))
    assert seg["status"] == "complete"
    assert seg["rows"] > 0 and seg["wall_ms"] >= 0
    assert seg["metrics"]["bytes_compressed"] > 0
    # per-block lineage is a parquet side output (never driver-collected);
    # the JSON manifest carries only stage totals + the lineage path
    lin = spark.read.parquet(seg["metrics"]["lineage_path"]).collect()
    parts = {r["partition"] for r in lin}
    assert parts == set(range((N_DOCS + 127) // 128))
    for r in lin:
        assert r["postings"] > 0 and r["bytes"] > 0
    assert seg["metrics"]["lineage_rows"] == len(lin)
    assert seg["metrics"]["bytes_compressed"] == sum(r["bytes"] for r in lin)

    raw = json.load(open(os.path.join(mdir, "postings_raw.json")))
    assert raw["metrics"]["docs_tokenized"] == N_DOCS
    raw_lin = spark.read.parquet(raw["metrics"]["lineage_path"])
    assert raw_lin.count() == len(parts)


def _segment_content(spark, idx_dir):
    df = spark.read.parquet(os.path.join(idx_dir, "segments"))
    rows = df.collect()
    return sorted(
        (
            r.term, r.doc_block, round(r.idf, 12), r.df_block,
            bytes(r.doc_bytes), bytes(r.tf_bytes),
            tuple(r.sub_offsets), tuple(round(x, 12) for x in r.sub_max),
        )
        for r in rows
    )


def test_restart_from_checkpoint(spark, built, tmp_path):
    """Kill-after-postings restart: completed stages are skipped (parquet
    mtimes untouched), final segment CONTENT is identical."""
    handle, docs = built
    before = _segment_content(spark, handle.index_dir)

    seg_files = glob.glob(os.path.join(handle.index_dir, "segments", "*.parquet"))
    mtimes = {p: os.path.getmtime(p) for p in seg_files}

    # resume over a fully-built index: every stage skipped
    h2 = build_index(spark, docs, handle.index_dir, PARAMS, text_col="content")
    assert {p: os.path.getmtime(p) for p in seg_files} == mtimes
    assert h2.n_docs == handle.n_docs and h2.avgdl == handle.avgdl

    # simulate a crash after postings_raw: later manifests missing
    for stage in ("term_stats", "doc_lens", "segments"):
        os.remove(os.path.join(handle.index_dir, "_manifest", f"{stage}.json"))
    raw_files = glob.glob(
        os.path.join(handle.index_dir, "postings_raw", "*.parquet")
    )
    raw_mtimes = {p: os.path.getmtime(p) for p in raw_files}
    build_index(spark, docs, handle.index_dir, PARAMS, text_col="content")
    # postings stage untouched, segments rebuilt to identical content
    assert {p: os.path.getmtime(p) for p in raw_files} == raw_mtimes
    assert _segment_content(spark, handle.index_dir) == before

    # params change invalidates the checkpoint
    p2 = IndexParams(
        doc_block_span=64, n_sub_blocks=8,
        corpus_fingerprint=PARAMS.corpus_fingerprint,
    )
    idx2 = str(tmp_path / "idx2")
    h3 = build_index(spark, docs, idx2, p2, text_col="content")
    assert h3.params.doc_block_span == 64
    got = _rows(wand_topk(spark, h3, datagen.queries_df(spark), k=10))
    want = _rows(
        wand_topk(spark, load_index(spark, handle.index_dir),
                  datagen.queries_df(spark), k=10)
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]


def test_filtered_retrieval_rank_identity(spark, built):
    """doc_filter restricts top-k to the whitelist; scores keep global
    stats; rank-identical to the filtered brute force."""
    handle, docs = built
    queries = datagen.queries_df(spark)
    flt = docs.filter("lang = 'python'").select("doc_id")
    got = _rows(wand_topk(spark, handle, queries, k=10, doc_filter=flt))
    want = _rows(
        bm25_topk(docs, queries, k=10, text_col="content", doc_filter=flt)
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]
    assert len(got) > 0
    allowed = {r.doc_id for r in flt.collect()}
    assert all(g[2] in allowed for g in got)
    # filtered scores equal the unfiltered scores of the same docs
    unf = {(w[0], w[2]): w[3] for w in _rows(
        wand_topk(spark, handle, queries, k=200))}
    for g in got:
        if (g[0], g[2]) in unf:
            assert g[3] == unf[(g[0], g[2])]


def test_index_params_validation():
    """Non-divisible block geometry would silently exclude the trailing doc
    slots of every block from sub-block coverage — rejected at construction."""
    with pytest.raises(ValueError):
        IndexParams(doc_block_span=100, n_sub_blocks=8)
    with pytest.raises(ValueError):
        IndexParams(doc_block_span=0, n_sub_blocks=1)
    assert IndexParams(doc_block_span=96, n_sub_blocks=8).sub_span == 12


def test_wand_scan_stats_invariants(spark, built):
    """The stats twin runs the same kernel loop: every group reports
    0 <= sub_scored <= sub_total == n_sub_blocks, the group keys cover
    the same (query_id, doc_block) set the scoring pass touches, and the
    aggregate skip rate is a valid ratio (bench records it as
    wand_skip_rate)."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.wand import wand_scan_stats

    handle, _ = built
    qdf = datagen.queries_df(spark)
    rows = wand_scan_stats(spark, handle, qdf, k=10).collect()
    assert rows, "stats must cover the scored groups"
    n_sub = handle.params.n_sub_blocks
    for r in rows:
        assert r.sub_total == n_sub
        assert 0 <= r.sub_scored <= r.sub_total
        # zero-UB blocks and scored blocks are disjoint subsets
        assert 0 <= r.sub_zero <= r.sub_total - r.sub_scored
    total = sum(r.sub_total for r in rows)
    scored = sum(r.sub_scored for r in rows)
    assert 0 <= scored <= total
    # stats must not disturb the scoring path (rank identity holds after)
    got = wand_topk(spark, handle, qdf, k=5)
    assert got.count() > 0


def test_doc_row_tf_carries_posting_count(spark, built):
    """The NULL-term doc rows' tf = the doc's distinct retained-term
    count, so per-block lineage aggregates over |docs| rows only; the
    lineage postings totals must equal the true posting-row counts."""
    from pyspark.sql import functions as F

    handle, _ = built
    raw = spark.read.parquet(os.path.join(handle.index_dir, "postings_raw"))
    per_doc = (
        raw.filter(F.col("term").isNotNull())
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    doc_rows = raw.filter(F.col("term").isNull()).select("doc_id", "tf")
    joined = doc_rows.join(per_doc, "doc_id", "left").select(
        "doc_id", "tf", F.coalesce("n", F.lit(0)).alias("n")
    )
    bad = joined.filter(F.col("tf") != F.col("n")).count()
    assert bad == 0

    m = json.load(open(os.path.join(
        handle.index_dir, "_manifest", "postings_raw.json")))
    lin = spark.read.parquet(m["metrics"]["lineage_path"])
    tot = lin.agg(F.sum("docs"), F.sum("postings")).collect()[0]
    assert int(tot[0]) == N_DOCS
    assert int(tot[1]) == raw.filter(F.col("term").isNotNull()).count()
