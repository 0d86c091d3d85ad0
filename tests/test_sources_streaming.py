"""BeIR source round-trip, streaming incremental index, windowed rollup,
clustering v-measure."""

from __future__ import annotations

import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.analytics.clustering import (
    kmeans_assign,
    v_measure,
)
from instructor_embedding_spark.index.build import IndexParams
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.wand import wand_topk
from instructor_embedding_spark.sources.beir import read_beir, write_beir
from instructor_embedding_spark.streaming.incremental import (
    compact,
    stream_build_batch_indexes,
    windowed_event_rollup,
)


def test_beir_roundtrip(spark, tmp_path):
    n = 120
    docs = datagen.corpus(spark, n, partitions=2)
    queries = datagen.queries_df(spark)
    qrels = datagen.qrels_df(spark, n)
    out = str(tmp_path / "beir")
    write_beir(docs, queries, qrels, out)
    d2, q2, r2 = read_beir(spark, out)
    assert d2.count() == n
    assert q2.count() == queries.count()
    assert r2.count() == qrels.count()
    # content survives (title empty → trim(concat) == original content)
    orig = {r.doc_id: r.content for r in docs.collect()}
    back = {r.doc_id: r.content for r in d2.collect()}
    assert back == orig


def test_streaming_incremental_index_matches_batch(spark, tmp_path):
    """3 micro-batches streamed → per-batch indexes → compact → query
    results rank-identical to a batch brute-force over the full corpus."""
    n = 240
    docs = datagen.corpus(spark, n, partitions=1).cache()
    in_dir = str(tmp_path / "incoming")
    # three disjoint doc batches land as separate files
    for i, lo in enumerate(range(0, n, 80)):
        docs.filter(f"doc_id >= {lo} AND doc_id < {lo + 80}").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    root = str(tmp_path / "idx")
    params = IndexParams(doc_block_span=64, n_sub_blocks=4,
                         corpus_fingerprint="stream")
    batches = stream_build_batch_indexes(spark, in_dir, root, params)
    assert len(batches) == 3
    merged = compact(spark, root)
    assert merged.n_docs == n

    queries = datagen.queries_df(spark)
    got = sorted(
        (r.query_id, r.rank, r.doc_id)
        for r in wand_topk(spark, merged, queries, k=10).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id)
        for r in bm25_topk(docs, queries, k=10, text_col="content").collect()
    )
    assert got == want


def test_windowed_rollup_stream_equals_batch(spark, sf_small_dir, tmp_path):
    events = spark.read.parquet(f"{sf_small_dir}/events.parquet")
    batch = windowed_event_rollup(events, streaming=False)
    want = sorted(map(tuple, batch.collect()))

    # file stream source needs a DIRECTORY; stage the single parquet file
    ev_dir = str(tmp_path / "events_in")
    events.write.mode("overwrite").parquet(ev_dir)
    stream = spark.readStream.schema(events.schema).parquet(ev_dir)
    rolled = windowed_event_rollup(stream, streaming=True)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM rollup_test").collect()))
    assert got == want


def test_v_measure_boundaries(spark):
    perfect = spark.createDataFrame(
        [(0, 10), (0, 10), (1, 20), (1, 20)], "label int, cluster int"
    )
    r = v_measure(perfect).collect()[0]
    assert r.v_measure == pytest.approx(1.0, abs=1e-9)

    anti = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (1, 1)], "label int, cluster int"
    )
    r2 = v_measure(anti).collect()[0]
    assert r2.v_measure == pytest.approx(0.0, abs=1e-9)


def test_kmeans_vmeasure_runs(spark, sf_small_dir):
    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    assign = kmeans_assign(emb, k=n_labels)
    r = v_measure(assign).collect()[0]
    assert 0.0 <= r.v_measure <= 1.0


def test_logreg_classify_runs(spark, sf_small_dir):
    from instructor_embedding_spark.analytics.clustering import logreg_classify

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    r = logreg_classify(emb).collect()[0]
    assert 0.0 <= r.accuracy <= 1.0
    assert r.n_test == emb.filter("vec_id % 2 = 1").count()


def test_beir_fielded_bm25(spark, tmp_path):
    """D4 v2 end-to-end over a BeIR-shaped corpus: load title/text as
    separate fields via read_beir(concat_title=False) and run the
    field-boosted BM25; a title-only hit must outrank a body-only hit."""
    import json as _json
    import os as _os

    from instructor_embedding_spark.query.bm25 import bm25_topk_fielded

    out = str(tmp_path / "beir_fielded")
    _os.makedirs(f"{out}/corpus.jsonl", exist_ok=True)
    corpus = [
        {"_id": "1", "title": "flink watermark guide",
         "text": "state backend details and checkpoints"},
        {"_id": "2", "title": "other systems",
         "text": "the watermark concept appears once here"},
        {"_id": "3", "title": "unrelated", "text": "nothing relevant"},
    ]
    with open(f"{out}/corpus.jsonl/part-0.json", "w") as f:
        f.write("\n".join(_json.dumps(c) for c in corpus))
    _os.makedirs(f"{out}/queries.jsonl", exist_ok=True)
    with open(f"{out}/queries.jsonl/part-0.json", "w") as f:
        f.write(_json.dumps({"_id": "7", "text": "watermark"}))
    with open(f"{out}/qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n7\t1\t1\n")

    docs, queries, qrels = read_beir(spark, out, concat_title=False)
    assert set(docs.columns) == {"doc_id", "title", "text"}
    ranks = {
        r.doc_id: r.rank
        for r in bm25_topk_fielded(
            docs, queries, k=3, fields=(("title", 2.0), ("text", 1.0))
        ).collect()
    }
    assert ranks[1] == 1 and ranks[2] == 2 and 3 not in ranks


def test_pickle_scan_roundtrip(spark, tmp_path):
    """S5: directory of pickle artifacts -> parallel whole-file scan."""
    import os as _os

    from instructor_embedding_spark.sources.pickled import (
        read_pickle_rows,
        write_pickle_rows,
    )

    d = str(tmp_path / "artifacts")
    _os.makedirs(d)
    write_pickle_rows([(1, "alpha", 0.5), (2, "beta", 1.5)],
                      f"{d}/part0.pkl")
    write_pickle_rows([(3, "gamma", 2.5)], f"{d}/part1.pkl")
    df = read_pickle_rows(spark, d, "id long, name string, score double")
    got = sorted((r.id, r.name, r.score) for r in df.collect())
    assert got == [(1, "alpha", 0.5), (2, "beta", 1.5), (3, "gamma", 2.5)]
    assert df.rdd.getNumPartitions() >= 1


def test_stateful_stream_dedup_equals_batch(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: duplicates planted across
    micro-batches are dropped; with doc_id-ordered ingest the survivor set
    equals the batch rule keep = min(doc_id)."""
    import time as _time

    from instructor_embedding_spark.streaming.stateful import (
        stream_dedup_first_seen,
    )

    rows = [
        (0, "aaa bbb"), (1, "ccc ddd"), (2, "aaa bbb"),      # batch 0
        (3, "eee fff"), (4, "aaa bbb"), (5, "ggg hhh"),      # batch 1
        (6, "ccc ddd"), (7, "iii jjj"), (8, "eee fff"),      # batch 2
    ]
    in_dir = str(tmp_path / "in")
    for b in range(3):
        spark.createDataFrame(
            rows[b * 3:(b + 1) * 3], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = stream_dedup_first_seen(stream)
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) n FROM dedup_out").collect()[0].n
            if n >= 5:
                break
            _time.sleep(1)
    finally:
        q.stop()
    got = {
        (r.content_md5, r.doc_id)
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # batch twin: first-seen == min(doc_id) per content under ordered ingest
    import hashlib as _h

    want = {}
    for did, txt in rows:
        h = _h.md5(txt.encode()).hexdigest()
        want.setdefault(h, did)
    assert got == {(h, d) for h, d in want.items()}
    assert len(got) == 5
