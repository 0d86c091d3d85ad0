"""search_after deep paging: the next k hits STRICTLY after a
(round(score,6), doc_id) cursor in ranking order, rank restarting at 1
per page (Elasticsearch search_after semantics)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.bm25 import bm25_topk, bm25_topk_sql
from instructor_embedding_spark.query.wand import wand_topk

QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "batch key stream"),
]
CUR_SCHEMA = "query_id long, after_score double, after_doc long"


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    """240 docs + an identical copy at doc_id+10000: every score is a
    >=2-way tie, so page boundaries land inside tie runs and the doc_id
    tie-break on the cursor is always exercised."""
    base = datagen.corpus(spark, 240, partitions=4)
    twin = base.withColumn("doc_id", F.col("doc_id") + F.lit(10000))
    return base.unionByName(twin).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("sa") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="sa"),
        text_col="content",
    )


def _cursor_from(page_rows, spark):
    """Cursor table = each query's LAST hit on the given page."""
    last = {}
    for q, rank, d, s in page_rows:
        if q not in last or rank > last[q][0]:
            last[q] = (rank, s, d)
    return spark.createDataFrame(
        [(q, s, d) for q, (_, s, d) in last.items()], CUR_SCHEMA
    )


def test_pages_stitch_into_full_ranking(spark, corpus, queries):
    full = _rows(bm25_topk(corpus, queries, k=20, text_col="content"))
    p1 = _rows(bm25_topk(corpus, queries, k=10, text_col="content"))
    cur = _cursor_from(p1, spark)
    p2 = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                         search_after=cur))
    stitched = sorted(p1 + [(q, r + 10, d, s) for q, r, d, s in p2])
    assert stitched == full
    assert p2  # page 2 non-empty (480-doc corpus, every query matches)


def test_wand_paging_rank_identical_to_bruteforce(
    spark, corpus, built, queries
):
    p1 = _rows(wand_topk(spark, built, queries, k=10))
    cur = _cursor_from(p1, spark)
    got = _rows(wand_topk(spark, built, queries, k=10, search_after=cur))
    want = _rows(bm25_topk(corpus, queries, k=10, text_col="content",
                           search_after=cur))
    assert got == want
    assert got


def test_wand_pages_cover_everything_without_overlap(
    spark, corpus, built, queries
):
    """Walk ALL pages; union must equal the unpaged full ranking with no
    duplicates — the strongest stitch test, crossing many tie runs."""
    full = _rows(wand_topk(spark, built, queries, k=100000))
    seen, page_rows = [], _rows(wand_topk(spark, built, queries, k=50))
    last: dict[int, tuple] = {}  # cumulative: exhausted queries keep
    guard = 0                    # their final cursor and page empty
    while page_rows:
        seen.extend(page_rows)
        for q, rank, d, s in page_rows:
            if q not in last or rank > last[q][0]:
                last[q] = (rank, s, d)
        cur = spark.createDataFrame(
            [(q, s, d) for q, (_, s, d) in last.items()], CUR_SCHEMA
        )
        page_rows = _rows(
            wand_topk(spark, built, queries, k=50, search_after=cur)
        )
        # reset rank-vs-cursor comparison per page: ranks restart at 1
        last = {q: (0, s, d) for q, (_, s, d) in last.items()}
        guard += 1
        assert guard < 30
    assert sorted((q, d) for q, _, d, _ in seen) == sorted(
        (q, d) for q, _, d, _ in full
    )
    assert len(seen) == len(set((q, d) for q, _, d, _ in seen))


def test_cursor_past_end_is_empty(spark, built, queries):
    cur = spark.createDataFrame(
        [(q, -1.0, 10 ** 9) for q, _ in QUERIES], CUR_SCHEMA
    )
    assert wand_topk(spark, built, queries, k=10,
                     search_after=cur).count() == 0


def test_cursorless_queries_get_first_page(spark, built, queries):
    p1 = _rows(wand_topk(spark, built, queries, k=10))
    cur_q1 = _cursor_from([r for r in p1 if r[0] == 1], spark)
    mixed = _rows(wand_topk(spark, built, queries, k=10,
                            search_after=cur_q1))
    # query 1 advanced to page 2; queries 2/3 repeat page 1 exactly
    assert [r for r in mixed if r[0] != 1] == [r for r in p1 if r[0] != 1]
    assert not (set(r[2] for r in mixed if r[0] == 1)
                & set(r[2] for r in p1 if r[0] == 1))


def test_paging_matches_duckdb_twin(spark, corpus, built, queries):
    p1 = _rows(wand_topk(spark, built, queries, k=10))
    cur_rows = [(q, s, d) for q, (_, s, d) in
                {q: (r, s, d) for q, r, d, s in p1 if r == 10}.items()]
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = bm25_topk_sql("docs", QUERIES, k=10, text_col="content",
                        cursors_values=cur_rows)
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in con.execute(sql).fetchall()
    )
    cur = spark.createDataFrame(cur_rows, CUR_SCHEMA)
    got = [
        (q, r, d, round(s, 6))
        for q, r, d, s in _rows(
            wand_topk(spark, built, queries, k=10, search_after=cur)
        )
    ]
    assert got == want
    assert got
