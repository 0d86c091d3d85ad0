"""Query-string search: parser, compile semantics, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.qstring import (
    parse_query_string,
    qstring_topk,
    qstring_topk_sql,
)


def _rows(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


# ------------------------------------------------------------------ parser


def test_parse_clause_kinds():
    sp = parse_query_string('+merge sort -window "hash join" par* fuzz~2')
    assert sp.must == ["merge"]
    assert sp.should == ["sort"]
    assert sp.must_not == ["window"]
    assert sp.phrases == [["hash", "join"]]
    assert sp.prefixes == ["par"]
    assert sp.fuzzies == [("fuzz", 2)]


def test_parse_analyzer_runs_inside_clauses():
    # camelCase splits; stopwords drop silently (Lucene-style)
    sp = parse_query_string("+BatchStream the -sparkJoin")
    assert sp.must == ["batch", "stream"]
    assert sp.should == []
    assert sp.must_not == ["spark", "join"]


def test_parse_bare_tilde_defaults_one_edit():
    assert parse_query_string("merge~").fuzzies == [("merge", 1)]


@pytest.mark.parametrize("bad", [
    '"unbalanced',
    "(grouped)",
    "a | b",
    "field:term",
    '"phrase"~2',
    '-"negated phrase"',
    "term~3",
    "mid*dle*",
    "+",
    "-",
])
def test_parse_rejects_unsupported(bad):
    with pytest.raises(ValueError):
        parse_query_string(bad)


def test_scoring_terms_deduped_in_order():
    sp = parse_query_string('merge "merge sort" +sort')
    assert sp.scoring_terms == ["merge", "sort"]


# ----------------------------------------------------------------- compile


def test_plain_or_equals_bm25(spark, corpus):
    qs = [(1, "merge posting segments"), (2, "salted shuffle router")]
    got = _rows(qstring_topk(spark, corpus, qs, k=10, text_col="content"))
    want = _rows(bm25_topk(
        corpus,
        spark.createDataFrame(qs, "query_id long, query_text string"),
        k=10, text_col="content",
    ))
    assert got == want and len(got) > 0


def test_all_must_equals_require_all(spark, corpus):
    got = _rows(qstring_topk(
        spark, corpus, [(1, "+merge +posting")], k=10, text_col="content"
    ))
    want = _rows(bm25_topk(
        corpus,
        spark.createDataFrame(
            [(1, "merge posting")], "query_id long, query_text string"
        ),
        k=10, text_col="content", require_all=True,
    ))
    assert got == want and len(got) > 0


def test_negation_removes_exactly_matching_docs(spark, corpus):
    plain = qstring_topk(
        spark, corpus, [(1, "merge posting")], k=10**6, text_col="content"
    )
    negated = qstring_topk(
        spark, corpus, [(1, "merge posting -checkpoint")],
        k=10**6, text_col="content",
    )
    neg_ids = {r.doc_id for r in negated.collect()}
    has_term = {
        r.doc_id
        for r in corpus.filter(
            corpus.content.contains("checkpoint")
        ).select("doc_id").collect()
    }
    plain_ids = {r.doc_id for r in plain.collect()}
    assert neg_ids == plain_ids - has_term
    assert len(plain_ids) > len(neg_ids) > 0


def test_phrase_filters_to_adjacent_docs(spark, corpus):
    # planted ident tokenizes to this exact token run
    got = qstring_topk(
        spark, corpus, [(1, '"merge posting segments"')],
        k=10**6, text_col="content",
    )
    ids = {r.doc_id for r in got.collect()}
    planted = {
        i for i in range(240) if i % 83 == 11  # mergePostingSegments docs
    }
    assert ids == planted and planted


def test_phrase_order_matters(spark, corpus):
    fwd = qstring_topk(
        spark, corpus, [(1, '"posting merge"')], k=10**6,
        text_col="content",
    ).count()
    assert fwd == 0  # reversed run never planted


def test_pure_negation_returns_nothing(spark, corpus):
    assert qstring_topk(
        spark, corpus, [(1, "-merge")], k=10, text_col="content"
    ).count() == 0


def test_twin_matches_duckdb(spark, corpus, tmp_path):
    qs = [
        (1, "merge posting segments"),
        (2, "+merge posting"),
        (3, "merge -checkpoint"),
        (4, '"merge posting segments"'),
        (5, "mer* header"),
        (6, "mergee~1 posting"),
        (7, '+merge -lineage "posting segments"'),
        (8, "-merge"),
        (9, "the of a"),
    ]
    got = _rows(qstring_topk(spark, corpus, qs, k=10, text_col="content"))
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in con.execute(
            qstring_topk_sql("docs", qs, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0
    # at least one row for every query that can match
    qids = {q for q, *_ in got}
    assert {1, 2, 3, 4, 5, 6, 7} <= qids and 8 not in qids and 9 not in qids
