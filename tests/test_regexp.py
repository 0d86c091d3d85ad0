"""Regexp retrieval (Lucene RegexpQuery): anchored full-match dictionary
expansion through the unchanged WAND pipeline, Java/RE2 common-subset
validation, and the DuckDB twin."""

from __future__ import annotations

import re

import duckdb
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.prefix import (
    expand_regexp,
    prefix_topk,
    regexp_topk,
    regexp_topk_sql,
    validate_regexp,
)

PATTERNS = [
    (1, "mer.*"),            # pure-prefix regex
    (2, "s[aeiou]rt"),       # character class
    (3, "b(at|un)ch"),       # alternation
    (4, "zz.*qx"),           # no-match probe
]


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("rx") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="rx"),
        text_col="content",
    )


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


def test_validator_accepts_common_subset():
    for p in ["mer.*", "s[aeiou]rt", "b(at|un)ch", r"\d+x", "a{2,3}b",
              "(?:ab|cd)e", r"\w+_\w+", "x.?y", "a*?b"]:
        assert validate_regexp(p) == p


def test_validator_rejects_divergent_constructs():
    with pytest.raises(ValueError, match="lookaround"):
        validate_regexp("a(?=b)")
    with pytest.raises(ValueError, match="lookaround"):
        validate_regexp("a(?<name>b)")
    with pytest.raises(ValueError, match="backreference"):
        validate_regexp(r"(a)\1")
    with pytest.raises(ValueError, match="possessive"):
        validate_regexp("ab*+")
    with pytest.raises(ValueError, match="possessive"):
        validate_regexp("a{2}+b")
    with pytest.raises(ValueError, match="empty"):
        validate_regexp("")
    with pytest.raises(ValueError, match="invalid"):
        validate_regexp("a[b")


def test_expansion_matches_python_fullmatch(spark, built):
    """The dictionary expansion IS re.fullmatch over the vocabulary
    (up to the ascending-term cap, not hit by this fixture)."""
    ts = built.term_stats(spark)
    vocab = sorted(r.term for r in ts.select("term").collect())
    got = sorted(
        (r.query_id, r.term)
        for r in expand_regexp(spark, ts, PATTERNS).collect()
    )
    want = sorted(
        (qid, t)
        for qid, p in PATTERNS
        for t in vocab
        if re.fullmatch(p, t)
    )
    assert got == want
    assert len(got) > 0


def test_prefix_regex_rank_identical_to_prefix_query(spark, built):
    a = _rows(regexp_topk(spark, built, [(9, "mer.*")], k=10))
    b = _rows(prefix_topk(spark, built, [(9, "mer")], k=10))
    assert a == b
    assert len(a) > 0


def test_twin_parity(spark, corpus, built):
    got = _rows(regexp_topk(spark, built, PATTERNS, k=10))
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in con.execute(
            regexp_topk_sql("docs", PATTERNS, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0
    # the no-match probe produced nothing
    assert not [r for r in got if r[0] == 4]


def test_expansion_cap_ascending_order(spark, built):
    ts = built.term_stats(spark)
    capped = sorted(
        r.term for r in expand_regexp(spark, ts, [(1, ".*")],
                                      max_expansions=5).collect()
    )
    vocab = sorted(r.term for r in ts.select("term").collect())
    assert capped == vocab[:5]
