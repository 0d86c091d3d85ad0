"""Wildcard (glob) retrieval and the term suggester, verified against
brute-force rules and the DuckDB twins."""

from __future__ import annotations

import duckdb
import fnmatch
import pytest

from instructor_embedding_spark import datagen
from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.prefix import (
    expand_prefixes,
    expand_wildcards,
    glob_to_like,
    prefix_topk,
    wildcard_topk,
    wildcard_topk_sql,
)
from instructor_embedding_spark.query.suggest import (
    term_suggest,
    term_suggest_sql,
)


def _rows(df):
    return sorted((r.query_id, r.rank, r.doc_id, r.score) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return datagen.corpus(spark, 240, partitions=4).cache()


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    return build_index(
        spark, corpus,
        str(tmp_path_factory.mktemp("wc") / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="wc"),
        text_col="content",
    )


@pytest.fixture(scope="module")
def docs_view(corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("wcdk") / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    return con


# ----------------------------------------------------------- wildcard


def test_glob_to_like_escapes_like_metachars():
    assert glob_to_like("mer*") == "mer%"
    assert glob_to_like("s?rt") == "s_rt"
    assert glob_to_like("a%b_c\\d") == "a\\%b\\_c\\\\d"


def test_expansion_matches_fnmatch(spark, built):
    """The expansion equals Python fnmatch over the dictionary (cap not
    binding at this vocabulary size)."""
    terms = [r.term for r in built.term_stats(spark).collect()]
    for pat in ("mer*", "s?rt", "b*ch", "ha*h"):
        want = sorted(t for t in terms if fnmatch.fnmatchcase(t, pat))
        got = sorted(
            r.term for r in expand_wildcards(
                spark, built.term_stats(spark), [(1, pat)]
            ).collect()
        )
        assert got == want, pat


def test_leading_wildcard_rejected(spark, built):
    for pat in ("*foo", "?bar", ""):
        with pytest.raises(ValueError):
            expand_wildcards(spark, built.term_stats(spark), [(1, pat)])


def test_pure_prefix_glob_equals_prefix_query(spark, built):
    """``mer*`` through the wildcard path must rank exactly like the
    dedicated prefix query — same expansion, same scorer."""
    got = _rows(wildcard_topk(spark, built, [(1, "mer*")], k=10))
    want = _rows(prefix_topk(spark, built, [(1, "mer")], k=10))
    assert got == want and len(got) > 0


def test_star_expansion_supersets_question_mark(spark, built):
    """``s*t`` matches every ``s?t``-style term plus longer runs: the
    ?-expansion is a subset of the *-expansion."""
    star = {
        r.term for r in expand_wildcards(
            spark, built.term_stats(spark), [(1, "s*t")]
        ).collect()
    }
    hole = {
        r.term for r in expand_wildcards(
            spark, built.term_stats(spark), [(1, "s?t")]
        ).collect()
    }
    assert hole <= star


def test_wildcard_topk_matches_duckdb_twin(spark, built, docs_view):
    queries = [(1, "mer*"), (2, "s?rt"), (3, "b*ch"), (4, "zz*qx")]
    got = [
        (a, b, c, round(d, 6))
        for a, b, c, d in _rows(wildcard_topk(spark, built, queries, k=10))
    ]
    want = sorted(
        (r[0], r[1], r[2], round(r[3], 6))
        for r in docs_view.execute(
            wildcard_topk_sql("docs", queries, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want and len(got) > 0
    assert not any(q == 4 for q, *_ in got)


def test_two_pattern_query_scores_shared_terms_once(spark, built):
    """A term matched by both of a query's patterns must score once:
    the pair (mer*, m?rge) ranks exactly like the single pattern whose
    expansion is their union."""
    both = _rows(wildcard_topk(spark, built, [(7, "mer*"), (7, "m?rge")],
                               k=10))
    one = _rows(wildcard_topk(spark, built, [(7, "mer*")], k=10))
    exp_union = {
        r.term for r in expand_wildcards(
            spark, built.term_stats(spark), [(7, "mer*"), (7, "m?rge")]
        ).collect()
    }
    exp_one = {
        r.term for r in expand_wildcards(
            spark, built.term_stats(spark), [(7, "mer*")]
        ).collect()
    }
    if exp_union == exp_one:
        assert both == one


# ----------------------------------------------------------- suggester


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_matches_bruteforce_rule(spark, built):
    """mode=always equals the brute-force candidate rule + (dist,
    df desc, term) ordering computed driver-side."""
    stats = {r.term: r.df for r in built.term_stats(spark).collect()}
    for qterm in ("merg", "hsah", "sortt"):
        cand = [
            (t, _lev(t, qterm), df) for t, df in stats.items()
            if t[0] == qterm[0] and abs(len(t) - len(qterm)) <= 2
            and 1 <= _lev(t, qterm) <= 2
        ]
        cand.sort(key=lambda x: (x[1], -x[2], x[0]))
        want = [(i + 1, t, d, df) for i, (t, d, df) in enumerate(cand[:5])]
        got = sorted(
            (r.rank, r.suggestion, r.dist, r.df)
            for r in term_suggest(
                spark, built.term_stats(spark), [(1, qterm)]
            ).collect()
        )
        assert got == sorted(want), qterm


def test_suggest_never_returns_input_term(spark, built):
    """For a dictionary term that HAS in-dictionary neighbors, the
    suggestions are exactly the neighbors — never the term itself."""
    stats = {r.term: r.df for r in built.term_stats(spark).collect()}
    qterm = next(
        t for t in sorted(stats)
        if any(u != t and u[0] == t[0] and abs(len(u) - len(t)) <= 2
               and _lev(u, t) <= 2 for u in stats)
    )
    got = {
        r.suggestion for r in term_suggest(
            spark, built.term_stats(spark), [(1, qterm)]
        ).collect()
    }
    assert qterm not in got and got


def test_suggest_modes(spark, built):
    """missing drops in-dictionary inputs; popular keeps only
    strictly-more-frequent suggestions; both are subsets of always."""
    stats = {r.term: r.df for r in built.term_stats(spark).collect()}
    assert "merge" in stats
    queries = [(1, "merge"), (2, "merg")]
    alw = term_suggest(spark, built.term_stats(spark), queries,
                       mode="always").collect()
    mis = term_suggest(spark, built.term_stats(spark), queries,
                       mode="missing").collect()
    pop = term_suggest(spark, built.term_stats(spark), queries,
                       mode="popular").collect()
    assert {r.query_id for r in mis} == {2}
    assert all(r.df > stats.get("merge", 0) for r in pop if r.query_id == 1)
    key = lambda r: (r.query_id, r.suggestion)
    assert {key(r) for r in mis} <= {key(r) for r in alw}
    assert {key(r) for r in pop} <= {key(r) for r in alw}


@pytest.mark.parametrize("mode", ["always", "missing", "popular"])
def test_suggest_matches_duckdb_twin(spark, built, docs_view, mode):
    queries = [(1, "merge"), (2, "merg"), (3, "hsah"), (4, "zzqqxv")]
    got = sorted(
        tuple(r) for r in term_suggest(
            spark, built.term_stats(spark), queries, mode=mode
        ).collect()
    )
    want = sorted(
        tuple(r) for r in docs_view.execute(
            term_suggest_sql("docs", queries, mode=mode, text_col="content")
        ).fetchall()
    )
    assert got == want
    if mode != "missing":
        assert len(got) > 0
    assert not any(r[0] == 4 for r in got)


# ----------------------------------------------------------- completion


def test_completion_matches_bruteforce_rule(spark, built):
    from instructor_embedding_spark.query.suggest import complete_prefix

    terms = {
        r.term: r.df for r in built.term_stats(spark).collect()
    }
    got = complete_prefix(
        spark, built.term_stats(spark), [(1, "par")], k=5
    ).collect()
    want = sorted(
        ((-df, t) for t, df in terms.items() if t.startswith("par")),
    )[:5]
    assert [(r.suggestion, r.df) for r in
            sorted(got, key=lambda r: r.rank)] == [
        (t, -negdf) for negdf, t in want
    ]
    # the prefix itself, when a term, appears with dist 0
    for r in got:
        assert r.dist == len(r.suggestion) - 3


def test_completion_weight_order_and_dead_prefix(spark, built):
    from instructor_embedding_spark.query.suggest import complete_prefix

    got = complete_prefix(
        spark, built.term_stats(spark), [(1, "p"), (2, "zzqx")], k=5
    ).collect()
    assert not [r for r in got if r.query_id == 2]
    dfs = [r.df for r in sorted(
        (r for r in got if r.query_id == 1), key=lambda r: r.rank
    )]
    assert dfs == sorted(dfs, reverse=True)
    assert len(dfs) == 5  # the cap binds on a single-char prefix


def test_completion_twin_matches_duckdb(spark, built, docs_view):
    from instructor_embedding_spark.query.suggest import (
        complete_prefix,
        complete_prefix_sql,
    )

    qv = [(1, "par"), (2, "s"), (3, "zzqx")]
    got = sorted(
        tuple(r)
        for r in complete_prefix(
            spark, built.term_stats(spark), qv, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in docs_view.execute(
            complete_prefix_sql("docs", qv, text_col="content")
        ).fetchall()
    )
    assert got == want
