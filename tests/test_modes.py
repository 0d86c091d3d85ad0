"""Search modes (collapse / sort / range / synonym / more-like-this):
semantics properties plus line-for-line DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query import modes

QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "a of the"),  # all stopwords: empty everywhere
]

SYNONYMS = [("sort", "order"), ("join", "merge")]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    base = datagen.corpus(spark, 240, partitions=4)
    return base.withColumn(
        "grp",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    ).withColumn("n_chars", F.length("content")).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


@pytest.fixture(scope="module")
def oracle(corpus):
    pdf = corpus.select("doc_id", "content", "grp", "n_chars").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    return con


def _twin(con, sql):
    return sorted(
        (int(q), int(r), int(d), round(float(s), 6))
        for q, r, d, s in con.execute(sql).fetchall()
    )


# ---------------------------------------------------------------------------
# collapse


def test_collapse_one_hit_per_group(spark, corpus, queries):
    got = modes.collapse_topk(corpus, queries, "grp", k=10,
                              text_col="content")
    joined = got.join(corpus.select("doc_id", "grp"), "doc_id")
    per_group = joined.groupBy("query_id", "grp").count()
    assert per_group.filter("count > 1").count() == 0
    # each representative is its group's best-scoring doc
    full = bm25_topk(corpus, queries, k=10 ** 9, text_col="content") \
        .join(corpus.select("doc_id", "grp"), "doc_id")
    best = (
        full.groupBy("query_id", "grp")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"),
                            F.col("doc_id"))).alias("m"))
        .select("query_id", "grp", F.col("m.doc_id").alias("doc_id"))
    )
    assert _rows(joined.select("query_id", "grp", "doc_id")) == \
        _rows(best.join(joined.select("query_id", "grp"),
                        ["query_id", "grp"], "left_semi")
              .select("query_id", "grp", "doc_id"))


def test_collapse_matches_twin(spark, corpus, queries, oracle):
    got = _rows(modes.collapse_topk(corpus, queries, "grp", k=10,
                                    text_col="content"))
    want = _twin(oracle, modes.collapse_topk_sql(
        "docs", QUERIES, "grp", k=10, text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in got] == want
    assert got  # non-degenerate
    assert not [r for r in got if r[0] == 3]  # stopword query empty


# ---------------------------------------------------------------------------
# sort-by-field


def test_sort_orders_by_field_not_score(spark, corpus, queries, oracle):
    got = modes.sort_topk(corpus, queries, "n_chars", k=10,
                          text_col="content")
    # rank order must follow (n_chars DESC, doc_id ASC)
    joined = got.join(corpus.select("doc_id", "n_chars"), "doc_id") \
        .orderBy("query_id", "rank").collect()
    for a, b in zip(joined, joined[1:]):
        if a.query_id == b.query_id:
            assert (a.n_chars, -a.doc_id) >= (b.n_chars, -b.doc_id)
    want = _twin(oracle, modes.sort_topk_sql(
        "docs", QUERIES, "n_chars", k=10, text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in _rows(got)] == want


def test_sort_membership_is_the_match_set(spark, corpus, queries):
    # sorted hits are drawn from the same OR match set as relevance top-k
    full = bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
    got = modes.sort_topk(corpus, queries, "n_chars", k=10 ** 9,
                          text_col="content")
    assert _rows(got.select("query_id", "doc_id")) == \
        _rows(full.select("query_id", "doc_id"))


# ---------------------------------------------------------------------------
# range filter


def test_range_matches_doc_filter_semantics(spark, corpus, queries, oracle):
    lo, hi = 200, 600
    keep = corpus.filter((F.col("n_chars") >= lo) & (F.col("n_chars") < hi)) \
        .select("doc_id")
    want_df = bm25_topk(corpus, queries, k=10, text_col="content",
                        doc_filter=keep)
    got = modes.range_topk(corpus, queries, "n_chars", lo, hi, k=10,
                           text_col="content")
    assert _rows(got) == _rows(want_df)
    want = _twin(oracle, modes.range_topk_sql(
        "docs", QUERIES, "n_chars", lo, hi, k=10, text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in _rows(got)] == want
    # the filter actually bites: some full-set hit is outside the range
    n_full = bm25_topk(corpus, queries, k=10, text_col="content").count()
    assert got.count() < n_full


# ---------------------------------------------------------------------------
# synonym blending


def test_synonym_matches_twin_and_expands_matches(spark, corpus, queries,
                                                  oracle):
    got = modes.synonym_topk(corpus, queries, SYNONYMS, k=10,
                             text_col="content")
    want = _twin(oracle, modes.synonym_topk_sql(
        "docs", QUERIES, SYNONYMS, k=10, text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in _rows(got)] == want
    assert want


def test_synonym_blend_sums_tf_max_df(spark):
    """Hand-computable fixture: 'sort'~'order'.  A doc with only 'order'
    matches a 'sort' query; a doc with both blends tf inside ONE
    saturation (score strictly below two independent terms' sum)."""
    docs = spark.createDataFrame(
        [(1, "sort sort alpha"), (2, "order beta"), (3, "sort order"),
         (4, "gamma delta")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "sort")],
                               "query_id long, query_text string")
    got = {r.doc_id: r.score
           for r in modes.synonym_topk(docs, qs, [("sort", "order")],
                                       k=10).collect()}
    assert set(got) == {1, 2, 3}  # doc 2 matches via the synonym
    import math
    # blended stats: df = max(df_sort, df_order) = 2, n=4, avgdl from docs
    n, avgdl = 4.0, (3 + 2 + 2 + 2) / 4.0
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def sat(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert got[1] == pytest.approx(idf * sat(2, 3), abs=2e-6)
    assert got[2] == pytest.approx(idf * sat(1, 2), abs=2e-6)
    assert got[3] == pytest.approx(idf * sat(2, 2), abs=2e-6)
    # one saturation over tf=2, NOT two independent tf=1 contributions
    assert got[3] < 2 * idf * sat(1, 2)


def test_synonym_without_synonyms_is_plain_bm25(spark, corpus, queries):
    got = modes.synonym_topk(corpus, queries, [("zzznone", "zzzalt")],
                             k=10, text_col="content")
    want = bm25_topk(corpus, queries, k=10, text_col="content")
    assert _rows(got) == _rows(want)


# ---------------------------------------------------------------------------
# more-like-this


def test_mlt_excludes_seed_and_matches_twin(spark, corpus, oracle):
    seeds = corpus.select("doc_id").orderBy("doc_id").limit(3)
    got = modes.mlt_topk(corpus, seeds, k=10, text_col="content")
    rows = _rows(got)
    assert rows
    for q, _, d, _ in rows:
        assert d != q  # the seed never retrieves itself
    want = _twin(oracle, modes.mlt_topk_sql(
        "docs", "SELECT doc_id FROM docs ORDER BY doc_id LIMIT 3", k=10,
        text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in rows] == want


def test_mlt_seed_terms_are_top_tfidf(spark, corpus):
    """The seed's query terms are its max_terms best tf·idf terms —
    retrieval with those terms hand-fed through bm25_topk agrees."""
    from instructor_embedding_spark.query.bm25 import (
        corpus_stats, term_stats, tf_table, tokenized,
    )
    toks = tokenized(corpus, "content")
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)
    seed = corpus.select("doc_id").orderBy("doc_id").limit(1)
    sid = seed.collect()[0][0]
    top = (
        tf.filter(F.col("doc_id") == sid)
        .join(ts.select("term", "idf"), "term")
        .withColumn("w", F.round(F.col("tf") * F.col("idf"), 6))
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(modes.MLT_MAX_TERMS)
        .select("term").collect()
    )
    terms = " ".join(r.term for r in top)
    qs = corpus.sparkSession.createDataFrame(
        [(int(sid), terms)], "query_id long, query_text string")
    from pyspark.sql import Window
    want = (
        bm25_topk(corpus, qs, k=10 ** 9, text_col="content")
        .filter(F.col("doc_id") != sid)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ).cast("long"),
        )
        .filter(F.col("rank") <= 10)
    )
    got = modes.mlt_topk(corpus, seed, k=10, text_col="content") \
        .filter(F.col("query_id") == sid)
    assert _rows(got) == _rows(want.select("query_id", "rank", "doc_id",
                                           "score"))


# ---------------------------------------------------------- function_score


def test_function_score_none_factor_one_is_identity_on_positive_field(
        spark, corpus, queries):
    """modifier='none', factor=1 over a field equal to 1.0 for every
    doc: multiply blend must reproduce plain BM25 exactly."""
    from pyspark.sql import functions as F

    from instructor_embedding_spark.query.bm25 import bm25_topk
    from instructor_embedding_spark.query.modes import function_score_topk

    ones = corpus.withColumn("unit", F.lit(1))
    got = sorted(
        tuple(r) for r in function_score_topk(
            ones, queries, "unit", factor=1.0, modifier="none",
            boost_mode="multiply", k=10, text_col="content",
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in bm25_topk(corpus, queries, k=10, text_col="content")
        .collect()
    )
    assert got == want


def test_function_score_reorders_by_field(spark):
    """Two docs with identical text: the one with the larger boosted
    field must outrank under multiply."""
    from instructor_embedding_spark.query.modes import function_score_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta", 10), (2, "alpha beta", 1000),
         (3, "noise only", 99999)],
        "doc_id long, text string, pop long",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    got = function_score_topk(
        docs, qdf, "pop", factor=1.0, modifier="ln1p",
        boost_mode="multiply", k=10,
    ).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [2, 1]  # 3 never matches


def test_function_score_twin_and_modes(spark, corpus, queries):
    import duckdb

    from instructor_embedding_spark.query.modes import (
        function_score_topk,
        function_score_topk_sql,
    )

    con = duckdb.connect()
    con.register(
        "docs_pd", corpus.select("doc_id", "content", "n_chars").toPandas()
    )
    qv = [(r["query_id"], r["query_text"]) for r in queries.collect()]
    for modifier, bmode in (("ln1p", "multiply"), ("sqrt", "sum"),
                            ("none", "multiply")):
        got = sorted(
            tuple(r) for r in function_score_topk(
                corpus, queries, "n_chars", factor=0.01,
                modifier=modifier, boost_mode=bmode, k=10,
                text_col="content",
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(function_score_topk_sql(
                "docs_pd", qv, "n_chars", factor=0.01,
                modifier=modifier, boost_mode=bmode, k=10,
                text_col="content",
            )).fetchall()
        )
        assert [g[:3] for g in got] == [w[:3] for w in want], (modifier,
                                                               bmode)
        for g, w in zip(got, want):
            assert abs(g[3] - w[3]) <= 2e-6


# --------------------------------------------------------------- boosting


def test_boosting_demotes_but_keeps(spark):
    from instructor_embedding_spark.query.modes import boosting_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta bad"),
            (2, "alpha beta"),
            (3, "noise only"),
        ],
        "doc_id long, text string",
    )
    plain = boosting_topk(
        docs, [(1, "alpha beta")], [(1, "zzqqxv")], k=10
    ).orderBy("rank").collect()
    demoted = boosting_topk(
        docs, [(1, "alpha beta")], [(1, "bad")], k=10,
        negative_boost=0.1,
    ).orderBy("rank").collect()
    # doc 1 outranks doc 2 on dl/idf? — whatever the plain order, the
    # demoted run must keep BOTH docs but put doc 1 last
    assert {r["doc_id"] for r in plain} == {1, 2}
    assert {r["doc_id"] for r in demoted} == {1, 2}
    assert demoted[-1]["doc_id"] == 1
    d1_plain = [r["score"] for r in plain if r["doc_id"] == 1][0]
    d1_dem = [r["score"] for r in demoted if r["doc_id"] == 1][0]
    import pytest as pt
    assert d1_dem == pt.approx(round(d1_plain * 0.1, 6), abs=2e-6)


def test_boosting_noop_negative_equals_plain(spark, corpus, queries):
    from instructor_embedding_spark.query.bm25 import bm25_topk
    from instructor_embedding_spark.query.modes import boosting_topk

    qv = [(r["query_id"], r["query_text"]) for r in queries.collect()]
    got = sorted(tuple(r) for r in boosting_topk(
        corpus, qv, [(q, "zzqqxv") for q, _ in qv], k=10,
        text_col="content",
    ).collect())
    want = sorted(tuple(r) for r in bm25_topk(
        corpus, queries, k=10, text_col="content"
    ).collect())
    assert got == want


def test_boosting_twin(spark, corpus):
    import duckdb

    from instructor_embedding_spark.query.modes import (
        boosting_topk,
        boosting_topk_sql,
    )

    pos_v = [(1, "merge sort window"), (2, "fast hash join")]
    neg_v = [(1, "data"), (2, "scan")]
    got = sorted(tuple(r) for r in boosting_topk(
        corpus, pos_v, neg_v, k=10, text_col="content"
    ).collect())
    con = duckdb.connect()
    con.register("docs_pd", corpus.select("doc_id", "content").toPandas())
    want = sorted(tuple(r) for r in con.execute(boosting_topk_sql(
        "docs_pd", pos_v, neg_v, k=10, text_col="content"
    )).fetchall())
    assert [g[:3] for g in got] == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) <= 2e-6


# ------------------------------------------------------------------ decay


def test_decay_semantics_at_origin_and_scale(spark):
    """Docs within offset of origin keep full BM25; a doc exactly scale
    past the offset keeps exactly decay of it (gauss/exp/linear agree at
    those two anchor points)."""
    import pytest as pt

    from instructor_embedding_spark.query.bm25 import bm25_topk
    from instructor_embedding_spark.query.modes import decay_score_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", 100),   # at origin
            (2, "alpha beta", 115),   # within offset (|x-o|=15 <= 20)
            (3, "alpha beta", 270),   # d = 150 = scale exactly
        ],
        "doc_id long, text string, ts long",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha beta")], "query_id long, query_text string"
    )
    base = {r["doc_id"]: r["score"]
            for r in bm25_topk(docs, qdf, k=10).collect()}
    for kind in ("gauss", "exp", "linear"):
        got = {r["doc_id"]: r["score"] for r in decay_score_topk(
            docs, qdf, "ts", origin=100.0, scale=150.0, offset=20.0,
            decay=0.5, kind=kind, k=10,
        ).collect()}
        assert got[1] == pt.approx(base[1], abs=2e-6), kind
        assert got[2] == pt.approx(base[2], abs=2e-6), kind
        assert got[3] == pt.approx(round(base[3] * 0.5, 6), abs=2e-6), kind


def test_decay_twin(spark, corpus, queries):
    import duckdb

    from instructor_embedding_spark.query.modes import (
        decay_score_topk,
        decay_score_topk_sql,
    )

    con = duckdb.connect()
    con.register(
        "docs_pd", corpus.select("doc_id", "content", "n_chars").toPandas()
    )
    qv = [(r["query_id"], r["query_text"]) for r in queries.collect()]
    for kind in ("gauss", "exp", "linear"):
        got = sorted(tuple(r) for r in decay_score_topk(
            corpus, queries, "n_chars", origin=250.0, scale=150.0,
            offset=20.0, decay=0.5, kind=kind, k=10, text_col="content",
        ).collect())
        want = sorted(tuple(r) for r in con.execute(decay_score_topk_sql(
            "docs_pd", qv, "n_chars", origin=250.0, scale=150.0,
            offset=20.0, decay=0.5, kind=kind, k=10, text_col="content",
        )).fetchall())
        assert [g[:3] for g in got] == [w[:3] for w in want], kind
        for g, w in zip(got, want):
            assert abs(g[3] - w[3]) <= 2e-6


# ---------------------------------------------------------------------------
# terms_set (per-doc minimum_should_match field)


def test_terms_set_twin_and_floor_semantics(spark, corpus, queries, oracle):
    msm = corpus.select(
        "doc_id", (F.lit(1) + F.col("doc_id") % 3).alias("required")
    )
    got = _rows(modes.terms_set_topk(corpus, queries, msm, k=10,
                                     text_col="content"))
    want = _twin(oracle, modes.terms_set_topk_sql(
        "docs", QUERIES, "1 + doc_id % 3", k=10, text_col="content"))
    assert [(q, r, d, round(s, 6)) for q, r, d, s in got] == want
    assert got
    assert not [r for r in got if r[0] == 3]  # stopword query empty


def test_terms_set_required_one_equals_plain_or(spark, corpus, queries):
    msm1 = corpus.select("doc_id", F.lit(1).alias("required"))
    got = _rows(modes.terms_set_topk(corpus, queries, msm1, k=10,
                                     text_col="content"))
    plain = _rows(bm25_topk(corpus, queries, k=10, text_col="content"))
    assert got == plain


def test_terms_set_unreachable_required_matches_nothing(spark, corpus,
                                                        queries):
    # strict ES semantics: required above the query's term count → no doc
    # can ever reach the floor (no clamping)
    msm99 = corpus.select("doc_id", F.lit(99).alias("required"))
    assert modes.terms_set_topk(corpus, queries, msm99, k=10,
                                text_col="content").count() == 0


# ---------------------------------------------------------------------------
# index-sorted early termination


@pytest.fixture(scope="module")
def sort_index(spark, corpus, tmp_path_factory):
    from instructor_embedding_spark.index.build import (
        IndexParams, build_index,
    )
    root = str(tmp_path_factory.mktemp("sort_idx"))
    return build_index(
        spark, corpus, root,
        IndexParams(doc_block_span=16, n_sub_blocks=4,
                    corpus_fingerprint="modes:sorted_et"),
        text_col="content",
    )


def test_sorted_early_termination_rank_identical(spark, corpus, queries,
                                                 sort_index):
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )
    attrs = corpus.select("doc_id", F.col("n_chars").alias("sort_key"))
    for ascending in (False, True):
        got = _rows(modes.sorted_topk_from_index(
            spark, sort_index, queries, attrs, k=10, ascending=ascending))
        want = _rows(modes.sort_over(
            scored_matches_from_index(spark, sort_index, queries),
            attrs, k=10, ascending=ascending))
        assert got == want and got


def test_sorted_early_termination_actually_prunes(spark, corpus, queries,
                                                  tmp_path_factory):
    """Pruning pays exactly under Lucene's precondition — an index
    SORTED by the field (block value ranges disjoint).  Remap doc_id to
    the n_chars rank, rebuild, and most blocks must be provably below
    the top-k; rank identity must still hold on the sorted corpus."""
    from instructor_embedding_spark.index.build import (
        IndexParams, build_index,
    )
    from instructor_embedding_spark.query.wand import (
        scored_matches_from_index,
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    sorted_docs = (
        corpus.withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
        .cache()
    )
    root = str(tmp_path_factory.mktemp("sorted_idx"))
    h = build_index(
        spark, sorted_docs, root,
        IndexParams(doc_block_span=16, n_sub_blocks=4,
                    corpus_fingerprint="modes:sorted_et_sorted"),
        text_col="content",
    )
    attrs = sorted_docs.select("doc_id", F.col("n_chars").alias("sort_key"))
    verdicts = modes._sorted_block_survivors(
        spark, h, queries, attrs, k=3, ascending=False
    ).collect()
    n = len(verdicts)
    pruned = sum(1 for r in verdicts if r.pruned)
    # 240 docs / span 16 = 15 blocks/query; on a field-sorted index all
    # but the first couple of blocks are provably below the top-3
    assert n > 0 and pruned >= n // 2, (n, pruned)
    by_q = {}
    for r in verdicts:
        by_q.setdefault(r.query_id, []).append(r.pruned)
    assert all(not all(v) for v in by_q.values())
    # identity on the sorted corpus too
    got = _rows(modes.sorted_topk_from_index(
        spark, h, queries, attrs, k=3, ascending=False))
    want = _rows(modes.sort_over(
        scored_matches_from_index(spark, h, queries), attrs, k=3,
        ascending=False))
    assert got == want and got


def test_sorted_early_termination_ties_not_pruned(spark):
    """All docs share one sort value: ties make every block reachable
    (doc_id tiebreak), so nothing may be pruned at any k."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.index.build import (
        IndexParams, build_index,
    )
    import tempfile
    docs = datagen.corpus(spark, 120, partitions=3)
    with tempfile.TemporaryDirectory() as root:
        h = build_index(
            spark, docs, root,
            IndexParams(doc_block_span=16, n_sub_blocks=4,
                        corpus_fingerprint="modes:sorted_ties"),
            text_col="content",
        )
        attrs = docs.select("doc_id", F.lit(7).alias("sort_key"))
        qdf = spark.createDataFrame(
            [(1, "merge sort window")], "query_id long, query_text string"
        )
        verdicts = modes._sorted_block_survivors(
            spark, h, qdf, attrs, k=1, ascending=False
        ).collect()
        assert verdicts and not any(r.pruned for r in verdicts)


# ---------------------------------------------------------------------------
# rank_feature


def test_rank_feature_twin_all_functions(spark, corpus, queries, oracle):
    for fn, kw in (
        ("saturation", dict(pivot=300.0, boost=2.0)),
        ("log", dict(scale=0.1, boost=1.5)),
        ("sigmoid", dict(pivot=300.0, exponent=2, boost=2.0)),
    ):
        got = _rows(modes.rank_feature_topk(
            corpus, queries, "n_chars", function=fn, k=10,
            text_col="content", **kw,
        ))
        want = _twin(oracle, modes.rank_feature_topk_sql(
            "docs", QUERIES, "n_chars", function=fn, k=10,
            text_col="content", **kw,
        ))
        assert got == want and got, fn
        # match set unchanged: feature-only docs never enter (the
        # must[match] + should[rank_feature] bool shape)
        plain = {(q, d) for q, _, d, _ in _rows(
            bm25_topk(corpus, queries, k=10 ** 9, text_col="content"))}
        assert all((q, d) in plain for q, _, d, _ in got)
        # all-stopword query stays empty
        assert not [r for r in got if r[0] == 3]


def test_rank_feature_saturation_semantics(spark, corpus, queries):
    # contribution is bounded by boost and equals boost/2 at x = pivot:
    # score(doc) - bm25(doc) ∈ (0, boost), == boost/2 where
    # n_chars == pivot
    boost, some_chars = 2.0, None
    plain = {(r[0], r[2]): r[3] for r in _rows(
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content"))}
    chars = {r.doc_id: r.n_chars for r in
             corpus.select("doc_id", "n_chars").collect()}
    pivot = float(chars[0])
    got = _rows(modes.rank_feature_topk(
        corpus, queries, "n_chars", function="saturation",
        pivot=pivot, boost=boost, k=10 ** 9, text_col="content",
    ))
    for q, _, d, s in got:
        contrib = s - plain[(q, d)]
        assert -1e-6 < contrib < boost
        if chars[d] == pivot:
            assert contrib == pytest.approx(boost / 2, abs=2e-6)
    assert any(chars[d] == pivot for _, _, d, _ in got)
