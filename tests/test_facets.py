"""Faceted search: per-query (facet bucket, count, best score) over the
FULL matching set — counts must equal the brute-force retrieval's match
set grouped by the facet, with no top-k truncation."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructor_embedding_spark import datagen
from instructor_embedding_spark.query.bm25 import bm25_topk
from instructor_embedding_spark.query.facets import (
    facet_counts,
    facet_counts_sql,
)

QUERIES = [
    (1, "merge sort window"),
    (2, "fast hash join"),
    (3, "a of the"),        # all stopwords: no buckets at all
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    base = datagen.corpus(spark, 240, partitions=4)
    # deterministic 3-way facet over doc_id
    return base.withColumn(
        "lang",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    ).cache()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query_text string")


def test_facet_counts_match_full_retrieval_groupby(spark, corpus, queries):
    got = facet_counts(corpus, queries, "lang", text_col="content")
    want = (
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
        .join(corpus.select("doc_id", "lang"), "doc_id")
        .groupBy("query_id", F.col("lang").alias("facet"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.max("score").alias("top_score"))
    )
    assert _rows(got.select("query_id", "facet", "n_docs", "top_score")) == \
        _rows(want.select("query_id", "facet", "n_docs", "top_score"))
    assert got.count() > 0
    # stopword-only query produces no buckets
    assert got.filter("query_id = 3").count() == 0


def test_facet_msm_floor(spark, corpus, queries):
    got = facet_counts(corpus, queries, "lang", text_col="content",
                       min_should_match=2)
    want = (
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content",
                  min_should_match=2)
        .join(corpus.select("doc_id", "lang"), "doc_id")
        .groupBy("query_id", F.col("lang").alias("facet"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    assert _rows(got.select("query_id", "facet", "n_docs")) == \
        _rows(want.select("query_id", "facet", "n_docs"))
    # the msm floor strictly shrinks at least one bucket
    full = facet_counts(corpus, queries, "lang", text_col="content")
    assert got.agg(F.sum("n_docs")).collect()[0][0] < \
        full.agg(F.sum("n_docs")).collect()[0][0]


def _norm(rows):
    return sorted(
        (int(q), f, int(n), round(float(s), 6), int(lo), int(hi),
         round(float(av), 6))
        for q, f, n, s, lo, hi, av in rows
    )


def test_facets_match_duckdb_twin(spark, corpus, queries):
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = facet_counts_sql("docs", QUERIES, "lang", text_col="content")
    want = _norm(con.execute(sql).fetchall())
    got = _norm(_rows(facet_counts(corpus, queries, "lang",
                                   text_col="content")))
    assert got == want
    assert got


def test_facet_histogram_matches_twin_and_partitions_matchset(
        spark, corpus, queries):
    from instructor_embedding_spark.query.facets import (
        facet_histogram, facet_histogram_sql,
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    got_df = facet_histogram(corpus, queries, 16, text_col="content")
    got = _norm(_rows(got_df))
    want = _norm(con.execute(facet_histogram_sql(
        "docs", QUERIES, 16, text_col="content")).fetchall())
    assert got == want
    assert len({f for _, f, *_ in got}) > 1  # >1 length bucket
    # histogram buckets partition the match set: counts sum to match size
    full = facet_counts(corpus, queries, "lang", text_col="content")
    assert got_df.groupBy("query_id").agg(
        F.sum("n_docs").alias("n")).collect() == \
        full.groupBy("query_id").agg(F.sum("n_docs").alias("n")).collect()


def test_facet_plan_has_no_sort(spark, corpus, queries):
    """The facet plan must be scan → score → hash aggregate: no per-query
    window/global sort anywhere (the scale property facets exist for)."""
    plan = facet_counts(corpus, queries, "lang", text_col="content") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_facet_percentiles_pinned_rank_rule(spark, corpus, queries):
    """The disc percentile equals the value at sorted row ceil(p*n) —
    cross-checked against a driver-side recompute of every bucket."""
    from instructor_embedding_spark.query.facets import facet_percentiles

    got = {
        (r["query_id"], r["facet"]): (r["n_docs"], r["p50_dl"], r["p90_dl"])
        for r in facet_percentiles(
            corpus, queries, "lang", text_col="content"
        ).collect()
    }
    assert got
    matches = (
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
        .join(corpus.select("doc_id", "lang"), "doc_id")
    )
    toks = matches.select("query_id", "lang", "doc_id")
    import math

    from instructor_embedding_spark.query.bm25 import tokenized

    dls = {
        r["doc_id"]: r["dl"]
        for r in tokenized(corpus, "content").select("doc_id", "dl")
        .collect()
    }
    buckets: dict = {}
    for r in toks.collect():
        buckets.setdefault((r["query_id"], r["lang"]), []).append(
            dls[r["doc_id"]]
        )
    for key, vals in buckets.items():
        vals.sort()
        n = len(vals)
        want = (
            n,
            vals[math.ceil(0.5 * n) - 1],
            vals[math.ceil(0.9 * n) - 1],
        )
        assert got[key] == want, key


def test_facet_percentiles_twin_and_index_parity(spark, corpus, queries):
    from instructor_embedding_spark.query.facets import (
        facet_percentiles,
        facet_percentiles_sql,
    )

    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    got = sorted(
        tuple(r)
        for r in facet_percentiles(
            corpus, queries, "lang", text_col="content"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            facet_percentiles_sql("docs", QUERIES, "lang",
                                  text_col="content")
        ).fetchall()
    )
    assert got == want and got


def test_composite_page_keyset_matches_full_enumeration(
    spark, corpus, queries, tmp_path_factory
):
    from instructor_embedding_spark.index.build import (
        IndexParams, build_index,
    )
    from instructor_embedding_spark.query.facets import (
        composite_page_from_index, composite_page_sql,
    )

    root = str(tmp_path_factory.mktemp("composite_idx"))
    handle = build_index(
        spark, corpus,
        root,
        IndexParams(doc_block_span=128, n_sub_blocks=8,
                    corpus_fingerprint="facets:composite"),
        text_col="content",
    )
    lang_facets = corpus.select("doc_id", F.col("lang").alias("facet"))
    interval, size, after = 16, 4, ("de", 16)

    got = sorted(
        tuple(r) for r in composite_page_from_index(
            spark, handle, queries, lang_facets, interval,
            after=after, size=size,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(composite_page_sql(
            "docs", QUERIES, "lang", interval, after=after, size=size,
            text_col="content",
        )).fetchall()
    )
    assert got == want and got

    # keyset property: page == the SIZE buckets immediately after the
    # after-key in the FULL ordered bucket enumeration
    full = sorted(
        tuple(r) for r in con.execute(composite_page_sql(
            "docs", QUERIES, "lang", interval, after=None, size=10**9,
            text_col="content",
        )).fetchall()
    )
    def key(row):
        facet, bucket = row[1].rsplit(":", 1)
        return (facet, int(bucket))
    per_q = {}
    for row in sorted(full, key=lambda r: (r[0],) + key(r)):
        if key(row) > after:
            per_q.setdefault(row[0], []).append(row)
    expect = sorted(r for rows in per_q.values() for r in rows[:size])
    assert got == expect
    # every page row is strictly after the after-key
    assert all(key(r) > after for r in got)


def test_adjacency_matrix_twin_and_semantics(spark, corpus):
    from instructor_embedding_spark.query.facets import (
        adjacency_matrix, adjacency_matrix_sql,
    )
    filters = [("h", "hash"), ("j", "join"), ("s", "sort")]
    got = sorted(
        tuple(r) for r in adjacency_matrix(
            corpus, filters, text_col="content").collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(adjacency_matrix_sql(
            "docs", filters, text_col="content")).fetchall()
    )
    assert got == want and got
    d = dict(got)
    # intersection can never exceed either single bucket
    for pair in [p for p in d if "&" in p]:
        a, b = pair.split("&")
        assert d[pair] <= min(d[a], d[b])
    # pair keys are sorted-name ordered, no self-pairs, no reversals
    assert all(a < b for a, b in
               (p.split("&") for p in d if "&" in p))


@pytest.fixture(scope="module")
def facets_index(spark, corpus, tmp_path_factory):
    from instructor_embedding_spark.index.build import (
        IndexParams, build_index,
    )
    root = str(tmp_path_factory.mktemp("facets_idx"))
    return build_index(
        spark, corpus, root,
        IndexParams(doc_block_span=128, n_sub_blocks=8,
                    corpus_fingerprint="facets:shared"),
        text_col="content",
    )


def test_rare_terms_twin_and_threshold(spark, corpus, queries,
                                       facets_index):
    from instructor_embedding_spark.query.facets import (
        rare_terms_from_index, rare_terms_sql,
    )
    got = sorted(
        tuple(r) for r in rare_terms_from_index(
            spark, facets_index, queries, corpus,
            max_doc_count=2, text_col="content",
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(rare_terms_sql(
            "docs", QUERIES, max_doc_count=2, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # threshold semantics: every bucket's foreground count <= cap, and
    # nothing the cap admits is missing (re-derive from the uncapped run)
    assert all(fg <= 2 for _, _, fg in got)
    unc = sorted(
        tuple(r) for r in con.execute(rare_terms_sql(
            "docs", QUERIES, max_doc_count=10 ** 9, text_col="content",
        )).fetchall()
    )
    assert got == [r for r in unc if r[2] <= 2]
    # stopword-only query has no match set, hence no rare buckets
    assert all(q != 3 for q, _, _ in got)


def test_histogram_pipeline_twin_and_invariants(spark, corpus, queries,
                                                facets_index):
    from instructor_embedding_spark.query.facets import (
        histogram_pipeline_from_index, histogram_pipeline_sql,
    )
    got = sorted(
        tuple(r) for r in histogram_pipeline_from_index(
            spark, facets_index, queries, 16,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(histogram_pipeline_sql(
            "docs", QUERIES, 16, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # pipeline invariants per query: cumulative sum telescopes the
    # bucket counts in key order; each derivative is the count delta
    # with a NULL first bucket (ES derivative semantics)
    by_q = {}
    for q, facet, n, cum, deriv in got:
        by_q.setdefault(q, []).append((int(facet), n, cum, deriv))
    for q, rows in by_q.items():
        rows.sort()
        run = 0
        prev_n = None
        for _, n, cum, deriv in rows:
            run += n
            assert cum == run
            if prev_n is None:
                assert deriv is None
            else:
                assert deriv == n - prev_n
            prev_n = n


def test_top_hits_twin_and_bucket_membership(spark, corpus, queries,
                                             facets_index):
    from instructor_embedding_spark.query.facets import (
        top_hits_from_index, top_hits_sql,
    )
    lang_facets = corpus.select("doc_id", F.col("lang").alias("facet"))
    got = sorted(
        tuple(r) for r in top_hits_from_index(
            spark, facets_index, queries, lang_facets, k=3,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(top_hits_sql(
            "docs", QUERIES, "lang", k=3, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # each bucket's hits belong to that bucket and rank 1..<=k densely
    lang_of = {r.doc_id: r.lang
               for r in corpus.select("doc_id", "lang").collect()}
    by_bucket = {}
    for q, facet, rank, doc, _ in got:
        assert lang_of[doc] == facet
        by_bucket.setdefault((q, facet), []).append(rank)
    for ranks in by_bucket.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_sampler_stats_twin_and_sample_cut(spark, corpus, queries,
                                           facets_index):
    from instructor_embedding_spark.query.facets import (
        sampler_stats_from_index, sampler_stats_sql,
    )
    got = sorted(
        tuple(r) for r in sampler_stats_from_index(
            spark, facets_index, queries, shard_size=20,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(sampler_stats_sql(
            "docs", QUERIES, shard_size=20, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # the sample is a strict cut: n_docs <= shard_size, and a huge
    # shard_size degenerates to the full match-set stats
    assert all(n <= 20 for _, _, n, *_ in got)
    full = sorted(
        tuple(r) for r in con.execute(sampler_stats_sql(
            "docs", QUERIES, shard_size=10 ** 9, text_col="content",
        )).fetchall()
    )
    full_spark = sorted(
        tuple(r) for r in sampler_stats_from_index(
            spark, facets_index, queries, shard_size=10 ** 9,
        ).collect()
    )
    assert full_spark == full


def test_weighted_avg_twin_and_hand_value(spark, corpus, queries,
                                          facets_index):
    from instructor_embedding_spark.query.facets import (
        weighted_avg_from_index, weighted_avg_sql,
    )
    attrs = corpus.select(
        "doc_id", F.col("lang").alias("facet"),
        F.length("content").cast("long").alias("value"),
        (F.lit(1) + F.col("doc_id") % 5).cast("long").alias("weight"),
    )
    got = sorted(
        tuple(r) for r in weighted_avg_from_index(
            spark, facets_index, queries, attrs,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(weighted_avg_sql(
            "docs", QUERIES, "lang", "length(content)",
            "1 + doc_id % 5", text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # hand re-derivation: the weighted mean over the match set equals
    # sum(v*w)/sum(w) computed row-by-row driver-side
    from instructor_embedding_spark.query.bm25 import bm25_topk
    m = bm25_topk(corpus, queries, k=10 ** 9, text_col="content") \
        .select("query_id", "doc_id")
    rows = m.join(attrs, "doc_id").collect()
    agg = {}
    for r in rows:
        key = (r.query_id, r.facet)
        vw, w, n = agg.get(key, (0, 0, 0))
        agg[key] = (vw + r.value * r.weight, w + r.weight, n + 1)
    expect = sorted(
        (q, f, n, round(vw / w, 6))
        for (q, f), (vw, w, n) in agg.items() if w
    )
    assert got == expect


def test_significant_text_is_sig_over_the_sample(spark, corpus, queries,
                                                 facets_index):
    from instructor_embedding_spark.query.facets import (
        significant_text_from_index, significant_text_sql,
    )
    got = sorted(
        tuple(r) for r in significant_text_from_index(
            spark, facets_index, queries, corpus,
            shard_size=15, size=5, min_doc_count=2, text_col="content",
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(significant_text_sql(
            "docs", QUERIES, shard_size=15, size=5, min_doc_count=2,
            text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # a huge shard_size degenerates to plain significant_terms over the
    # full match set (same background dictionary)
    from instructor_embedding_spark.query.facets import (
        significant_terms_from_index,
    )
    full_text = sorted(
        tuple(r) for r in significant_text_from_index(
            spark, facets_index, queries, corpus,
            shard_size=10 ** 9, size=5, min_doc_count=2,
            text_col="content",
        ).collect()
    )
    full_terms = sorted(
        tuple(r) for r in significant_terms_from_index(
            spark, facets_index, queries, corpus,
            size=5, min_doc_count=2, text_col="content",
        ).collect()
    )
    assert full_text == full_terms


def test_sharded_terms_twin_and_error_bound(spark, corpus, queries,
                                            facets_index):
    from instructor_embedding_spark.query.facets import (
        sharded_terms_from_index, sharded_terms_sql,
    )
    got = sorted(
        tuple(r) for r in sharded_terms_from_index(
            spark, facets_index, queries, corpus,
            n_shards=2, shard_size=5, size=8, text_col="content",
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(sharded_terms_sql(
            "docs", QUERIES, n_shards=2, shard_size=5, size=8,
            text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # the ES guarantee: merged_df underestimates the TRUE df by at most
    # err_bound, and never overestimates
    from instructor_embedding_spark.query.facets import rare_terms_sql
    # rare_terms with a huge cap = the exact per-(query, term)
    # foreground counts
    true_df = {
        (q, t): n for q, t, n in con.execute(
            rare_terms_sql("docs", QUERIES, max_doc_count=10 ** 9,
                           text_col="content")
        ).fetchall()
    }
    for q, term, merged, err in got:
        t = true_df[(q, term)]
        assert merged <= t <= merged + err, (q, term, merged, err, t)
    # with one shard (no distribution) the agg is exact: zero error
    one = sharded_terms_from_index(
        spark, facets_index, queries, corpus,
        n_shards=1, shard_size=10 ** 9, size=8, text_col="content",
    ).collect()
    assert one and all(r.err_bound == 0 for r in one)
    for r in one:
        assert r.merged_df == true_df[(r.query_id, r.term)]


def test_filters_agg_twin_and_other_bucket(spark, corpus, queries,
                                           facets_index):
    from instructor_embedding_spark.query.facets import (
        filters_agg_from_index, filters_agg_sql,
    )
    filters = [("hash", "hash"), ("joins", "join"), ("sorting", "sort")]
    got = sorted(
        tuple(r) for r in filters_agg_from_index(
            spark, facets_index, queries, corpus, filters,
            text_col="content",
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(filters_agg_sql(
            "docs", QUERIES, filters, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # other-bucket arithmetic: per query, n(_other_) = |match set| -
    # |docs in >=1 named bucket| (buckets are NON-exclusive so the
    # named counts can overlap; re-derive from the raw sets)
    from instructor_embedding_spark.query.bm25 import (
        bm25_topk, tf_table, tokenized,
    )
    m = bm25_topk(corpus, queries, k=10 ** 9, text_col="content") \
        .select("query_id", "doc_id")
    member = {
        r.doc_id
        for r in tf_table(tokenized(corpus, "content", "doc_id"))
        .filter(F.col("term").isin([t for _, t in filters]))
        .select("doc_id").distinct().collect()
    }
    per_q: dict[int, list[int]] = {}
    for r in m.collect():
        per_q.setdefault(r.query_id, []).append(r.doc_id)
    others = {q: sum(1 for d in ds if d not in member)
              for q, ds in per_q.items()}
    got_other = {q: n for q, f, n, *_ in got if f == "_other_"}
    assert got_other == {q: n for q, n in others.items() if n > 0}


def test_range_agg_twin_partition_and_empty_buckets(spark, corpus,
                                                    queries, facets_index):
    from instructor_embedding_spark.query.facets import (
        range_agg_from_index, range_agg_sql,
    )
    ranges = [(None, 30), (30, 60), (60, None)]
    got_df = range_agg_from_index(spark, facets_index, queries, ranges)
    got = sorted(tuple(r) for r in got_df.collect())
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(range_agg_sql(
            "docs", QUERIES, ranges, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # every query gets EVERY configured bucket (ES returns all ranges),
    # including the all-stopword query as zero-count rows
    assert {(q, f) for q, f, *_ in got} == {
        (q, f) for q, _ in QUERIES
        for f in ("*-30", "30-60", "60-*")
    }
    assert all(n == 0 for q, f, n, *_ in got if q == 3)
    # disjoint ranges partition the match set: bucket counts sum to the
    # match-set size per query
    from instructor_embedding_spark.query.bm25 import bm25_topk
    m = bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
    sizes = {r.query_id: r.n for r in
             m.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    per_q: dict[int, int] = {}
    for q, f, n, *_ in got:
        per_q[q] = per_q.get(q, 0) + n
    for q, tot in per_q.items():
        assert tot == sizes.get(q, 0)


def test_multi_terms_twin_and_key_composition(spark, corpus, queries,
                                              facets_index):
    from instructor_embedding_spark.query.facets import (
        facet_counts_from_index, multi_terms_from_index, multi_terms_sql,
    )
    lang_facets = corpus.select("doc_id", F.col("lang").alias("facet"))
    got = sorted(
        tuple(r) for r in multi_terms_from_index(
            spark, facets_index, queries, lang_facets, 16, size=10 ** 9,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(multi_terms_sql(
            "docs", QUERIES, "lang", 16, size=10 ** 9,
            text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # uncut composite buckets marginalize exactly to the single-source
    # terms agg: summing n_docs over the dl part recovers terms_lang
    terms = sorted(
        (r.query_id, r.facet, r.n_docs)
        for r in facet_counts_from_index(
            spark, facets_index, queries, lang_facets,
        ).collect()
    )
    marg: dict[tuple[int, str], int] = {}
    for q, f, n, *_ in got:
        lang = f.split("|")[0]
        marg[(q, lang)] = marg.get((q, lang), 0) + n
    assert terms == sorted((q, f, n) for (q, f), n in marg.items())
    # the size cut keeps the count-desc/key-asc head
    cut = sorted(
        tuple(r) for r in multi_terms_from_index(
            spark, facets_index, queries, lang_facets, 16, size=3,
        ).collect()
    )
    by_q: dict[int, list] = {}
    for row in got:
        by_q.setdefault(row[0], []).append(row)
    expect_cut = sorted(
        row
        for q, rows in by_q.items()
        for row in sorted(rows, key=lambda r: (-r[2], r[1]))[:3]
    )
    assert cut == expect_cut


def test_extended_stats_twin_and_numpy_variance(spark, corpus, queries,
                                                facets_index):
    import numpy as np

    from instructor_embedding_spark.query.facets import (
        extended_stats_from_index, extended_stats_sql,
    )
    lang_facets = corpus.select("doc_id", F.col("lang").alias("facet"))
    got = sorted(
        tuple(r) for r in extended_stats_from_index(
            spark, facets_index, queries, lang_facets,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(extended_stats_sql(
            "docs", QUERIES, "lang", text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # population variance/std re-derived with numpy over the raw dl
    # values of one bucket
    from instructor_embedding_spark.query.bm25 import bm25_topk, tokenized
    m = (
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
        .join(corpus.select("doc_id", "lang"), "doc_id")
        .filter("query_id = 1 AND lang = 'en'")
        .join(tokenized(corpus, "content").select("doc_id", "dl"),
              "doc_id")
    )
    dls = np.array([r.dl for r in m.select("dl").collect()], dtype=np.int64)
    row = next(r for r in got if r[0] == 1 and r[1] == "en")
    assert row[2] == dls.size
    assert row[7] == pytest.approx(float(np.var(dls)), abs=1e-6)
    assert row[8] == pytest.approx(float(np.std(dls)), abs=1e-6)


def test_percentile_ranks_twin_and_monotonicity(spark, corpus, queries,
                                                facets_index):
    from instructor_embedding_spark.query.facets import (
        percentile_ranks_from_index, percentile_ranks_sql,
    )
    lang_facets = corpus.select("doc_id", F.col("lang").alias("facet"))
    got = sorted(
        tuple(r) for r in percentile_ranks_from_index(
            spark, facets_index, queries, lang_facets, (30, 60, 10 ** 6),
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(percentile_ranks_sql(
            "docs", QUERIES, "lang", (30, 60, 10 ** 6),
            text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # ranks are cumulative percentages: bounded, monotone in v, and
    # exactly 100 at a value above every dl
    by_bucket: dict[tuple[int, str], dict[int, float]] = {}
    for q, f, n, pct in got:
        assert 0.0 <= pct <= 100.0
        bucket, v = f.rsplit(":<=", 1)
        by_bucket.setdefault((q, bucket), {})[int(v)] = pct
    for ranks in by_bucket.values():
        assert ranks[30] <= ranks[60] <= ranks[10 ** 6]
        assert ranks[10 ** 6] == 100.0


def test_diversified_sampler_twin_cap_and_greedy(spark, corpus, queries,
                                                 facets_index):
    from instructor_embedding_spark.query.facets import (
        diversified_sampler_stats_from_index,
        diversified_sampler_stats_sql,
        sampler_stats_from_index,
    )
    div = corpus.select("doc_id", F.col("lang").alias("dvalue"))
    got = sorted(
        tuple(r) for r in diversified_sampler_stats_from_index(
            spark, facets_index, queries, div, shard_size=8,
            max_per_value=3,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content", "lang").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(diversified_sampler_stats_sql(
            "docs", QUERIES, "lang", shard_size=8, max_per_value=3,
            text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # the two-window cut equals ES's greedy collector, simulated
    # driver-side over the raw ranked match set
    from instructor_embedding_spark.query.bm25 import bm25_topk, tokenized
    ranked = (
        bm25_topk(corpus, queries, k=10 ** 9, text_col="content")
        .join(corpus.select("doc_id", "lang"), "doc_id")
        .join(tokenized(corpus, "content").select("doc_id", "dl"),
              "doc_id")
        .orderBy("query_id", F.col("score").desc(), F.col("doc_id").asc())
        .collect()
    )
    sim: dict[int, list] = {}
    taken: dict[tuple[int, str], int] = {}
    for r in ranked:
        picks = sim.setdefault(r.query_id, [])
        if len(picks) >= 8:
            continue
        if taken.get((r.query_id, r.lang), 0) >= 3:
            continue
        taken[(r.query_id, r.lang)] = taken.get((r.query_id, r.lang), 0) + 1
        picks.append(r)
    expect = sorted(
        (
            q, "_diversified", len(ps),
            round(max(p.score for p in ps), 6),
            min(p.dl for p in ps), max(p.dl for p in ps),
            round(sum(p.dl for p in ps) / len(ps), 6),
        )
        for q, ps in sim.items() if ps
    )
    assert got == expect
    # a huge cap degenerates to the plain sampler
    wide = sorted(
        tuple(r) for r in diversified_sampler_stats_from_index(
            spark, facets_index, queries, div, shard_size=8,
            max_per_value=10 ** 9,
        ).collect()
    )
    plain = sorted(
        (q, "_diversified", n, ts, lo, hi, av)
        for q, _, n, ts, lo, hi, av in (
            tuple(r) for r in sampler_stats_from_index(
                spark, facets_index, queries, shard_size=8,
            ).collect()
        )
    )
    assert wide == plain


def test_bucket_extrema_twin_and_invariants(spark, corpus, queries,
                                            facets_index):
    from instructor_embedding_spark.query.facets import (
        bucket_extrema_from_index, facet_histogram_from_index,
    )
    from instructor_embedding_spark.query.facets import bucket_extrema_sql
    got = sorted(
        tuple(r) for r in bucket_extrema_from_index(
            spark, facets_index, queries, 16,
        ).collect()
    )
    pdf = corpus.select("doc_id", "content").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r) for r in con.execute(bucket_extrema_sql(
            "docs", QUERIES, 16, text_col="content",
        )).fetchall()
    )
    assert got == want and got
    # re-derive against the raw histogram: max/min counts and keys, avg
    h = facet_histogram_from_index(spark, facets_index, queries, 16)
    buckets: dict[int, list[tuple[int, int]]] = {}
    for r in h.collect():
        buckets.setdefault(r.query_id, []).append((int(r.facet), r.n_docs))
    for q, bs in buckets.items():
        mx_n = max(n for _, n in bs)
        mx_key = min(k for k, n in bs if n == mx_n)
        mn_n = min(n for _, n in bs)
        mn_key = min(k for k, n in bs if n == mn_n)
        rows = {f: (n, a) for qq, f, n, a in got if qq == q}
        assert rows[f"max:{mx_key}"][0] == mx_n
        assert rows[f"min:{mn_key}"][0] == mn_n
        assert rows["avg_bucket"][1] == round(
            sum(n for _, n in bs) / len(bs), 6)


def test_extended_stats_int64_domain_guard(spark):
    """A bucket whose n_docs * sum_sq exceeds 2^62 must raise loudly
    (ADVICE r5: non-ANSI Spark would wrap the BIGINT product and return
    a wrong variance), while in-domain buckets compute normally."""
    from instructor_embedding_spark.query.facets import _ext_stats_var_raw

    ok = spark.createDataFrame(
        [(4, 30, 10, "en")],
        "n_docs long, sum_sq long, s long, facet string",
    ).select(_ext_stats_var_raw().alias("v"))
    # n*sum_sq - s^2 = 120 - 100 = 20; / n^2 -> 1.25
    assert ok.collect()[0]["v"] == pytest.approx(1.25)

    bad = spark.createDataFrame(
        [(1 << 32, 1 << 31, 1 << 31, "de")],
        "n_docs long, sum_sq long, s long, facet string",
    ).select(_ext_stats_var_raw().alias("v"))
    with pytest.raises(Exception, match="int64 domain exceeded"):
        bad.collect()
