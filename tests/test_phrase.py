"""Phrase search: hand-built adjacency fixtures + positional stage."""

from __future__ import annotations

from instructor_embedding_spark.index.build import IndexParams, build_index
from instructor_embedding_spark.query.phrase import build_positions, phrase_topk


def test_phrase_adjacency_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta"),   # "alpha beta" ×2
            (1, "beta alpha beta gamma"),         # ×1 (+ reversed decoy)
            (2, "alpha gamma beta"),              # terms present, not adjacent
            (3, "alpha alpha alpha"),             # dup-term phrase ×2
            (4, "delta delta"),
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)
    phrases = [(1, "alpha beta"), (2, "alpha alpha"), (3, "gamma delta")]
    got = {
        (r.phrase_id, r.doc_id): (r.rank, r.matches)
        for r in phrase_topk(spark, pos, phrases, k=10).collect()
    }
    assert got[(1, 0)] == (1, 2)       # two occurrences → rank 1
    assert got[(1, 1)] == (2, 1)
    assert (1, 2) not in got           # non-adjacent excluded
    assert got[(2, 3)] == (1, 2)       # "alpha alpha" overlapping ×2
    assert not any(p == 3 for p, _ in got)  # cross-doc phrase never matches


def test_phrase_via_index_handle(spark, tmp_path):
    from instructor_embedding_spark import datagen

    docs = datagen.corpus(spark, 200, partitions=3)
    h = build_index(
        spark, docs, str(tmp_path / "idx"),
        IndexParams(doc_block_span=64, n_sub_blocks=4,
                    corpus_fingerprint="phrase", store_positions=True),
        text_col="content",
    )
    # the planted identifier tokenizes to an exact adjacent sequence
    res = phrase_topk(
        spark, h.positions(spark), [(1, "parse varint block header")], k=10
    ).collect()
    assert res, "planted phrase must match"
    qrels = {r.doc_id for r in datagen.qrels_df(spark, 200).collect()
             if r.query_id == 1}
    assert {r.doc_id for r in res} <= qrels


def test_proximity_window_fixture(spark):
    """Hand-verified NEAR semantics: matches = count of window offsets
    whose w = n_distinct_terms + slop token window contains all terms."""
    from instructor_embedding_spark.query.phrase import proximity_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta"),
            (1, "alpha zzz zzz zzz beta"),   # terms 4 apart
            (2, "beta alpha"),               # reversed — NEAR still matches
            (3, "alpha alpha"),              # missing beta
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)

    got = {
        (r.phrase_id, r.doc_id): r.matches
        for r in proximity_topk(
            spark, pos, [(1, "alpha beta")], slop=0, k=10
        ).collect()
    }
    # doc 0: windows [1,2] ("alpha beta") and [4,5]; doc 2: reversed pair
    assert got == {(1, 0): 2, (1, 2): 1}

    got3 = {
        (r.phrase_id, r.doc_id): r.matches
        for r in proximity_topk(
            spark, pos, [(2, "alpha gamma")], slop=1, k=10
        ).collect()
    }
    # doc 0, w=3: offsets 1,2,3 all cover {alpha, gamma}
    assert got3 == {(2, 0): 3}

    # slop large enough to bridge the 4-token gap in doc 1 (w = 2 + 3 = 5)
    far = {
        (r.phrase_id, r.doc_id): r.matches
        for r in proximity_topk(
            spark, pos, [(3, "alpha beta")], slop=3, k=10
        ).collect()
    }
    assert far[(3, 1)] == 1          # exactly one 5-window covers both
    assert far[(3, 0)] == 4          # dense doc: offsets 1..4

    # duplicate query tokens collapse to the distinct-term query
    dup = proximity_topk(spark, pos, [(4, "alpha alpha beta")],
                         slop=0, k=10).collect()
    base = proximity_topk(spark, pos, [(4, "alpha beta")],
                          slop=0, k=10).collect()
    assert sorted(map(tuple, dup)) == sorted(map(tuple, base))


def test_proximity_matches_duckdb(spark):
    """Cross-engine parity on the datagen corpus: the interval-sweep
    kernel against the first-principles list_has_all slice oracle."""
    import duckdb

    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        proximity_topk,
        proximity_topk_sql,
    )

    docs = datagen.corpus(spark, 300, partitions=3).cache()
    pos = build_positions(docs, span=64)
    queries = [
        (1, "parse varint block"),
        (2, "the and of"),           # stopword-dense, many matches
        (3, "zzz nothing"),          # zero hits
        (4, "header"),               # single term: matches == windows
    ]
    for slop in (0, 2, 5):
        sdf = proximity_topk(spark, pos, queries, slop=slop, k=25)
        got = sorted(tuple(r) for r in sdf.collect())
        con = duckdb.connect()
        con.register("documents_pd", docs.toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
        duck = con.execute(proximity_topk_sql(
            "documents", queries, slop=slop, k=25, text_col="content"))
        assert [d[0] for d in duck.description] == sdf.columns
        want = sorted(tuple(row) for row in duck.fetchall())
        assert got == want, f"slop={slop}"


def test_proximity_contains_phrase_and_is_slop_monotone(spark):
    """Two invariants: (a) at slop=0 every exact-phrase occurrence is a
    proximity match (ordered adjacency ⊆ any-order window), so per-doc
    proximity matches ≥ phrase matches for distinct-term phrases; (b)
    per-doc matches are nondecreasing in slop."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import proximity_topk

    docs = datagen.corpus(spark, 300, partitions=3)
    pos = build_positions(docs, span=64)
    queries = [(1, "parse varint block header"), (2, "sorted run merge")]

    ph = {
        (r.phrase_id, r.doc_id): r.matches
        for r in phrase_topk(spark, pos, queries, k=1000).collect()
    }
    assert ph, "planted phrases must hit"
    prox = {}
    for slop in (0, 1, 3):
        prox[slop] = {
            (r.phrase_id, r.doc_id): r.matches
            for r in proximity_topk(
                spark, pos, queries, slop=slop, k=1000
            ).collect()
        }
    for key, m in ph.items():
        assert prox[0].get(key, 0) >= m, key
    for key, m in prox[0].items():
        assert prox[1].get(key, 0) >= m >= 1, key
    for key, m in prox[1].items():
        assert prox[3].get(key, 0) >= m, key


def test_window_cover_count_matches_bruteforce():
    """Property: the interval-sweep kernel equals the brute-force
    definition (count 1-based offsets i where every term has a position
    in [i, i+w-1]) on random position sets — the pure-Python analog of
    the DuckDB list_has_all twin, with no engine in the loop."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from instructor_embedding_spark.query.phrase import _window_cover_count

    pos_set = st.sets(st.integers(min_value=1, max_value=60),
                      min_size=1, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(pos_set, min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10),
    )
    def check(term_positions, w):
        pos_lists = [np.array(sorted(s), dtype=np.uint64)
                     for s in term_positions]
        got = _window_cover_count(pos_lists, w)
        hi = max(max(s) for s in term_positions)
        want = sum(
            1
            for i in range(1, hi + 1)
            if all(any(i <= p <= i + w - 1 for p in s)
                   for s in term_positions)
        )
        assert got == want, (term_positions, w, got, want)

    check()


def test_ordered_proximity_fixture_and_order_sensitivity(spark):
    """Ordered NEAR must respect term order (unlike the unordered
    operator) and count chain starts."""
    from instructor_embedding_spark.query.phrase import (
        ordered_proximity_topk,
        proximity_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta"),
            (1, "beta alpha"),                 # reversed only
            (2, "alpha zzz beta"),             # one-gap, in order
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)
    q = [(1, "alpha beta")]

    ordered0 = {
        (r.phrase_id, r.doc_id): r.matches
        for r in ordered_proximity_topk(spark, pos, q, slop=0, k=10).collect()
    }
    # slop=0: adjacency, in order — doc 1 (reversed) must NOT match
    assert ordered0 == {(1, 0): 2}
    unordered0 = {
        (r.phrase_id, r.doc_id): r.matches
        for r in proximity_topk(spark, pos, q, slop=0, k=10).collect()
    }
    assert (1, 1) in unordered0            # the contrast the op exists for

    ordered1 = {
        (r.phrase_id, r.doc_id): r.matches
        for r in ordered_proximity_topk(spark, pos, q, slop=1, k=10).collect()
    }
    # doc 2's one-gap pair enters at slop=1; doc 1 still excluded
    assert ordered1 == {(1, 0): 2, (1, 2): 1}


def test_ordered_proximity_slop0_equals_phrase(spark):
    """The cross-kernel invariant: at slop=0 every chain step is pinned
    to adjacency, so ordered-proximity matches must equal phrase_topk's
    occurrence counts doc-for-doc — two independent kernels (isin
    intersection vs greedy searchsorted chase) checking each other,
    duplicate-term phrases included."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        ordered_proximity_topk,
    )

    docs = datagen.corpus(spark, 300, partitions=3)
    pos = build_positions(docs, span=64)
    queries = [
        (1, "parse varint block header"),
        (2, "sorted run merge"),
        (3, "the the"),              # duplicate-term chain
        (4, "block"),                # single term: matches == tf
    ]
    ph = {
        (r.phrase_id, r.doc_id): r.matches
        for r in phrase_topk(spark, pos, queries, k=1000).collect()
    }
    op = {
        (r.phrase_id, r.doc_id): r.matches
        for r in ordered_proximity_topk(
            spark, pos, queries, slop=0, k=1000
        ).collect()
    }
    assert ph and op == ph


def test_ordered_proximity_matches_duckdb(spark):
    """Cross-engine parity: greedy searchsorted chains vs the nested
    list_filter existence chain."""
    import duckdb

    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        ordered_proximity_topk,
        ordered_proximity_topk_sql,
    )

    docs = datagen.corpus(spark, 300, partitions=3).cache()
    pos = build_positions(docs, span=64)
    queries = [
        (1, "parse varint block"),
        (2, "the and of"),
        (3, "of and the"),            # same terms, other order
        (4, "zzz nothing"),
    ]
    for slop in (0, 2, 5):
        sdf = ordered_proximity_topk(spark, pos, queries, slop=slop, k=25)
        got = sorted(tuple(r) for r in sdf.collect())
        con = duckdb.connect()
        con.register("documents_pd", docs.toPandas())
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_pd")
        duck = con.execute(ordered_proximity_topk_sql(
            "documents", queries, slop=slop, k=25, text_col="content"))
        assert [d[0] for d in duck.description] == sdf.columns
        want = sorted(tuple(row) for row in duck.fetchall())
        assert got == want, f"slop={slop}"


# ------------------------------------------------------------ span_first


def test_span_first_fixture(spark):
    from instructor_embedding_spark.query.phrase import span_first_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha gamma alpha"),  # alpha at pos 1, 3, 5
            (1, "beta beta alpha"),               # alpha at pos 3
            (2, "beta gamma delta alpha"),        # alpha at pos 4
            (3, "beta gamma"),                    # no alpha
        ],
        "doc_id long, content string",
    )
    pos = build_positions(docs, span=4)
    got = {
        (r.phrase_id, r.doc_id): r.matches
        for r in span_first_topk(
            spark, pos, [(1, "alpha", 3), (2, "alpha", 1), (3, "zz", 5)],
            k=10,
        ).collect()
    }
    # end=3: doc0 has alpha at 1,3 (2 matches); doc1 at 3 (1); doc2's
    # alpha sits at 4 — excluded entirely
    assert got == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_span_first_multi_token_rejected(spark):
    import pytest as pt

    from instructor_embedding_spark.query.phrase import span_first_topk

    docs = spark.createDataFrame(
        [(0, "alpha beta")], "doc_id long, content string"
    )
    pos = build_positions(docs, span=4)
    with pt.raises(ValueError):
        span_first_topk(spark, pos, [(1, "alpha beta", 3)], k=10)


def test_span_first_twin(spark):
    import duckdb

    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        span_first_topk,
        span_first_topk_sql,
    )

    docs = datagen.corpus(spark, 200, partitions=3)
    pos = build_positions(docs, span=64)
    qv = [(1, "merge", 8), (2, "sort", 3), (3, "zzqqxv", 10)]
    got = sorted(
        tuple(r) for r in span_first_topk(spark, pos, qv, k=10).collect()
    )
    con = duckdb.connect()
    con.register("docs_pd", docs.select("doc_id", "content").toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            span_first_topk_sql("docs_pd", qv, k=10, text_col="content")
        ).fetchall()
    )
    assert got == want and got


def test_block_prune_rank_identical_and_skip_stats(spark):
    """The pre-shuffle conjunctive block prune (r6) is a pure prune:
    block_prune=True must be row-identical to the default path for every
    conjunctive operator, and conjunctive_skip_stats must report
    survivors <= candidates with equality exactly when nothing is
    prunable."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        conjunctive_skip_stats,
        ordered_proximity_topk,
        phrase_topk,
        proximity_topk,
    )

    docs = datagen.corpus(spark, 300, partitions=3)
    pos = build_positions(docs, span=8)  # many small blocks -> prunable
    # rare-term pair (df≈4 each in the 300-doc corpus): most blocks hold
    # one of the terms but not both, so the prune has something to do
    qv = [(1, "parse wand"), (2, "scorer gap encoder"), (3, "join"),
          (4, "zzq parse")]

    for fn, kw in ((phrase_topk, {}), (proximity_topk, {"slop": 2}),
                   (ordered_proximity_topk, {"slop": 2})):
        base = sorted(tuple(r) for r in
                      fn(spark, pos, qv, k=10, **kw).collect())
        pruned = sorted(tuple(r) for r in
                        fn(spark, pos, qv, k=10, block_prune=True,
                           **kw).collect())
        assert base == pruned, fn.__name__

    stats = {int(r["phrase_id"]): r for r in
             conjunctive_skip_stats(pos, qv).collect()}
    for pid, r in stats.items():
        assert 0 <= r["blocks_conjunctive"] <= r["blocks_with_any_term"]
    # rare-term conjunctions over 8-doc blocks must actually prune some
    assert any(
        r["blocks_conjunctive"] < r["blocks_with_any_term"]
        for pid, r in stats.items() if pid in (1, 2)
    ), stats


def test_positions_family_fused_rank_identical(spark):
    """The fused multi-family pipeline must be row-identical to the union
    of the individual operators (the phrase_topk entry rides it)."""
    from instructor_embedding_spark import datagen
    from instructor_embedding_spark.query.phrase import (
        ordered_proximity_topk,
        positions_family_topk,
        proximity_topk,
        span_first_topk,
        span_not_topk,
    )
    from instructor_embedding_spark.query.snippet import snippet_topk

    docs = datagen.corpus(spark, 300, partitions=3)
    pos = build_positions(docs, span=64)

    phrases = [(1, "parse varint block header"), (2, "merge sort"),
               (3, "zzq nothing")]
    near = [(101, "merge sort"), (102, "join"), (103, "zzq nothing")]
    near_ord = [(201, "merge sort"), (202, "sort merge")]
    snips = [(301, "merge sort"), (302, "zzqqxv")]
    firsts = [(401, "merge", 8), (402, "sort", 3)]
    snots = [(601, "merge", "sort"), (602, "hash", "zzqqxv")]

    fused = positions_family_topk(
        spark, pos,
        [
            {"kind": "phrase", "queries": phrases},
            {"kind": "proximity", "queries": near, "slop": 2},
            {"kind": "ordered", "queries": near_ord, "slop": 2},
            {"kind": "snippet", "queries": snips, "window": 12},
            {"kind": "span_first", "queries": firsts},
            {"kind": "span_not", "queries": snots, "pre": 1, "post": 2},
        ],
        k=10,
    )
    got = sorted(tuple(r) for r in fused.collect())

    want = []
    for df in (
        phrase_topk(spark, pos, phrases, k=10),
        proximity_topk(spark, pos, near, slop=2, k=10),
        ordered_proximity_topk(spark, pos, near_ord, slop=2, k=10),
        span_first_topk(spark, pos, firsts, k=10),
        span_not_topk(spark, pos, snots, pre=1, post=2, k=10),
    ):
        want += [
            (r.phrase_id, r.rank, r.doc_id, r.matches, None)
            for r in df.collect()
        ]
    want += [
        (r.query_id, r.rank, r.doc_id, r.covered, r.snippet_start)
        for r in snippet_topk(spark, pos, snips, window=12, k=10).collect()
    ]
    assert got == sorted(want)
    # fused + block_prune stays identical too (pure pre-shuffle prune)
    pruned = positions_family_topk(
        spark, pos,
        [
            {"kind": "phrase", "queries": phrases},
            {"kind": "proximity", "queries": near, "slop": 2},
            {"kind": "ordered", "queries": near_ord, "slop": 2},
            {"kind": "snippet", "queries": snips, "window": 12},
            {"kind": "span_first", "queries": firsts},
            {"kind": "span_not", "queries": snots, "pre": 1, "post": 2},
        ],
        k=10, block_prune=True,
    )
    assert sorted(tuple(r) for r in pruned.collect()) == got


def test_positions_family_duplicate_id_rejected(spark):
    from instructor_embedding_spark.query.phrase import (
        positions_family_topk,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta")], "doc_id long, content string"
    )
    pos = build_positions(docs, span=4)
    import pytest

    with pytest.raises(ValueError, match="duplicate query id"):
        positions_family_topk(
            spark, pos,
            [
                {"kind": "phrase", "queries": [(1, "alpha beta")]},
                {"kind": "proximity", "queries": [(1, "alpha")],
                 "slop": 2},
            ],
        )
