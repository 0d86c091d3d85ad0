"""Brute-force Okapi BM25 retrieval — the engine's exact reference oracle.

Pure DataFrame ops end-to-end (tokenize → tf → df/idf → score → top-k
window); no Python UDF in the scoring path, so Catalyst/Tungsten run the
whole thing JVM-side.  This mirrors the reference's retrieval semantics —
corpus scan, query×doc scoring, global top-k with score-descending sort
(RetrievalEvaluator.py:121-197 in /root/reference) — with BM25 replacing
cosine over embeddings so scores are exactly reproducible.

Pinned semantics (SURVEY.md §8):

- D1 tie-break: ``(score DESC, doc_id ASC)`` everywhere.
- D2 constants: k1=1.2, b=0.75; idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
- D6 query terms are de-duplicated (set semantics, like Lucene's unique
  term iteration).
- N counts ALL documents (including empty-after-tokenize); avgdl averages
  dl over all documents (zeros included).
- Ranking/hashing stability: ordering uses round(score, 6); emitted score
  is round(score, 6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokens_col,
    tokens_pandas_udf,
)

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def tokenized(docs: DataFrame, text_col: str, id_col: str = "doc_id",
              use_pandas_udf: bool = False) -> DataFrame:
    """(id, tokens, dl) — dl is the post-filter token count (pinned)."""
    tok = tokens_pandas_udf(text_col) if use_pandas_udf else tokens_col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tok.alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_stats(toks: DataFrame) -> DataFrame:
    """(doc_id, dl) for every document, zero-token docs included."""
    return toks.select("doc_id", "dl")


def tf_table(toks: DataFrame, terms: DataFrame | None = None) -> DataFrame:
    """(doc_id, term, tf, dl) — one shuffle, map-side partial agg.

    ``terms`` (a one-column ``term`` DataFrame) restricts the table to
    those terms BEFORE the aggregation shuffle: the broadcast semi-join
    sits between the explode and the groupBy, so non-query tokens never
    enter the exchange (groups are per-term, so dropping whole terms
    early is exact).  Callers that need the full vocabulary (dictionary
    builds, facets) omit it."""
    ex = toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
    if terms is not None:
        ex = ex.join(F.broadcast(terms), "term", "left_semi")
    return (
        ex.groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("doc_id", "term", "tf", "dl")
    )


def corpus_stats(toks: DataFrame) -> CorpusStats:
    row = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0))


def term_stats(tf: DataFrame, stats: CorpusStats) -> DataFrame:
    """(term, df, idf) with the pinned smooth idf.

    ``count(when(tf >= 1, 1))`` ≡ ``count(*)`` here — tf is a positive
    aggregate count in every caller (pinned precondition) — but the
    non-foldable predicate keeps the ``tf`` column referenced, so this
    branch's copy of the tf exchange stays column-identical to the
    scoring branch's and AQE reuses ONE shuffle stage (one
    tokenize+explode map pass) for both.  With ``count(lit(1))`` (or
    plain ``count(tf)``, which Catalyst folds back to it because tf is
    non-nullable) column pruning dropped ``tf`` from this branch and the
    two exchanges no longer canonicalized equal, recomputing the whole
    scan→tokenize→explode→aggregate subtree just for df."""
    return tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df")
    ).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(stats.n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
    )


def query_terms(queries: DataFrame, use_pandas_udf: bool = False) -> DataFrame:
    """(query_id, term) — de-duplicated per query (pinned D6)."""
    tok = (
        tokens_pandas_udf("query_text")
        if use_pandas_udf
        else tokens_col("query_text")
    )
    return (
        queries.select("query_id", F.explode(tok).alias("term"))
        .distinct()
    )


def bm25_score_col(tf_col, dl_col, idf_col, avgdl: float):
    """The per-(term, doc) BM25 contribution as a column expression."""
    return idf_col * (
        tf_col * (K1 + 1.0)
        / (tf_col + K1 * (1.0 - B + B * dl_col / F.lit(float(avgdl))))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_pandas_udf: bool = False,
    doc_filter: DataFrame | None = None,
    require_all: bool = False,
    min_should_match: int | None = None,
    term_boosts: DataFrame | None = None,
    search_after: DataFrame | None = None,
) -> DataFrame:
    """End-to-end brute-force BM25 top-k: (query_id, rank, doc_id, score).

    The query-term table is tiny relative to the tf table, so the term
    equi-join broadcasts (the inverted-index engine replaces this join's
    probe side with pre-built segments; semantics are identical).

    ``require_all`` switches OR semantics (any query term matches) to
    boolean AND: only docs containing EVERY query term rank, scored by
    the same BM25 sum.  tf is unique per (doc, term) and qt is distinct
    per (query, term), so the per-(query, doc) row count IS the matched
    distinct-term count — no extra distinct pass.

    ``term_boosts`` is a (query_id, term, boost) table of query-time
    per-term boosts (Lucene ``term^boost``): each listed term's score
    contribution is multiplied by its boost; unlisted (query, term)
    pairs default to 1.0, and boosts for terms the query doesn't contain
    are ignored (the join is FROM the query-term side).  Boosts must be
    > 0 — matching is unchanged (a boosted term still counts once toward
    ``matched``), only the score scales.

    ``search_after`` is a (query_id, after_score, after_doc) cursor table
    for deep paging: only docs STRICTLY after the cursor in
    (round(score, 6) DESC, doc_id ASC) order rank, and ranks restart at 1
    per page.  Queries absent from the table get their first page.
    """
    toks = tokenized(docs, text_col, id_col, use_pandas_udf)
    stats = corpus_stats(toks)
    qt = query_terms(queries, use_pandas_udf)
    # scored/idf only ever consume QUERY terms, so restrict the tf
    # aggregation to them before its shuffle (exact: groups are
    # per-term; df/idf for a query term is unchanged).  At corpus scale
    # this shrinks the tf exchange from every (doc, term) pair to the
    # query-matched ones.
    tf = tf_table(toks, terms=qt.select("term").distinct())
    ts = term_stats(tf, stats)

    contrib = bm25_score_col(F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl)
    if term_boosts is not None:
        qt = qt.join(
            term_boosts.select(
                "query_id", "term", F.col("boost").cast("double").alias("boost")
            ),
            ["query_id", "term"],
            "left",
        ).withColumn("boost", F.coalesce(F.col("boost"), F.lit(1.0)))
        contrib = contrib * F.col("boost")
    scored = (
        tf.join(ts.select("term", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"),
             F.count(F.lit(1)).alias("matched"))
    )
    if require_all:
        nt = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
        scored = scored.join(F.broadcast(nt), "query_id").filter(
            F.col("matched") == F.col("n_terms")
        )
    elif min_should_match is not None and min_should_match > 1:
        # Lucene BooleanQuery minimum_should_match: at least this many
        # DISTINCT query terms per (query, doc); msm=1 is plain OR
        scored = scored.filter(F.col("matched") >= min_should_match)
    if doc_filter is not None:
        # filtered retrieval: predicate narrows candidates AFTER scoring
        # with global stats (pinned semantics, matches the WAND engine)
        scored = scored.join(
            doc_filter.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    if search_after is not None:
        cur = search_after.select(
            "query_id",
            F.col("after_score").cast("double").alias("after_score"),
            F.col("after_doc").cast("long").alias("after_doc"),
        )
        r6 = F.round(F.col("score_raw"), SCORE_DECIMALS)
        scored = (
            scored.join(F.broadcast(cur), "query_id", "left")
            .filter(
                F.col("after_score").isNull()
                | (r6 < F.col("after_score"))
                | ((r6 == F.col("after_score"))
                   & (F.col("doc_id") > F.col("after_doc")))
            )
            .drop("after_score", "after_doc")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


def bm25_topk_fielded(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fields: tuple[tuple[str, float], ...] = (("title", 2.0), ("text", 1.0)),
    id_col: str = "doc_id",
    use_pandas_udf: bool = False,
) -> DataFrame:
    """Field-boosted BM25 top-k (D4 v2 — the reference concats
    ``title + ' ' + text`` before encoding, AbsTaskRetrieval.py:718-736;
    here each field carries a weight instead, BM25F-style):

    - wtf(doc, term)  = Σ_f w_f · tf_f(doc, term)
    - wdl(doc)        = Σ_f w_f · dl_f(doc);  avgwdl = avg over ALL docs
    - df(term)        = #docs where the term appears in ANY field
    - score           = Σ_t idf(t) · wtf·(k1+1) / (wtf + k1·(1−b+b·wdl/avgwdl))

    Integer-valued weights keep wdl sums exactly representable, so both
    engines compute identical corpus stats without rounding."""
    qt = query_terms(queries, use_pandas_udf)
    _qterms = qt.select("term").distinct()
    parts = []
    dl_cols = []
    for col, w in fields:
        toks = tokenized(docs, col, id_col, use_pandas_udf)
        parts.append(
            toks.select("doc_id", F.explode("tokens").alias("term"))
            # query-term-restricted before the aggregation shuffle (see
            # tf_table): wtf/df are only ever consumed for query terms
            .join(F.broadcast(_qterms), "term", "left_semi")
            .groupBy("doc_id", "term")
            .agg((F.count(F.lit(1)) * F.lit(float(w))).alias("wtf"))
        )
        tok_expr = (
            tokens_pandas_udf(col) if use_pandas_udf else tokens_col(col)
        )
        dl_cols.append(F.size(tok_expr) * F.lit(float(w)))
    wdl = docs.select(
        F.col(id_col).alias("doc_id"),
        sum(dl_cols[1:], dl_cols[0]).alias("wdl"),
    )
    row = wdl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("wdl").alias("avgwdl")
    ).collect()[0]
    n_docs, avgwdl = int(row["n"]), float(row["avgwdl"] or 0.0)

    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    wtf = union.groupBy("doc_id", "term").agg(F.sum("wtf").alias("wtf"))
    # count(when(wtf > 0, 1)) ≡ count(*) (weights are positive, counts
    # ≥ 1) — keeps this branch column-identical to the scoring branch so
    # AQE reuses the wtf exchange instead of recomputing the per-field
    # tokenize unions for df (see term_stats)
    ts = wtf.groupBy("term").agg(
        F.count(F.when(F.col("wtf") > 0, 1)).alias("df")
    ).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
    )
    contrib = F.col("idf") * (
        F.col("wtf") * (K1 + 1.0)
        / (F.col("wtf")
           + K1 * (1.0 - B + B * F.col("wdl") / F.lit(avgwdl)))
    )
    scored = (
        wtf.join(ts.select("term", "idf"), "term")
        .join(wdl, "doc_id")
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"))
    )
    w_win = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_win).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


def bm25_topk_fielded_sql(
    table_sql: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    fields: tuple[tuple[str, float], ...] = (("title", 2.0), ("text", 1.0)),
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`bm25_topk_fielded`.  ``table_sql`` is a
    SELECT yielding (id_col + every field column)."""
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    tf_unions = " UNION ALL ".join(
        f"SELECT doc_id, term, count(*) * {float(w)!r} AS wtf "
        f"FROM (SELECT {id_col} AS doc_id, "
        f"unnest({sql_tokens_expr(col)}) AS term FROM src) "
        "GROUP BY doc_id, term"
        for col, w in fields
    )
    wdl_expr = " + ".join(
        f"len({sql_tokens_expr(col)}) * {float(w)!r}" for col, w in fields
    )
    return f"""
WITH src AS ({table_sql}),
wdl AS (SELECT {id_col} AS doc_id, {wdl_expr} AS wdl FROM src),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(wdl) AS avgwdl FROM wdl),
wtf AS (
  SELECT doc_id, term, sum(wtf) AS wtf
  FROM ({tf_unions}) GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wtf GROUP BY term),
q(query_id, query_text) AS (VALUES {vals}),
qtok AS (SELECT query_id, {sql_tokens_expr('query_text')} AS tokens FROM q),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest(tokens) AS term FROM qtok)
),
scored AS (
  SELECT qt.query_id, wtf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * wtf.wtf * ({K1} + 1.0)
           / (wtf.wtf + {K1} * (1.0 - {B} + {B} * wdl.wdl / stats.avgwdl))
         ) AS score_raw
  FROM qt
  JOIN wtf USING (term)
  JOIN df USING (term)
  JOIN wdl ON wtf.doc_id = wdl.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, wtf.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id,
         round(score_raw, {SCORE_DECIMALS}) AS score
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------- dismax
#
# Lucene DisjunctionMaxQuery / ES multi_match type=best_fields: each
# field is scored as an INDEPENDENT BM25 index (its own df, dl, avgdl —
# exactly how Lucene scores per-field terms), then per (query, doc)
#
#   score = max_f(s_f) + tie_breaker * (sum_f(s_f) - max_f(s_f))
#
# (DisjunctionMaxQuery's max + tieBreakerMultiplier * sum-of-others).
# Contrast with bm25_topk_fielded above, which is the BM25F-style
# weighted-tf blend; real engines ship both.


def dismax_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fields: tuple[tuple[str, float], ...] = (("title", 2.0), ("text", 1.0)),
    tie_breaker: float = 0.3,
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — DisjunctionMaxQuery top-k over
    per-field BM25 scores (field boost multiplies the field's score, the
    ES ``fields: ["title^2", "text"]`` form); rank-identical to
    :func:`dismax_topk_sql`.

    Scale shape: one scored aggregate per field (each the standard
    scan -> broadcast-qt join -> hash aggregate), unioned and re-grouped
    on the SAME (query_id, doc_id) key — AQE coalesces the second
    shuffle onto the first's partitioning."""
    qt = query_terms(queries)
    qterms = qt.select("term").distinct()
    per_field = []
    for col, boost in fields:
        toks = tokenized(docs, col, id_col)
        stats = corpus_stats(toks)
        # query-term-restricted per-field tf (see bm25_topk): each
        # field's df/idf for a query term is unchanged
        tf = tf_table(toks, terms=qterms)
        ts = term_stats(tf, stats)
        contrib = bm25_score_col(
            F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
        )
        per_field.append(
            tf.join(ts.select("term", "idf"), "term")
            .join(F.broadcast(qt), "term")
            .groupBy("query_id", "doc_id")
            .agg((F.sum(contrib) * F.lit(float(boost))).alias("s"))
        )
    union = per_field[0]
    for p in per_field[1:]:
        union = union.unionByName(p)
    comb = union.groupBy("query_id", "doc_id").agg(
        F.max("s").alias("mx"), F.sum("s").alias("sm")
    )
    final = comb.withColumn(
        "score_raw",
        F.col("mx")
        + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    return (
        final.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.round(F.col("score_raw"), SCORE_DECIMALS).alias("score"),
        )
    )


def dismax_topk_sql(
    table_sql: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    fields: tuple[tuple[str, float], ...] = (("title", 2.0), ("text", 1.0)),
    tie_breaker: float = 0.3,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`dismax_topk` — one
    independent per-field CTE chain per field, same combine order."""
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    field_ctes = []
    scored_sqls = []
    for i, (col, boost) in enumerate(fields):
        field_ctes.append(f"""toks_{i} AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(col)} AS tokens FROM src
),
dl_{i} AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks_{i}),
stats_{i} AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl_{i}
),
tf_{i} AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks_{i})
  GROUP BY doc_id, term
),
df_{i} AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf_{i} GROUP BY term
)""")
        scored_sqls.append(f"""SELECT qt.query_id, tf_{i}.doc_id,
       sum(
         ln(1 + (stats_{i}.n - df_{i}.df + 0.5) / (df_{i}.df + 0.5))
         * (tf_{i}.tf * ({K1} + 1.0)
            / (tf_{i}.tf + {K1} * (1.0 - {B}
               + {B} * dl_{i}.dl / stats_{i}.avgdl)))
       ) * {float(boost)!r} AS s
FROM qt
JOIN tf_{i} USING (term)
JOIN df_{i} USING (term)
JOIN dl_{i} ON tf_{i}.doc_id = dl_{i}.doc_id
CROSS JOIN stats_{i}
GROUP BY qt.query_id, tf_{i}.doc_id""")
    u = " UNION ALL ".join(f"({s})" for s in scored_sqls)
    ctes = ",\n".join(field_ctes)
    return f"""
WITH src AS ({table_sql}),
{ctes},
q(query_id, query_text) AS (VALUES {vals}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id,
               unnest({sql_tokens_expr('query_text')}) AS term
        FROM q)
),
u AS ({u}),
comb AS (
  SELECT query_id, doc_id, max(s) AS mx, sum(s) AS sm
  FROM u GROUP BY query_id, doc_id
),
final AS (
  SELECT query_id, doc_id,
         mx + {float(tie_breaker)!r} * (sm - mx) AS score_raw
  FROM comb
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id,
         round(score_raw, {SCORE_DECIMALS}) AS score
  FROM final
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""



def bm25_topk_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidate_filter_sql: str | None = None,
    require_all: bool = False,
    neg_queries_values: list[tuple[int, str]] | None = None,
    min_should_match: int | None = None,
    boosts_values: list[tuple[int, str, float]] | None = None,
    cursors_values: list[tuple[int, float, int]] | None = None,
) -> str:
    """DuckDB oracle SQL computing exactly :func:`bm25_topk`.

    ``queries_values`` is inlined as a VALUES list so the oracle is
    self-contained over the pre-registered parquet views.
    ``require_all`` mirrors the boolean-AND mode: scored rows keep only
    (query, doc) groups whose matched-term count equals the query's
    distinct-term count.
    ``neg_queries_values`` mirrors MUST_NOT: a (query, doc) is dropped
    when the doc contains ANY of that query's prohibited terms
    (tokenized identically to the positive side).
    ``boosts_values`` mirrors ``term_boosts``: (query_id, term, boost)
    triples LEFT-joined onto the query-term table, defaulting to 1.0.
    ``cursors_values`` mirrors ``search_after``: (query_id, after_score,
    after_doc) page cursors; queries without a cursor get page one.
    """
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    conds = []
    neg_ctes = ""
    if candidate_filter_sql:
        conds.append(f"doc_id IN ({candidate_filter_sql})")
    if require_all:
        conds.append(
            "matched = (SELECT count(*) FROM qt "
            "WHERE qt.query_id = scored.query_id)"
        )
    elif min_should_match is not None and min_should_match > 1:
        conds.append(f"matched >= {int(min_should_match)}")
    if neg_queries_values:
        nvals = ", ".join(
            "({}, '{}')".format(qid, text.replace("'", "''"))
            for qid, text in neg_queries_values
        )
        neg_ctes = f""",
nq(query_id, query_text) AS (VALUES {nvals}),
nqt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest({sql_tokens_expr('query_text')}) AS term
        FROM nq)
)"""
        conds.append(
            "NOT EXISTS (SELECT 1 FROM nqt JOIN tf ntf USING (term) "
            "WHERE nqt.query_id = scored.query_id "
            "AND ntf.doc_id = scored.doc_id)"
        )
    cursor_cte = ""
    if cursors_values:
        cvals = ", ".join(
            "({}, {!r}, {})".format(qid, float(s), did)
            for qid, s, did in cursors_values
        )
        cursor_cte = (
            f",\ncur(query_id, after_score, after_doc) AS (VALUES {cvals})"
        )
        # strictly after the cursor in (round(score,6) DESC, doc_id ASC)
        # order; TRUE (first page) when the query has no cursor row
        conds.append(
            "coalesce((SELECT round(scored.score_raw, 6) < c.after_score "
            "OR (round(scored.score_raw, 6) = c.after_score "
            "AND scored.doc_id > c.after_doc) "
            "FROM cur c WHERE c.query_id = scored.query_id), TRUE)"
        )
    filt = ("WHERE " + " AND ".join(conds)) if conds else ""
    boost_cte, boost_join, boost_factor = "", "", ""
    if boosts_values:
        bvals = ", ".join(
            "({}, '{}', {!r})".format(qid, term.replace("'", "''"), float(b))
            for qid, term, b in boosts_values
        )
        boost_cte = f",\nqb(query_id, term, boost) AS (VALUES {bvals})"
        boost_join = ("  LEFT JOIN qb ON qb.query_id = qt.query_id "
                      "AND qb.term = qt.term\n")
        boost_factor = "\n           * coalesce(qb.boost, 1.0)"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens FROM {table}
),
dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
q(query_id, query_text) AS (VALUES {vals}),
qtok AS (SELECT query_id, {sql_tokens_expr('query_text')} AS tokens FROM q),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id, unnest(tokens) AS term FROM qtok)
){neg_ctes}{boost_cte}{cursor_cte},
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)){boost_factor}
         ) AS score_raw,
         count(*) AS matched
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
{boost_join}  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id,
         round(score_raw, {SCORE_DECIMALS}) AS score
  FROM scored {filt}
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------- explain


def explain_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, term, tf, dl, df, idf, contrib) — the Lucene
    ``explain()`` analog: one row per matched query term of each TOP-K
    document, carrying every scoring input and the round-6 per-term BM25
    contribution.  ``sum(contrib)`` per (query, doc) re-rounds to the
    ranked score within the rounding quantum (tested); the breakdown is
    the gated score's own addends, so explain needs no separate oracle
    entry — its twin is :func:`explain_topk_sql`.

    Scale shape: the top-k doc set (|queries| × k rows) broadcasts back
    into the per-term contribution table — explain costs one extra
    broadcast semi-join over the scoring pass, nothing more."""
    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    qt = query_terms(queries)
    # query-term-restricted tf aggregation (see bm25_topk): explain's
    # rows are query terms only, and df/idf per query term is unchanged
    tf = tf_table(toks, terms=qt.select("term").distinct())
    ts = term_stats(tf, stats)
    contrib = bm25_score_col(
        F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
    )
    rows = (
        tf.join(ts.select("term", "df", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .withColumn("contrib_raw", contrib)
    )
    # top-k from the SAME contribution rows (one scoring pass; the twin
    # derives topk from its rows_ CTE identically)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
    )
    keep = (
        rows.groupBy("query_id", "doc_id")
        .agg(F.sum("contrib_raw").alias("score_raw"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id")
    )
    return (
        rows.join(F.broadcast(keep), ["query_id", "doc_id"], "left_semi")
        .select(
            "query_id", "doc_id", "term", "tf", "dl", "df",
            F.round(F.col("idf"), SCORE_DECIMALS).alias("idf"),
            F.round(F.col("contrib_raw"), SCORE_DECIMALS).alias("contrib"),
        )
    )


def explain_topk_sql(
    table: str,
    queries_values: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle computing exactly :func:`explain_topk`."""
    vals = ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in queries_values
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table}
),
dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
q(query_id, query_text) AS (VALUES {vals}),
qt AS (
  SELECT DISTINCT query_id, term
  FROM (SELECT query_id,
               unnest({sql_tokens_expr('query_text')}) AS term FROM q)
),
rows_ AS (
  SELECT qt.query_id, tf.doc_id, tf.term, tf.tf, dl.dl, df.df,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)) AS idf_raw,
         ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({K1} + 1.0)
              / (tf.tf + {K1} * (1.0 - {B}
                 + {B} * dl.dl / stats.avgdl))) AS contrib_raw
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
topk AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(sum(contrib_raw), {SCORE_DECIMALS}) DESC,
                      doc_id ASC
           ) AS rank
    FROM rows_ GROUP BY query_id, doc_id
  ) WHERE rank <= {k}
)
SELECT r.query_id, r.doc_id, r.term, r.tf, r.dl, r.df,
       round(r.idf_raw, {SCORE_DECIMALS}) AS idf,
       round(r.contrib_raw, {SCORE_DECIMALS}) AS contrib
FROM rows_ r JOIN topk USING (query_id, doc_id)
"""
