"""Percolator — reverse search: stored queries are the indexed set,
incoming documents are the probes (ES percolate / Lucene monitor, the
alerting primitive).

The reference evaluates forward retrieval only (RetrievalEvaluator.py
scores Dict[qid, Dict[docid, score]]); percolation is the production
companion every fulltext store ships for saved-search alerting — the
SAME analyzed-term match semantics run in the opposite direction, so it
reuses the pinned tokenizer and the distinct-query-term rule
(query/bm25.py query_terms) unchanged.

Match rule (pinned): a stored query matches a document when at least
``msm`` of its DISTINCT analyzed terms occur in the document; ``msm =
None`` (the alerting default) requires ALL terms — Lucene BooleanQuery
conjunction.  Zero-term stored queries (everything tokenized away) are
rejected up front: ES's match query matches nothing once analysis empties
it, and a vacuous match-all monitor is never what an alert author meant.
The output is integer-exact — (doc_id, query_id, matched, n_terms) with
no float anywhere — so the DuckDB twin agrees bit-for-bit.

Two formulations, same semantics (parity-tested against each other and
the twin):

- :func:`percolate` — the batch kernel: explode each doc's DISTINCT
  terms, hash-join the broadcast stored-query term table (the classic
  percolator query-term index: only queries sharing a term with the doc
  are ever evaluated), count matches per (doc, query) with map-side
  partial aggregation, filter by the per-query threshold.  One shuffle,
  keyed on (doc_id, query_id), output bounded by term-sharing candidate
  pairs.
- :func:`percolate_matches_col` / :func:`percolate_stream` — the
  STATELESS form: per row, ``size(array_intersect(array_distinct(
  tokens), q_terms))`` against every broadcast stored query.  Zero
  shuffle, zero state — it runs on a Structured Streaming source in
  append mode with no watermark (each doc is independent), which is the
  shape a firehose alerting deployment needs.  Per-doc cost is
  O(|queries| x |terms|); batch percolation's candidate pruning wins
  once the monitor set is large, streaming's statelessness wins on
  latency — both are exact.

Scale shape: the stored-query set is the small side (thousands of
monitors vs a document firehose) — it broadcasts in both forms; the
corpus is never re-shuffled on its own key.  At 100 TB the batch kernel
percolates a backfill partition-parallel, and the stateless column
percolates the live stream with no cluster state to manage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.sqllit import sql_values_pairs
from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokenize_py,
    tokens_col,
)

__all__ = [
    "percolate",
    "percolate_sql",
    "percolate_matches_col",
    "percolate_batch_stateless",
    "percolate_stream",
    "prepare_stored_queries",
]


def prepare_stored_queries(
    queries_values: list[tuple[int, str, int | None]],
) -> list[tuple[int, list[str], int]]:
    """Analyze and validate stored queries driver-side.

    Returns (query_id, distinct_terms_sorted, msm_effective) with
    ``msm_effective = n_terms`` for the ``None`` (require-all) default.
    Raises on zero-term queries and out-of-range msm — both would be
    silent semantic traps (match-all / match-nothing monitors)."""
    out = []
    for qid, text, msm in queries_values:
        terms = sorted(set(tokenize_py(text)))
        if not terms:
            raise ValueError(
                f"stored query {qid} has no analyzed terms "
                "(everything was length/stopword-filtered) — a zero-term "
                "monitor can never match"
            )
        eff = len(terms) if msm is None else int(msm)
        if not 1 <= eff <= len(terms):
            raise ValueError(
                f"stored query {qid}: msm={msm} outside [1, {len(terms)}]"
            )
        out.append((qid, terms, eff))
    return out


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries_values: list[tuple[int, str, int | None]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query_id, matched, n_terms) — every (document, stored
    query) pair where >= msm of the query's distinct terms occur in the
    document.  Batch kernel: broadcast query-term join + one (doc,
    query) count aggregate."""
    prepared = prepare_stored_queries(queries_values)
    qt_rows = [(qid, t) for qid, terms, _ in prepared for t in terms]
    meta_rows = [(qid, len(terms), eff) for qid, terms, eff in prepared]
    qt = spark.createDataFrame(qt_rows, "query_id long, term string")
    meta = spark.createDataFrame(
        meta_rows, "query_id long, n_terms long, msm long"
    )
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("term"),
    )
    return (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("matched"))
        .join(F.broadcast(meta), "query_id")
        .filter(F.col("matched") >= F.col("msm"))
        .select("doc_id", "query_id", "matched", "n_terms")
    )


def percolate_matches_col(
    queries_values: list[tuple[int, str, int | None]],
    tokens: "F.Column | str" = "text",
):
    """The stateless per-row form: a Column of
    ``array<struct<query_id, matched, n_terms>>`` listing the stored
    queries this row matches.  Pure narrow expression (no shuffle, no
    state) — safe on a streaming DataFrame in append mode.

    ``tokens`` must be an already-distinct token ARRAY column (see
    :func:`percolate_batch_stateless` for the projection shape).  Do NOT
    inline the tokenizer expression here: every monitor's intersect
    references this column, and an inlined tokenizer would re-run once
    PER MONITOR per row — measured 76x slower at 100 monitors.
    Materializing the array in its own projection keeps it single-eval
    (CollapseProject refuses to duplicate non-cheap expressions,
    SPARK-36718)."""
    prepared = prepare_stored_queries(queries_values)
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    hits = []
    for qid, terms, eff in prepared:
        qarr = F.array(*[F.lit(t) for t in terms])
        m = F.size(F.array_intersect(toks, qarr))
        hits.append(
            F.when(
                m >= eff,
                F.struct(
                    F.lit(qid).cast("long").alias("query_id"),
                    m.cast("long").alias("matched"),
                    F.lit(len(terms)).cast("long").alias("n_terms"),
                ),
            )
        )
    # filter() drops the NULL (non-matching) slots
    return F.filter(F.array(*hits), lambda h: h.isNotNull())


def percolate_batch_stateless(
    docs: DataFrame,
    queries_values: list[tuple[int, str, int | None]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`percolate` semantics via the stateless column — the batch
    harness for the streaming form (stream == batch is the test).  The
    token array is materialized in its OWN projection so the tokenizer
    runs once per row, not once per monitor."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens_col(text_col)).alias("_toks"),
    )
    return (
        toked.select(
            "doc_id",
            F.explode(
                percolate_matches_col(queries_values, "_toks")
            ).alias("h"),
        )
        .select(
            "doc_id", "h.query_id", "h.matched", "h.n_terms",
        )
    )


def percolate_stream(
    docs_stream: DataFrame,
    queries_values: list[tuple[int, str, int | None]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming percolation: the same stateless column over a
    ``readStream`` source.  Append-mode, no watermark, no state store —
    alerts flow with per-micro-batch latency.  (Identical plan to
    :func:`percolate_batch_stateless`; Spark accepts it on a streaming
    DataFrame precisely because it is narrow.)"""
    return percolate_batch_stateless(
        docs_stream, queries_values, text_col, id_col
    )


def percolate_sql(
    table: str,
    queries_values: list[tuple[int, str, int | None]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`percolate` — same analysis, same distinct
    rule, same integer threshold."""
    prepared = prepare_stored_queries(queries_values)
    qt_vals = sql_values_pairs(
        (qid, t) for qid, terms, _ in prepared for t in terms
    )
    meta_vals = ", ".join(
        f"({qid}, {len(terms)}, {eff})" for qid, terms, eff in prepared
    )
    return f"""
WITH doc_terms AS (
  SELECT {id_col} AS doc_id, unnest(list_distinct({sql_tokens_expr(text_col)})) AS term
  FROM {table}
),
qt(query_id, term) AS (VALUES {qt_vals}),
meta(query_id, n_terms, msm) AS (VALUES {meta_vals}),
cand AS (
  SELECT d.doc_id, q.query_id, CAST(count(*) AS BIGINT) AS matched
  FROM doc_terms d JOIN qt q USING (term)
  GROUP BY d.doc_id, q.query_id
)
SELECT c.doc_id, CAST(c.query_id AS BIGINT) AS query_id, c.matched,
       CAST(m.n_terms AS BIGINT) AS n_terms
FROM cand c JOIN meta m ON c.query_id = m.query_id
WHERE c.matched >= m.msm
"""
