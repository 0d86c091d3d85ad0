"""Term suggestion ("did you mean"): rank dictionary terms near a
(possibly misspelled) input term by edit distance, then corpus
frequency — the Elasticsearch term-suggester / Lucene
DirectSpellChecker analog for this engine.

Semantics (pinned, engine-independent so the DuckDB twin reproduces
them exactly):

- candidates share the input's first ``prefix_len`` characters (the
  DirectSpellChecker prefix guard — also the equi-join key), differ in
  length by at most ``max_edits``, and sit within ``max_edits``
  Levenshtein edits; the input term itself (distance 0) is never a
  suggestion;
- ``mode`` filters candidates the ES way: ``"always"`` keeps all,
  ``"missing"`` suggests only for input terms ABSENT from the
  dictionary, ``"popular"`` keeps only suggestions strictly more
  frequent (by document frequency) than the input term (df 0 when
  absent);
- rank orders by (distance asc, df desc, term asc) — nearest first,
  most-attested first among ties — capped at ``k`` per input term.

Scale shape: the term dictionary (term_stats — one row per distinct
term) is orders of magnitude smaller than postings; the tiny suggest
set broadcasts into a hash join on the shared first-``prefix_len``
key, the length-difference prune runs before any edit-distance DP, and
Spark's threshold-form ``levenshtein(_, _, max_edits)`` bails out of
the DP early — all JVM-side, no UDF, no postings touched.

ASCII contract: Spark's ``levenshtein`` counts UTF-16 code units,
DuckDB's counts utf8proc graphemes; identical for ASCII-ish text (the
tokenizer's output alphabet), same caveat as fuzzy expansion
(prefix.py) and the LCS-ratio twin (fuzzy.py).

Reference parity: the reference has no lexical index or suggester at
all; suggestion is part of this engine's fulltext surface (SURVEY.md
§2.5 graft core) alongside prefix/fuzzy/wildcard expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MODES = ("always", "missing", "popular")
DEFAULT_MAX_EDITS = 2
DEFAULT_PREFIX_LEN = 1
DEFAULT_K = 5


def term_suggest(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    k: int = DEFAULT_K,
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    mode: str = "always",
) -> DataFrame:
    """(query_id, qterm, rank, suggestion, dist, df) — top-``k``
    corrections per input term under ``mode``; row-identical to
    :func:`term_suggest_sql`."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    qt = spark.createDataFrame(queries, "query_id long, qterm string")
    dic = term_stats.select("term", F.col("df").cast("long").alias("df"))
    # the input term's own df (0 when absent) drives missing/popular
    qdf = qt.join(
        dic.select(F.col("term").alias("qterm"),
                   F.col("df").alias("qdf")),
        "qterm", "left",
    ).select("query_id", "qterm", F.coalesce("qdf", F.lit(0)).alias("qdf"))
    cand = (
        dic.join(
            F.broadcast(qdf),
            F.substring("term", 1, prefix_len)
            == F.substring("qterm", 1, prefix_len),
        )
        .filter(F.abs(F.length("term") - F.length("qterm")) <= max_edits)
        .withColumn(
            "dist",
            F.levenshtein(F.col("term"), F.col("qterm"), max_edits)
            .cast("long"),
        )
        .filter(F.col("dist") >= 1)
    )
    if mode == "missing":
        cand = cand.filter(F.col("qdf") == 0)
    elif mode == "popular":
        cand = cand.filter(F.col("df") > F.col("qdf"))
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.col("dist"), F.col("df").desc(), F.col("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "qterm", "rank",
                F.col("term").alias("suggestion"), "dist", "df")
    )


from instructor_embedding_spark.functions.sqllit import (
    sql_values_pairs as _vals,
)


def term_suggest_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = DEFAULT_K,
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    mode: str = "always",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the same (prefix, length-band, distance) candidate
    rule, mode filter, and (dist, df desc, term) rank over a
    first-principles df dictionary."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    from instructor_embedding_spark.functions.tokenize import sql_tokens_expr

    mode_pred = {
        "always": "TRUE",
        "missing": "qdf = 0",
        "popular": "df > qdf",
    }[mode]
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table}
),
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
qp(query_id, qterm) AS (VALUES {_vals(queries)}),
qdf AS (
  SELECT qp.query_id, qp.qterm,
         coalesce(df.df, 0) AS qdf
  FROM qp LEFT JOIN df ON df.term = qp.qterm
),
cand AS (
  SELECT q.query_id, q.qterm, df.term AS suggestion,
         CAST(levenshtein(df.term, q.qterm) AS BIGINT) AS dist,
         df.df AS df, q.qdf
  FROM qdf q JOIN df
    ON substr(df.term, 1, {prefix_len}) = substr(q.qterm, 1, {prefix_len})
   AND abs(length(df.term) - length(q.qterm)) <= {max_edits}
   AND levenshtein(df.term, q.qterm) BETWEEN 1 AND {max_edits}
),
ranked AS (
  SELECT query_id, qterm,
         CAST(row_number() OVER (
           PARTITION BY query_id, qterm
           ORDER BY dist, df DESC, suggestion
         ) AS BIGINT) AS rank,
         suggestion, dist, df
  FROM cand WHERE {mode_pred}
)
SELECT query_id, qterm, rank, suggestion, dist, df
FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------------------- phrase


PHRASE_PER_TERM = 3
PHRASE_K = 3


def phrase_suggest(
    spark: SparkSession,
    term_stats: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = PHRASE_K,
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    per_term: int = PHRASE_PER_TERM,
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, suggestion, total_dist, sum_df) — whole-query
    "did you mean" (the ES phrase suggester with a collate check):

    1. tokenize the query, keeping positions;
    2. per position: the original term (distance 0, df 0 when absent)
       plus its dictionary corrections (same candidate rule as
       :func:`term_suggest`), capped at ``per_term`` by (dist, df desc,
       term) — the original always survives its own cap;
    3. candidate phrases = the cross product across positions (built
       JVM-side by a fold over the per-position candidate arrays —
       bounded by per_term ** n_positions, so callers keep suggest
       queries short, the interactive contract), the zero-edit identity
       phrase excluded;
    4. collate: a phrase survives only if some document contains ALL
       its distinct terms (the ES ``collate`` query check) — candidate
       terms broadcast into the (doc, term) join, so only candidate
       postings rows are touched;
    5. rank per query by (total_dist asc, sum_df desc, suggestion asc),
       capped at ``k``.

    Row-identical to :func:`phrase_suggest_sql` (recursive-CTE twin)."""
    from instructor_embedding_spark.functions.tokenize import tokens_col
    from instructor_embedding_spark.query.bm25 import tf_table, tokenized

    q = spark.createDataFrame(queries, "query_id long, query_text string")
    qtok = q.select(
        "query_id",
        F.posexplode(tokens_col("query_text")).alias("pos", "qterm"),
    )
    dic = term_stats.select("term", F.col("df").cast("long").alias("df"))
    originals = qtok.join(
        dic.select(F.col("term").alias("qterm"), F.col("df").alias("odf")),
        "qterm", "left",
    ).select(
        "query_id", "pos", F.col("qterm").alias("term"),
        F.lit(0).cast("long").alias("dist"),
        F.coalesce("odf", F.lit(0)).cast("long").alias("df"),
    )
    corrections = (
        dic.join(
            F.broadcast(qtok),
            F.substring("term", 1, prefix_len)
            == F.substring("qterm", 1, prefix_len),
        )
        .filter(F.abs(F.length("term") - F.length("qterm")) <= max_edits)
        .withColumn(
            "dist",
            F.levenshtein(F.col("term"), F.col("qterm"), max_edits)
            .cast("long"),
        )
        .filter(F.col("dist") >= 1)
        .select("query_id", "pos", "term", "dist", "df")
    )
    w = Window.partitionBy("query_id", "pos").orderBy(
        F.col("dist"), F.col("df").desc(), F.col("term")
    )
    cand = (
        originals.unionByName(corrections)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_term)
    )
    per_pos = cand.groupBy("query_id", "pos").agg(
        F.collect_list(F.struct("dist", "df", "term")).alias("cs")
    )
    folded = per_pos.groupBy("query_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "cs"))).alias("poscs")
    ).select(
        "query_id",
        F.explode(F.expr("""
            aggregate(
              poscs,
              array(named_struct(
                'terms', cast(array() as array<string>),
                'total_dist', 0L, 'sum_df', 0L)),
              (acc, x) -> flatten(transform(acc, a -> transform(x.cs, c ->
                named_struct(
                  'terms', concat(a.terms, array(c.term)),
                  'total_dist', a.total_dist + c.dist,
                  'sum_df', a.sum_df + c.df))))
            )
        """)).alias("p"),
    )
    phrases = folded.select(
        "query_id",
        F.array_join(F.col("p.terms"), " ").alias("suggestion"),
        F.col("p.total_dist").alias("total_dist"),
        F.col("p.sum_df").alias("sum_df"),
        F.array_distinct(F.col("p.terms")).alias("dterms"),
    ).filter(F.col("total_dist") >= 1)
    tf = tf_table(tokenized(docs, text_col)).select("doc_id", "term")
    cterm = phrases.select(
        "query_id", "suggestion",
        F.size("dterms").alias("need"),
        F.explode("dterms").alias("term"),
    )
    collated = (
        tf.join(F.broadcast(cterm), "term")
        .groupBy("query_id", "suggestion", "doc_id", "need")
        .agg(F.countDistinct("term").alias("got"))
        .filter(F.col("got") == F.col("need"))
        .select("query_id", "suggestion")
        .distinct()
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("total_dist"), F.col("sum_df").desc(), F.col("suggestion")
    )
    return (
        phrases.join(collated, ["query_id", "suggestion"])
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "suggestion", "total_dist", "sum_df")
    )


def phrase_suggest_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = PHRASE_K,
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    per_term: int = PHRASE_PER_TERM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the same pinned pipeline — per-position candidate
    rule + cap, a RECURSIVE-CTE cross product over positions, identity
    exclusion, the conjunctive collate probe, and the (total_dist,
    sum_df desc, suggestion) rank."""
    from instructor_embedding_spark.functions.tokenize import sql_tokens_expr

    return f"""
WITH RECURSIVE toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table}
),
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
qp(query_id, query_text) AS (VALUES {_vals(queries)}),
qts AS (SELECT query_id, {sql_tokens_expr('query_text')} AS qts FROM qp),
qtok AS (
  SELECT query_id, pos, qts[pos] AS qterm
  FROM (SELECT query_id, qts,
               unnest(generate_series(1, len(qts))) AS pos
        FROM qts)
),
originals AS (
  SELECT q.query_id, q.pos, q.qterm AS term,
         CAST(0 AS BIGINT) AS dist,
         CAST(coalesce(df.df, 0) AS BIGINT) AS df
  FROM qtok q LEFT JOIN df ON df.term = q.qterm
),
corrections AS (
  SELECT q.query_id, q.pos, df.term,
         CAST(levenshtein(df.term, q.qterm) AS BIGINT) AS dist,
         df.df
  FROM qtok q JOIN df
    ON substr(df.term, 1, {prefix_len}) = substr(q.qterm, 1, {prefix_len})
   AND abs(length(df.term) - length(q.qterm)) <= {max_edits}
   AND levenshtein(df.term, q.qterm) BETWEEN 1 AND {max_edits}
),
cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id, pos ORDER BY dist, df DESC, term
    ) AS rn
    FROM (SELECT * FROM originals UNION ALL SELECT * FROM corrections)
  ) WHERE rn <= {per_term}
),
build AS (
  SELECT query_id, pos, [term] AS terms, dist AS total_dist, df AS sum_df
  FROM cand WHERE pos = 1
  UNION ALL
  SELECT b.query_id, c.pos, list_append(b.terms, c.term),
         b.total_dist + c.dist, b.sum_df + c.df
  FROM build b JOIN cand c
    ON c.query_id = b.query_id AND c.pos = b.pos + 1
),
np AS (SELECT query_id, max(pos) AS np FROM qtok GROUP BY query_id),
phrases AS (
  SELECT b.query_id, array_to_string(b.terms, ' ') AS suggestion,
         b.total_dist, b.sum_df, list_distinct(b.terms) AS dterms
  FROM build b JOIN np USING (query_id)
  WHERE b.pos = np.np AND b.total_dist >= 1
),
cterm AS (
  SELECT query_id, suggestion, len(dterms) AS need,
         unnest(dterms) AS term
  FROM phrases
),
collated AS (
  SELECT DISTINCT query_id, suggestion FROM (
    SELECT c.query_id, c.suggestion
    FROM cterm c JOIN tf USING (term)
    GROUP BY c.query_id, c.suggestion, tf.doc_id, c.need
    HAVING count(DISTINCT tf.term) = c.need
  )
),
ranked AS (
  SELECT p.query_id,
         CAST(row_number() OVER (
           PARTITION BY p.query_id
           ORDER BY p.total_dist, p.sum_df DESC, p.suggestion
         ) AS BIGINT) AS rank,
         p.suggestion, p.total_dist, p.sum_df
  FROM phrases p JOIN collated USING (query_id, suggestion)
)
SELECT query_id, rank, suggestion, total_dist, sum_df
FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------------------- completion


def complete_prefix(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    k: int = DEFAULT_K,
) -> DataFrame:
    """(query_id, qterm, rank, suggestion, dist, df) — the Elasticsearch
    completion-suggester analog over the term dictionary: suggestions
    are dictionary terms EXTENDING the input prefix (the prefix itself
    included when it is a term), ranked by (df desc, term asc) — the
    weight order CompletionSuggester serves from its FST, with corpus
    document frequency as the weight.  ``dist`` is the number of
    appended characters (0 when the prefix is itself a term).

    Scale shape: dictionary-only like :func:`term_suggest` — the tiny
    query set broadcasts into a hash join on the shared first character,
    the startswith check runs as a post-join filter, no postings are
    touched.  (A latency-critical deployment would serve this from a
    sorted-term FST/trie; the dictionary probe is the batch-engine
    equivalent.)"""
    for _, p in queries:
        if not p:
            raise ValueError(
                "completion prefix must be non-empty (an empty prefix "
                "would match the whole dictionary)"
            )
    qt = spark.createDataFrame(queries, "query_id long, qterm string")
    dic = term_stats.select("term", F.col("df").cast("long").alias("df"))
    cand = dic.join(
        F.broadcast(qt),
        F.substring("term", 1, 1) == F.substring("qterm", 1, 1),
    ).filter(F.col("term").startswith(F.col("qterm")))
    w = Window.partitionBy("query_id", "qterm").orderBy(
        F.col("df").desc(), F.col("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "qterm", "rank",
            F.col("term").alias("suggestion"),
            (F.length("term") - F.length("qterm"))
            .cast("long").alias("dist"),
            "df",
        )
    )


def complete_prefix_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = DEFAULT_K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the same starts_with dictionary probe and
    (df desc, term) weight order over a first-principles df dictionary."""
    for _, p in queries:
        if not p:
            raise ValueError("completion prefix must be non-empty")
    from instructor_embedding_spark.functions.tokenize import sql_tokens_expr

    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS tokens
  FROM {table}
),
tf AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
qp(query_id, qterm) AS (VALUES {_vals(queries)}),
cand AS (
  SELECT q.query_id, q.qterm, df.term AS suggestion,
         CAST(length(df.term) - length(q.qterm) AS BIGINT) AS dist,
         df.df
  FROM qp q JOIN df ON starts_with(df.term, q.qterm)
),
ranked AS (
  SELECT query_id, qterm,
         CAST(row_number() OVER (
           PARTITION BY query_id, qterm
           ORDER BY df DESC, suggestion
         ) AS BIGINT) AS rank,
         suggestion, dist, df
  FROM cand
)
SELECT query_id, qterm, rank, suggestion, dist, df
FROM ranked WHERE rank <= {k}
"""
