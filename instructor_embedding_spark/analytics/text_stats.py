"""Text analysis for training-data pipelines: quality scoring, token
counting, language profiling, document fingerprinting.

Reference analogs: length predicates and normalization
(ClusteringEvaluator.py:91-94, instructor.py:390-394), stopword filtering
(bridge_content_encoder.py:8-46), the length-sorted batching statistic
(instructor.py:632-641).  All pure JVM column expressions with DuckDB
twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import sql_tokens_expr, tokens_col
from instructor_embedding_spark.stopwords import stopword_sql_list

_STOP_SQL = stopword_sql_list()


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id[, *extra_cols], n_tokens, n_distinct, distinct_ratio,
    stopword_ratio, mean_token_len, quality) per doc.

    quality = distinct_ratio * (1 - stopword_ratio) * min(n_tokens, 200)/200
    — a simple monotone composite: repetitive, stopword-heavy, or very
    short docs score low.  ``extra_cols`` pass through unchanged so
    composed entries stay a single projection instead of re-joining on
    doc_id (same contract as :func:`token_counts`)."""
    toks = tokens_col(text_col)
    ws = F.split(F.lower(F.col(text_col)), r"\s+")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra_cols,
        toks.alias("toks"),
        ws.alias("ws"),
    )
    n_tok = F.size("toks")
    n_dis = F.size(F.array_distinct("toks"))
    n_ws = F.size(F.expr(f"filter(ws, w -> w IN ({_STOP_SQL}))"))
    total_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    out = d.select(
        "doc_id",
        *extra_cols,
        n_tok.cast("long").alias("n_tokens"),
        n_dis.cast("long").alias("n_distinct"),
        F.round(
            F.when(n_tok > 0, n_dis / n_tok).otherwise(0.0), 6
        ).alias("distinct_ratio"),
        F.round(
            F.when(F.size("ws") > 0, n_ws / F.size("ws")).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tok > 0, total_len / n_tok).otherwise(0.0), 6
        ).alias("mean_token_len"),
    )
    return out.withColumn(
        "quality",
        F.round(
            F.col("distinct_ratio")
            * (1.0 - F.col("stopword_ratio"))
            * F.least(F.col("n_tokens"), F.lit(200)) / 200.0,
            6,
        ),
    )


def quality_scores_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    t = sql_tokens_expr(text_col)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc_id, {t} AS toks,
         string_split_regex(lower({text_col}), '\\s+') AS ws
  FROM {table}
),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         round(CASE WHEN len(toks) > 0
               THEN len(list_distinct(toks)) * 1.0 / len(toks)
               ELSE 0.0 END, 6) AS distinct_ratio,
         round(CASE WHEN len(ws) > 0
               THEN len(list_filter(ws, w -> w IN ({_STOP_SQL}))) * 1.0
                    / len(ws)
               ELSE 0.0 END, 6) AS stopword_ratio,
         round(CASE WHEN len(toks) > 0
               THEN list_sum(list_transform(toks, t -> length(t))) * 1.0
                    / len(toks)
               ELSE 0.0 END, 6) AS mean_token_len
  FROM d
)
SELECT *,
       round(distinct_ratio * (1.0 - stopword_ratio)
             * least(n_tokens, 200) / 200.0, 6) AS quality
FROM s
"""


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, chars[, *extra_cols]) — cheap
    cost estimators.

    bpe_ish = count of word/number/punct-run pieces (a BPE-shaped regex),
    the standard pre-tokenizer approximation for budget planning.
    ``extra_cols`` pass through unchanged so composed entries stay a
    single projection instead of re-joining on doc_id."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *extra_cols,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias(
            "ws_tokens"
        ),
        F.size(
            F.expr(
                f"regexp_extract_all({text_col}, "
                "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"
            )
        ).cast("long").alias("bpe_ish_tokens"),
        F.length(text_col).cast("long").alias("chars"),
    )


def token_counts_sql(table: str, text_col: str = "text",
                     id_col: str = "doc_id",
                     extra_cols: tuple[str, ...] = ()) -> str:
    extra = "".join(f"       {c},\n" for c in extra_cols)
    return f"""
SELECT {id_col} AS doc_id,
{extra}
       CAST(len(string_split_regex(trim({text_col}), '\\s+')) AS BIGINT)
         AS ws_tokens,
       CAST(len(regexp_extract_all({text_col},
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
         AS bpe_ish_tokens,
       CAST(length({text_col}) AS BIGINT) AS chars
FROM {table}
"""


def lang_profile(docs: DataFrame, text_col: str = "text",
                 lang_col: str = "lang", id_col: str = "doc_id") -> DataFrame:
    """(lang, n_docs, avg_tokens, top_term, est/exact distinct terms and
    postings) — per-language corpus profile (M13/W9 composition: groupBy +
    max_by), extended (r5) with the ES `cardinality`-agg analog: a
    deterministic HyperLogLog estimate of distinct terms and distinct
    (term, doc) postings per language, each next to its exact
    count(DISTINCT) so the gate pins both determinism AND accuracy.  The
    two value sets exercise both estimator branches at fixture scale
    (terms → linear counting, postings → raw formula); at 100 TB only the
    sketch columns survive — the exact twins are the small-scale oracle."""
    from instructor_embedding_spark.analytics import cardinality

    # one tokenize+explode pass feeds tf/top and all four cardinality
    # columns (review finding: the un-persisted lineage re-ran the
    # tokenizer per branch); cached because four independent aggregates
    # consume it — Spark's LRU evicts it after the entry materializes
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    ).cache()
    tf = toks.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    top = tf.groupBy("lang").agg(
        F.max_by("term", F.struct(F.col("tf"), F.col("term"))).alias("top_term")
    )
    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.size(tokens_col(text_col)).alias("n"),
    ).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n"), 6).alias("avg_tokens"),
    )
    terms = toks.select("lang", F.col("term").alias("v"))
    postings = toks.select(
        "lang",
        F.concat_ws(":", "term", F.col("doc_id").cast("string")).alias("v"),
    )
    # both exact counts in ONE hash aggregate over the cached pass
    exact = toks.groupBy("lang").agg(
        F.countDistinct("term").alias("exact_distinct_terms"),
        F.countDistinct("term", "doc_id").alias("exact_distinct_postings"),
    )
    card = (
        cardinality.hll_estimate(terms, "v", ["lang"])
        .withColumnRenamed("est_distinct", "est_distinct_terms")
        .join(
            cardinality.hll_estimate(postings, "v", ["lang"])
            .withColumnRenamed("est_distinct", "est_distinct_postings"),
            "lang",
        )
        .join(exact, "lang")
    )
    return base.join(top, "lang").join(card, "lang").select(
        "lang", "n_docs", "avg_tokens", "top_term",
        "est_distinct_terms", "exact_distinct_terms",
        "est_distinct_postings", "exact_distinct_postings",
    )


#: Language-ID heuristic (task mandate: "language-ID (n-gram heuristic)"):
#: per-language character-trigram profiles learned from the even-id half
#: of the corpus, classification by profile-overlap count.  Every score is
#: an exact INTEGER (distinct-trigram intersections), so the DuckDB twin
#: matches bit-for-bit — no float tolerance anywhere in the op.
LANGID_N = 3
LANGID_TOPK = 50


def langid_ngram(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", lang_col: str = "lang",
                 n: int = LANGID_N, top_k: int = LANGID_TOPK) -> DataFrame:
    """(doc_id, lang, pred_lang, overlap) — n-gram language
    identification: train char-trigram profiles (top_k most frequent
    distinct-per-doc trigrams per language, ties broken lexicographically)
    on even doc_ids, classify every doc by argmax profile-overlap
    (ties → smallest language).  Docs sharing no trigram with any profile
    drop out (deterministic in both engines).

    Distributed shape: trigram explode is narrow; the profile is
    langs × top_k rows — broadcast; classification is one groupBy over
    (doc, candidate-language) cells.  No crossJoin, no Python UDF."""
    lowered = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.lower(F.col(text_col)).alias("s"),
    )
    tri = lowered.select(
        "doc_id", "lang",
        F.explode(
            F.when(
                F.length("s") >= n,
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length(s) - {n - 1}), "
                        f"i -> substring(s, i, {n}))"
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("tg"),
    )
    counts = (
        tri.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wp = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("tg").asc()
    )
    prof = (
        counts.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= top_k)
        .select(F.col("lang").alias("cand_lang"), "tg")
    )
    ov = (
        tri.join(F.broadcast(prof), "tg")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), F.col("cand_lang").asc()
    )
    return (
        ov.withColumn("rd", F.row_number().over(wd))
        .filter(F.col("rd") == 1)
        .select("doc_id", "lang", F.col("cand_lang").alias("pred_lang"),
                F.col("overlap").cast("long").alias("overlap"))
    )


def langid_ngram_sql(table: str, text_col: str = "text",
                     id_col: str = "doc_id", lang_col: str = "lang",
                     n: int = LANGID_N, top_k: int = LANGID_TOPK) -> str:
    """DuckDB twin of :func:`langid_ngram` — integer-only scoring, so the
    match is exact."""
    return f"""
WITH s AS (
  SELECT {id_col} AS doc_id, {lang_col} AS lang, lower({text_col}) AS s
  FROM {table}
),
tri AS (
  SELECT doc_id, lang, unnest(list_distinct(
           CASE WHEN length(s) >= {n}
                THEN list_transform(range(1, length(s) - {n - 2}),
                                    i -> substr(s, i, {n}))
                ELSE [] END)) AS tg
  FROM s
),
prof AS (
  SELECT lang AS cand_lang, tg FROM (
    SELECT lang, tg,
           row_number() OVER (
             PARTITION BY lang ORDER BY count(*) DESC, tg ASC) AS rn
    FROM tri WHERE doc_id % 2 = 0 GROUP BY lang, tg
  ) WHERE rn <= {top_k}
),
ov AS (
  SELECT t.doc_id, t.lang, p.cand_lang, count(*) AS overlap
  FROM tri t JOIN prof p USING (tg)
  GROUP BY t.doc_id, t.lang, p.cand_lang
)
SELECT doc_id, lang, cand_lang AS pred_lang,
       CAST(overlap AS BIGINT) AS overlap
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY overlap DESC, cand_lang ASC) AS rd
  FROM ov
) WHERE rd = 1
"""


def lang_profile_sql(table: str, text_col: str = "text",
                     lang_col: str = "lang", id_col: str = "doc_id") -> str:
    from instructor_embedding_spark.analytics.cardinality import (
        hll_estimate_sql,
    )

    t = sql_tokens_expr(text_col)
    toks = (
        f"SELECT {lang_col} AS lang, {id_col} AS doc_id, "
        f"unnest({t}) AS term FROM {table}"
    )
    terms = f"SELECT lang, term AS v FROM ({toks})"
    postings = (
        f"SELECT lang, term || ':' || CAST(doc_id AS VARCHAR) AS v "
        f"FROM ({toks})"
    )
    est_terms = hll_estimate_sql(terms, "v", ["lang"])
    est_postings = hll_estimate_sql(postings, "v", ["lang"])
    return f"""
WITH tf AS (
  SELECT lang, term, count(*) AS tf
  FROM ({toks})
  GROUP BY lang, term
),
top AS (
  SELECT lang, term AS top_term FROM (
    SELECT lang, term, row_number() OVER (
      PARTITION BY lang ORDER BY tf DESC, term DESC) AS rn
    FROM tf
  ) WHERE rn = 1
),
base AS (
  SELECT {lang_col} AS lang, count(*) AS n_docs,
         round(avg(len({t})), 6) AS avg_tokens
  FROM {table} GROUP BY 1
),
card AS (
  SELECT et.lang,
         et.est_distinct AS est_distinct_terms,
         xt.exact_distinct_terms,
         ep.est_distinct AS est_distinct_postings,
         xp.exact_distinct_postings
  FROM ({est_terms}) et
  JOIN (SELECT lang, count(DISTINCT v) AS exact_distinct_terms
        FROM ({terms}) GROUP BY lang) xt USING (lang)
  JOIN ({est_postings}) ep USING (lang)
  JOIN (SELECT lang, count(DISTINCT v) AS exact_distinct_postings
        FROM ({postings}) GROUP BY lang) xp USING (lang)
)
SELECT base.lang, base.n_docs, base.avg_tokens, top.top_term,
       card.est_distinct_terms, card.exact_distinct_terms,
       card.est_distinct_postings, card.exact_distinct_postings
FROM base JOIN top ON base.lang = top.lang
JOIN card ON base.lang = card.lang
"""


def doc_fingerprints(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", w: int = 5) -> DataFrame:
    """(doc_id, fingerprint) — min-hash over w-gram windows (winnowing's
    global-min special case): robust to local edits, engine-agnostic."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    ln = F.greatest(n - (w - 1), F.lit(0))
    # zipped slices, not toks[i+j] inside the lambda — indexing an
    # expression re-runs the tokenizer per element (quadratic per doc)
    z = F.arrays_zip(
        *[F.slice(toks, j + 1, ln).alias(f"w{j}") for j in range(w)]
    )
    grams = F.when(
        n >= w,
        F.transform(
            z,
            lambda s: F.md5(
                F.concat_ws(" ", *[s[f"w{j}"] for j in range(w)])
            ),
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(grams).alias("fingerprint"),
    )


def doc_fingerprints_sql(table: str, text_col: str = "text",
                         id_col: str = "doc_id", w: int = 5) -> str:
    t = sql_tokens_expr(text_col)
    joins = " || ' ' || ".join(f"t[i+{j}]" for j in range(w))
    return f"""
WITH d AS (SELECT {id_col} AS doc_id, {t} AS t FROM {table})
SELECT doc_id,
       CASE WHEN len(t) >= {w}
       THEN list_min(list_transform(range(1, len(t) - {w} + 2),
                                    i -> md5({joins})))
       ELSE md5(array_to_string(t, ' '))
       END AS fingerprint
FROM d
"""


#: pinned sentence-boundary regex: a sentence is a maximal run of
#: non-terminators plus its trailing terminators (no lookbehind, so the
#: same pattern runs under Java regex AND RE2/DuckDB)
SENTENCE_RE = r"[^.!?]+[.!?]*"


def sentences(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sent_idx, sentence) — deterministic regex sentence split.

    M14: the reference sentence-tokenizes with nltk.sent_tokenize
    (prompt_retrieval main.py:43-44); per the north rule the model-based
    tokenizer is replaced by a pinned regex (the same T1-style lexical
    substitution as the subword tokenizer).  Narrow JVM-only pass."""
    arr = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), 0),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), arr.alias("s")
    ).select(
        "doc_id",
        F.posexplode("s").alias("sent_idx", "sentence"),
    ).select(
        "doc_id", F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
    )


def sentences_sql(table_sql: str, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    return f"""
WITH src AS ({table_sql}),
t AS (
  SELECT {id_col} AS doc_id,
         list_filter(
           list_transform(regexp_extract_all({text_col}, '{SENTENCE_RE}'),
                          x -> trim(x)),
           x -> x <> '') AS s
  FROM src
)
SELECT doc_id,
       CAST(generate_subscripts(s, 1) - 1 AS BIGINT) AS sent_idx,
       unnest(s) AS sentence
FROM t
"""


#: M13 default alias map — the shape of the reference's abbreviation
#: expansion (bridge_content_encoder picklist normalization); whole-word
#: boundaries so substrings survive.
DEFAULT_ALIASES: tuple[tuple[str, str], ...] = (
    ("db", "database"),
    ("cfg", "config"),
    ("impl", "implementation"),
    ("agg", "aggregate"),
)


def expand_aliases(df: DataFrame, col: str,
                   aliases: tuple[tuple[str, str], ...] = DEFAULT_ALIASES,
                   id_col: str = "doc_id") -> DataFrame:
    """(id, expanded) — whole-word alias/abbreviation expansion (M13) as a
    chain of \\b-bounded regexp_replace column expressions (JVM-side, one
    narrow pass; the alias dict is query-time constant)."""
    out = F.col(col)
    for short, full in aliases:
        out = F.regexp_replace(out, rf"\b{short}\b", full)
    return df.select(F.col(id_col).alias("doc_id"), out.alias("expanded"))


def expand_aliases_sql(table: str, col: str,
                       aliases: tuple[tuple[str, str], ...] = DEFAULT_ALIASES,
                       id_col: str = "doc_id") -> str:
    expr = col
    for short, full in aliases:
        expr = f"regexp_replace({expr}, '\\b{short}\\b', '{full}', 'g')"
    return f"SELECT {id_col} AS doc_id, {expr} AS expanded FROM {table}"
