"""Multi-term (dictionary-expansion) queries: prefix (``merg*``) and
fuzzy (``hashe~1``) expand against the term dictionary and retrieve
disjunctively over the expansion.

The Lucene MultiTermQuery-rewrite analog for this engine: the expansion
is a pure term-dictionary scan (term_stats — tiny next to postings),
capped at ``max_expansions`` terms per (query, pattern) under a pinned,
engine-independent order (prefix: ascending term; fuzzy: ascending
(edit distance, term) — Lucene's default rewrites cap similarly but by
an internal order; ours is deterministic so the DuckDB twin can
reproduce it exactly).  The expanded (query_id, term) set then drives
the UNCHANGED block-max WAND machinery via ``qt_override`` — scoring is
the plain BM25 sum over matched expanded terms, each with its own idf.

Scale shape: term_stats is orders of magnitude smaller than segments
(one row per distinct term); the prefix probe broadcasts the tiny
pattern table into a join against it (a dictionary scan, not a postings
scan — fuzzy even gets a HASH join on the shared first-``prefix_len``
key plus a length-difference prune before any edit-distance is
computed, both JVM-side); the capped expansion flows into the same
In() pushdown → broadcast join → per-block kernel pipeline as
hand-written queries.

Reference parity: the reference has no lexical index at all;
prefix/fuzzy search is part of this engine's fulltext surface
(SURVEY.md §2.5 graft core) alongside phrase/proximity/conjunctive
retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.index.build import IndexHandle
from instructor_embedding_spark.query.bm25 import K1, B, SCORE_DECIMALS
from instructor_embedding_spark.functions.tokenize import sql_tokens_expr

DEFAULT_MAX_EXPANSIONS = 64


def expand_prefixes(
    spark: SparkSession,
    term_stats: DataFrame,
    prefixes: list[tuple[int, str]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term): every dictionary term starting with the query's
    prefix, capped at ``max_expansions`` per (query, prefix) in ascending
    term order, distinct per query (a term matched by two of a query's
    prefixes scores once)."""
    pt = spark.createDataFrame(prefixes, "query_id long, prefix string")
    w = Window.partitionBy("query_id", "prefix").orderBy("term")
    return (
        term_stats.select("term")
        .join(F.broadcast(pt), F.col("term").startswith(F.col("prefix")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def prefix_topk(
    spark: SparkSession,
    handle: IndexHandle,
    prefixes: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k where each query is a
    list of (query_id, prefix) rows (a query may carry several prefixes);
    rank-identical to :func:`prefix_topk_sql`."""
    from instructor_embedding_spark.query.wand import wand_topk

    qt = expand_prefixes(spark, handle.term_stats(spark), prefixes,
                         max_expansions)
    return wand_topk(spark, handle, queries=None, k=k, qt_override=qt,
                     **kwargs)


from instructor_embedding_spark.functions.sqllit import (
    sql_values_pairs as _vals,
)


def _expansion_bm25_sql(
    table: str,
    expansion_ctes: str,
    k: int,
    text_col: str,
    id_col: str,
    scored_where: str = "",
) -> str:
    """Shared DuckDB BM25 body over a caller-supplied expansion:
    ``expansion_ctes`` must define CTEs ending in ``qt(query_id, term)``
    (it may reference the ``df`` dictionary CTE); ranking/rounding/
    tie-break are identical to every other retrieval twin.

    ``scored_where`` is an optional WHERE clause injected into the
    scoring aggregation (e.g. more-like-this excludes each query's own
    source documents before ranking)."""
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
{expansion_ctes},
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score_raw
  FROM qt
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  {scored_where}
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
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


def prefix_topk_sql(
    table: str,
    prefixes: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: same expansion rule (per-(query, prefix) ascending
    term cap, distinct per query) over a first-principles df dictionary,
    then the standard BM25 ranking."""
    ctes = f"""qp(query_id, prefix) AS (VALUES {_vals(prefixes)}),
expanded AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, prefix ORDER BY term
         ) AS rn
  FROM qp JOIN df ON df.term LIKE prefix || '%'
),
qt AS (
  SELECT DISTINCT query_id, term FROM expanded WHERE rn <= {max_expansions}
)"""
    return _expansion_bm25_sql(table, ctes, k, text_col, id_col)


# ------------------------------------------------------------------ fuzzy

DEFAULT_MAX_EDITS = 1
DEFAULT_PREFIX_LEN = 1


def expand_fuzzy(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term): every dictionary term within ``max_edits``
    Levenshtein edits of the query term AND sharing its first
    ``prefix_len`` characters (the Lucene FuzzyQuery prefixLength guard —
    here also the join key: Catalyst plans an equi hash join on the
    shared prefix, then prunes by length difference before the edit-
    distance kernel runs, all JVM-side).  Capped at ``max_expansions``
    per (query, qterm) in ascending (distance, term) order — nearest
    variants survive the cap first — distinct per query.

    ASCII contract: Spark's ``levenshtein`` counts UTF-16 code units,
    DuckDB's counts utf8proc graphemes; identical for ASCII-ish text
    (the tokenizer's output alphabet), same caveat as fuzzy.py's
    LCS-ratio twin."""
    qt = spark.createDataFrame(queries, "query_id long, qterm string")
    w = Window.partitionBy("query_id", "qterm").orderBy("dist", "term")
    return (
        term_stats.select("term")
        .join(
            F.broadcast(qt),
            F.substring("term", 1, prefix_len)
            == F.substring("qterm", 1, prefix_len),
        )
        .filter(F.abs(F.length("term") - F.length("qterm")) <= max_edits)
        # threshold form: returns -1 when distance exceeds max_edits and
        # bails out of the DP early — the dictionary-scan fast path
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.col("qterm"), max_edits)
        )
        .filter(F.col("dist") >= 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def fuzzy_topk(
    spark: SparkSession,
    handle: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k where each query is a
    (query_id, term) row retrieved through its fuzzy expansion;
    rank-identical to :func:`fuzzy_topk_sql`."""
    from instructor_embedding_spark.query.wand import wand_topk

    qt = expand_fuzzy(spark, handle.term_stats(spark), queries, max_edits,
                      prefix_len, max_expansions)
    return wand_topk(spark, handle, queries=None, k=k, qt_override=qt,
                     **kwargs)


def fuzzy_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_edits: int = DEFAULT_MAX_EDITS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: same expansion rule (shared first-``prefix_len``
    chars, length-difference prune, levenshtein <= max_edits, per-(query,
    qterm) (distance, term) cap, distinct per query) over a first-
    principles df dictionary, then the standard BM25 ranking."""
    ctes = f"""qp(query_id, qterm) AS (VALUES {_vals(queries)}),
expanded AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, qterm
           ORDER BY levenshtein(df.term, qterm), term
         ) AS rn
  FROM qp JOIN df
    ON substr(df.term, 1, {prefix_len}) = substr(qterm, 1, {prefix_len})
   AND abs(length(df.term) - length(qterm)) <= {max_edits}
   AND levenshtein(df.term, qterm) <= {max_edits}
),
qt AS (
  SELECT DISTINCT query_id, term FROM expanded WHERE rn <= {max_expansions}
)"""
    return _expansion_bm25_sql(table, ctes, k, text_col, id_col)


# --------------------------------------------------------------- wildcard


def glob_to_like(pattern: str) -> str:
    """Translate a Lucene-style wildcard pattern (``*`` = any run,
    ``?`` = any single char) into a SQL LIKE pattern with ``\\`` as the
    escape char — identical semantics in Spark (LIKE's default escape)
    and DuckDB (``ESCAPE '\\'``).  Literal ``%``/``_``/``\\`` in the
    pattern are escaped so they match themselves."""
    out = []
    for ch in pattern:
        if ch in ("\\", "%", "_"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(ch)
    return "".join(out)


def expand_wildcards(
    spark: SparkSession,
    term_stats: DataFrame,
    patterns: list[tuple[int, str]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term): every dictionary term matching the glob pattern
    (Lucene WildcardQuery), capped at ``max_expansions`` per (query,
    pattern) in ascending term order, distinct per query.

    A leading wildcard is rejected (the Elasticsearch
    ``allow_leading_wildcard: false`` guard): with a literal first
    character the dictionary probe stays prefix-prunable; ``*foo`` would
    force a full-vocabulary pattern scan per query at any scale."""
    for _, p in patterns:
        if not p or p[0] in "*?":
            raise ValueError(
                f"leading wildcard not allowed (got {p!r}); anchor the "
                "pattern with at least one literal character"
            )
    wp = spark.createDataFrame(
        [(qid, glob_to_like(p)) for qid, p in patterns],
        "query_id long, likep string",
    )
    w = Window.partitionBy("query_id", "likep").orderBy("term")
    return (
        term_stats.select("term")
        .join(F.broadcast(wp), F.expr("term LIKE likep"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def wildcard_topk(
    spark: SparkSession,
    handle: IndexHandle,
    patterns: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k over the wildcard
    expansion (the Lucene top-terms rewrite: each expanded term scores
    with its own idf); rank-identical to :func:`wildcard_topk_sql`."""
    from instructor_embedding_spark.query.wand import wand_topk

    qt = expand_wildcards(spark, handle.term_stats(spark), patterns,
                          max_expansions)
    return wand_topk(spark, handle, queries=None, k=k, qt_override=qt,
                     **kwargs)


def wildcard_topk_sql(
    table: str,
    patterns: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: the same LIKE-translated expansion (ascending-term
    cap, distinct per query) over a first-principles df dictionary, then
    the standard BM25 ranking."""
    likes = [(qid, glob_to_like(p)) for qid, p in patterns]
    ctes = f"""wp(query_id, likep) AS (VALUES {_vals(likes)}),
expanded AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, likep ORDER BY term
         ) AS rn
  FROM wp JOIN df ON df.term LIKE likep ESCAPE '\\'
),
qt AS (
  SELECT DISTINCT query_id, term FROM expanded WHERE rn <= {max_expansions}
)"""
    return _expansion_bm25_sql(table, ctes, k, text_col, id_col)


# -------------------------------------------------- regexp


def validate_regexp(pattern: str) -> str:
    """Validate a Lucene-RegexpQuery-style pattern against the Java/RE2
    COMMON subset, so the Spark (java.util.regex) and DuckDB (RE2) sides
    cannot disagree: lookaround, backreferences, and possessive
    quantifiers are rejected (RE2 lacks all three; a pattern using them
    would silently diverge), as is an empty pattern.  Literals, ``.``,
    classes (``[...]``, ``\\d \\w \\s`` + negations), alternation,
    grouping (incl. ``(?:``), anchors, and greedy/lazy quantifiers all
    behave identically in both engines.  Returns the pattern unchanged."""
    import re as _re

    if not pattern:
        raise ValueError("empty regexp pattern")
    for look in ("(?=", "(?!", "(?<"):
        if look in pattern:
            raise ValueError(
                f"lookaround {look!r} not in the Java/RE2 common subset "
                f"(pattern {pattern!r})"
            )
    esc = False
    prev_quant = False  # previous char ended a quantifier
    for ch in pattern:
        if esc:
            if ch.isdigit() and ch != "0":
                raise ValueError(
                    f"backreference \\{ch} not in the Java/RE2 common "
                    f"subset (pattern {pattern!r})"
                )
            esc = False
            prev_quant = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == "+" and prev_quant:
            raise ValueError(
                f"possessive quantifier not in the Java/RE2 common "
                f"subset (pattern {pattern!r})"
            )
        prev_quant = ch in "*+?}"
    try:
        _re.compile(pattern)
    except _re.error as e:
        raise ValueError(f"invalid regexp {pattern!r}: {e}") from e
    return pattern


def expand_regexp(
    spark: SparkSession,
    term_stats: DataFrame,
    patterns: list[tuple[int, str]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, term): every dictionary term the pattern FULLY matches
    (Lucene RegexpQuery anchors both ends), capped at ``max_expansions``
    per (query, pattern) in ascending term order, distinct per query.

    Both engines evaluate the SAME anchored string ``^(?:p)$`` — Spark
    via RLIKE, DuckDB via regexp_matches — so full-match semantics never
    depend on a dialect's default anchoring.  Unlike the wildcard query
    there is no leading-literal guard: a regexp IS a full dictionary
    scan (Lucene walks the term dictionary with the pattern automaton);
    the documented |dictionary| << |postings| cost model applies."""
    for _, p in patterns:
        validate_regexp(p)
    rp = spark.createDataFrame(
        [(qid, f"^(?:{p})$") for qid, p in patterns],
        "query_id long, rx string",
    )
    w = Window.partitionBy("query_id", "rx").orderBy("term")
    return (
        term_stats.select("term")
        .join(F.broadcast(rp), F.expr("term RLIKE rx"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_expansions)
        .select("query_id", "term")
        .distinct()
    )


def regexp_topk(
    spark: SparkSession,
    handle: IndexHandle,
    patterns: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    **kwargs,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k over the regexp
    expansion (the Lucene top-terms rewrite: each expanded term scores
    with its own idf); rank-identical to :func:`regexp_topk_sql`."""
    from instructor_embedding_spark.query.wand import wand_topk

    qt = expand_regexp(spark, handle.term_stats(spark), patterns,
                       max_expansions)
    return wand_topk(spark, handle, queries=None, k=k, qt_override=qt,
                     **kwargs)


def regexp_topk_sql(
    table: str,
    patterns: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: the same anchored full-match expansion (ascending-
    term cap, distinct per query) over a first-principles df dictionary,
    then the standard BM25 ranking."""
    for _, p in patterns:
        validate_regexp(p)
    anchored = [(qid, f"^(?:{p})$") for qid, p in patterns]
    ctes = f"""rp(query_id, rx) AS (VALUES {_vals(anchored)}),
expanded AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, rx ORDER BY term
         ) AS rn
  FROM rp JOIN df ON regexp_matches(df.term, rx)
),
qt AS (
  SELECT DISTINCT query_id, term FROM expanded WHERE rn <= {max_expansions}
)"""
    return _expansion_bm25_sql(table, ctes, k, text_col, id_col)


# -------------------------------------------------- match_phrase_prefix


def match_phrase_prefix_topk(
    spark: SparkSession,
    handle: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(query_id, rank, doc_id, matches) — ES match_phrase_prefix (the
    search-as-you-type query): the query's LAST token is a prefix; every
    dictionary expansion of it (ascending-term cap, the pinned Lucene
    MultiTermQuery rewrite) completes the phrase, a doc matches when ANY
    completed phrase occurs adjacently, and ``matches`` sums occurrence
    counts across completions (the phrase-tf analog).

    The expansion is collected driver-side to synthesize the completed
    phrases for the positions kernel — bounded by |queries| ×
    max_expansions rows, the same interactive contract as WAND's
    query-term pushdown; counting then reuses the UNCHANGED phrase
    kernel (In() pushdown, broadcast, Arrow groups).

    The whole query text — prefix token included — passes through the
    pinned analyzer, so a prefix that is itself a stopword tokenizes
    away (the preceding token becomes the prefix), exactly as an ES
    analyzer with a stop filter behaves."""
    synth, back = mpp_expansion_plan(
        spark, handle, queries, max_expansions
    )
    if not synth:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, matches long"
        )
    from instructor_embedding_spark.query.phrase import (
        positions_family_candidates,
    )

    counts = positions_family_candidates(
        spark, handle.positions(spark),
        [{"kind": "phrase", "queries": synth}],
    ).select("phrase_id", "doc_id", "matches")
    return mpp_rank_from_counts(spark, counts, back, k)


#: synthetic completed-phrase ids start here — far above any caller's
#: query-id space, so mpp specs can share one fused candidates pipeline
#: with the other positions families (phrase_topk entry)
MPP_SYNTH_BASE = 1_000_000


def mpp_expansion_plan(
    spark: SparkSession,
    handle: IndexHandle,
    queries: list[tuple[int, str]],
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> tuple[list[tuple[int, str]], dict[int, int]]:
    """The driver-side half of match_phrase_prefix: tokenize the
    queries, expand each trailing prefix against the dictionary
    (bounded collect, ascending-term Lucene rewrite), and synthesize
    the completed phrases.  Returns ``(synth, back)`` — the
    (synthetic_phrase_id, completed phrase text) list for the phrase
    counting kernel and the synthetic-id → query_id map."""
    from instructor_embedding_spark.functions.tokenize import tokenize_py

    stems: dict[int, list[str]] = {}
    prefixes: list[tuple[int, str]] = []
    for qid, text in queries:
        toks = tokenize_py(text)
        if not toks:
            continue
        stems[qid] = toks[:-1]
        prefixes.append((qid, toks[-1]))
    if not prefixes:
        return [], {}
    exp = expand_prefixes(
        spark, handle.term_stats(spark), prefixes, max_expansions
    ).collect()
    synth: list[tuple[int, str]] = []
    back: dict[int, int] = {}
    for i, r in enumerate(
        sorted((r["query_id"], r["term"]) for r in exp)
    ):
        qid, term = r
        pid = MPP_SYNTH_BASE + i
        synth.append((pid, " ".join(stems[qid] + [term])))
        back[pid] = qid
    return synth, back


def mpp_rank_from_counts(
    spark: SparkSession,
    counts: DataFrame,
    back: dict[int, int],
    k: int,
) -> DataFrame:
    """The ranking tail of match_phrase_prefix over per-completed-phrase
    occurrence counts (phrase_id, doc_id, matches): map synthetic ids
    back to their query, sum occurrence counts across completions per
    (query, doc), rank by (matches DESC, doc_id ASC), cut at k."""
    bmap = spark.createDataFrame(
        list(back.items()), "phrase_id long, query_id long"
    )
    agg = (
        counts.join(F.broadcast(bmap), "phrase_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("matches").alias("matches"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("matches").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "matches")
    )


def match_phrase_prefix_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the same ascending-term-capped expansion derived
    from a first-principles df dictionary, each completion checked by
    the list_filter adjacency scan, occurrence counts summed per doc."""
    from instructor_embedding_spark.functions.tokenize import tokenize_py

    branches = []
    for qid, text in queries:
        toks = tokenize_py(text)
        if not toks:
            continue
        stem, prefix = toks[:-1], toks[-1]
        m = len(toks)
        stem_conds = " AND ".join(
            f"t[i + {j}] = '{stem[j]}'" for j in range(m - 1)
        )
        cond = (
            (stem_conds + " AND " if stem_conds else "")
            + f"t[i + {m - 1}] = e.term"
        )
        branches.append(f"""SELECT {qid} AS query_id, doc_id,
       CAST(sum(cnt) AS BIGINT) AS matches FROM (
  SELECT toks.doc_id,
         len(list_filter(range(1, len(t) - {m} + 2), i -> {cond})) AS cnt
  FROM toks CROSS JOIN (
    SELECT term FROM expanded
    WHERE query_id = {qid} AND rn <= {max_expansions}
  ) e
) GROUP BY doc_id HAVING sum(cnt) > 0""")
    pvals = ", ".join(
        "({}, '{}')".format(qid, tokenize_py(text)[-1].replace("'", "''"))
        for qid, text in queries
        if tokenize_py(text)
    )
    union = " UNION ALL ".join(branches)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {sql_tokens_expr(text_col)} AS t FROM {table}
),
tfd AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  GROUP BY doc_id, term
),
dfd AS (SELECT term FROM tfd GROUP BY term),
pv(query_id, prefix) AS (VALUES {pvals}),
expanded AS (
  SELECT pv.query_id, dfd.term,
         row_number() OVER (
           PARTITION BY pv.query_id, pv.prefix ORDER BY dfd.term
         ) AS rn
  FROM pv JOIN dfd ON starts_with(dfd.term, pv.prefix)
),
counts AS ({union}),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY matches DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id, matches
  FROM counts
)
SELECT query_id, rank, doc_id, matches FROM ranked WHERE rank <= {k}
"""
