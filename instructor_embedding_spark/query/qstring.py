"""Query-string search: a Lucene ``simple_query_string`` analog parsed
into the engine's existing retrieval primitives.

One line of user syntax compiles onto the machinery every other entry
already gates — BM25 OR scoring (bm25.py), conjunctive MUST counting
(bm25_topk ``require_all``'s counting trick), MUST_NOT exclusion
(wand.py's prohibited-term mask, here as an anti-join), dictionary
prefix/fuzzy expansion (prefix.py), and exact-adjacency phrase matching
(phrase.py's window rule, here as a pure column expression so the
brute-force path needs no positions index).

Supported syntax (the ES ``simple_query_string`` flag set, flat — no
parentheses, no ``|``, no field prefixes; those raise ``ValueError`` so
a silently-wrong parse can never reach the gate):

- ``term`` — SHOULD: optional, contributes BM25 score.
- ``+term`` — MUST: doc must contain it (still scores).
- ``-term`` — MUST_NOT: doc is excluded if it contains it.
- ``"exact phrase"`` — doc must contain the tokens adjacently
  (phrase terms also score as individual terms — pinned engine
  semantics, same convention as rescore_topk's primary pass).
- ``stem*`` — prefix: expands against the term dictionary (ascending
  term, capped) into SHOULD terms, Lucene MultiTermQuery rewrite.
- ``term~`` / ``term~1`` / ``term~2`` — fuzzy: Levenshtein expansion
  into SHOULD terms (ascending (distance, term), capped).

Pinned semantics (shared verbatim by the DuckDB twin):

1. Every clause's text runs through the ONE pinned analyzer
   (functions.tokenize); a clause whose analysis is empty (stopword,
   too short) is dropped silently, Lucene-style.
2. A doc ranks iff it matches ALL must terms, NO must_not term, ALL
   phrases, and has at least one scoring-term match (automatic — the
   score base inner-joins).  A query with only must_not clauses
   returns nothing.
3. score = BM25 sum over DISTINCT matched scoring terms (should ∪ must
   ∪ phrase terms ∪ expansions), k1/b/idf/rounding identical to every
   other retrieval twin; ties break (round(score, 6) DESC, doc_id ASC).

Scale shape: the literal + expanded (query_id, term) table broadcasts
into the tf join exactly like every other retrieval entry; MUST
counting and MUST_NOT exclusion are per-(query, doc) aggregates over
the SAME tf rows (no new shuffle key); the phrase check is a linear
token-array scan per (doc, phrase) in whole-stage codegen — no UDF, no
positions shuffle.  An index-served variant is the same compile
targeting wand_topk's ``qt_override`` plus the positions index for
phrases (rescore_topk already gates that machinery); the brute-force
form here is the oracle-matched baseline.

Reference parity: the reference exposes no query language at all
(queries are natural-language strings embedded wholesale,
INSTRUCTOR.encode / AbsTaskRetrieval.py); the query-string surface is
part of this engine's fulltext graft (SURVEY.md §2.5) like
prefix/fuzzy/phrase retrieval.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.sqllit import sql_values_pairs
from instructor_embedding_spark.functions.tokenize import (
    sql_tokens_expr,
    tokenize_py,
)
from instructor_embedding_spark.query.bm25 import (
    B,
    K1,
    SCORE_DECIMALS,
    bm25_score_col,
    corpus_stats,
    term_stats,
    tf_table,
    tokenized,
)
from instructor_embedding_spark.query.prefix import (
    DEFAULT_MAX_EXPANSIONS,
    DEFAULT_PREFIX_LEN,
    expand_fuzzy,
    expand_prefixes,
)

__all__ = [
    "QuerySpec",
    "parse_query_string",
    "qstring_topk",
    "qstring_topk_sql",
]

#: fuzzy edits when the clause is bare ``term~`` (explicit ``~1``/``~2``
#: override; >2 raises — the threshold-DP dictionary scan is pinned to
#: Lucene's edit ceiling).
DEFAULT_FUZZY_EDITS = 1
MAX_FUZZY_EDITS = 2

#: syntax this v1 deliberately rejects rather than mis-parses
_UNSUPPORTED = set("()|:")


@dataclass
class QuerySpec:
    """One parsed query string, all clause text already analyzed."""

    should: list[str] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    #: each phrase is the analyzed token list, len >= 1
    phrases: list[list[str]] = field(default_factory=list)
    #: raw lowered stems (the dictionary LIKE probe side)
    prefixes: list[str] = field(default_factory=list)
    #: (analyzed term, max_edits)
    fuzzies: list[tuple[str, int]] = field(default_factory=list)

    @property
    def scoring_terms(self) -> list[str]:
        """Literal (non-expansion) terms that enter the BM25 sum."""
        seen: set[str] = set()
        out: list[str] = []
        for t in (
            self.should + self.must + [w for p in self.phrases for w in p]
        ):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out


def _one_token(raw: str, clause: str) -> str | None:
    toks = tokenize_py(raw)
    if not toks:
        return None
    if len(toks) > 1:
        raise ValueError(
            f"{clause} clause {raw!r} analyzes to multiple tokens "
            f"{toks}; use one {clause} clause per token"
        )
    return toks[0]


def parse_query_string(q: str) -> QuerySpec:
    """Parse one query string; raises ``ValueError`` on syntax this
    dialect does not define (unbalanced quotes, parens, ``|``, field
    prefixes, phrase slop, negated phrases, edits > 2)."""
    spec = QuerySpec()
    i, n = 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        neg = must = False
        if q[i] in "+-":
            must, neg = q[i] == "+", q[i] == "-"
            i += 1
            if i >= n or q[i].isspace():
                raise ValueError(f"dangling {'+-'[neg]!s} operator")
        if q[i] == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unbalanced quote in {q!r}")
            body, i = q[i + 1 : j], j + 1
            if i < n and q[i] == "~":
                raise ValueError("phrase slop (\"...\"~n) not supported; "
                                 "use proximity_topk")
            if neg:
                raise ValueError("negated phrase not supported")
            toks = tokenize_py(body)
            if toks:
                spec.phrases.append(toks)
            continue
        j = i
        while j < n and not q[j].isspace():
            j += 1
        raw, i = q[i:j], j
        bad = _UNSUPPORTED.intersection(raw)
        if bad:
            raise ValueError(
                f"unsupported syntax {sorted(bad)} in clause {raw!r}"
            )
        m = re.fullmatch(r"(.+?)~(\d*)", raw)
        if m:
            if neg or must:
                raise ValueError("fuzzy clause cannot carry +/-")
            edits = int(m.group(2)) if m.group(2) else DEFAULT_FUZZY_EDITS
            if not 1 <= edits <= MAX_FUZZY_EDITS:
                raise ValueError(f"fuzzy edits must be 1..{MAX_FUZZY_EDITS}")
            t = _one_token(m.group(1), "fuzzy")
            if t:
                spec.fuzzies.append((t, edits))
            continue
        if raw.endswith("*"):
            if "*" in raw[:-1]:
                raise ValueError(
                    f"only a single trailing * is supported ({raw!r}); "
                    "use wildcard_topk for general globs"
                )
            if neg or must:
                raise ValueError("prefix clause cannot carry +/-")
            t = _one_token(raw[:-1], "prefix")
            if t:
                spec.prefixes.append(t)
            continue
        if "*" in raw or "~" in raw:
            raise ValueError(f"unsupported wildcard position in {raw!r}")
        target = spec.must_not if neg else spec.must if must else spec.should
        target.extend(tokenize_py(raw))
    return spec


# ---------------------------------------------------------------- Spark


def _phrase_pred(tokens_col, terms: list[str]):
    """True iff the token array contains ``terms`` adjacently — the same
    window rule as phrase.py's kernel, as a codegen-able expression."""
    m = len(terms)
    return F.when(
        F.size(tokens_col) >= m,
        F.exists(
            F.sequence(F.lit(1), F.size(tokens_col) - m + 1),
            lambda i: reduce(
                lambda a, b: a & b,
                [
                    F.get(tokens_col, i + j - 1) == F.lit(terms[j])
                    for j in range(m)
                ],
            ),
        ),
    ).otherwise(F.lit(False))


def qstring_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — brute-force query-string top-k,
    rank-identical to :func:`qstring_topk_sql`."""
    specs = {qid: parse_query_string(s) for qid, s in queries}

    toks = tokenized(docs, text_col, id_col)
    stats = corpus_stats(toks)
    tf = tf_table(toks)
    ts = term_stats(tf, stats)

    lit_pairs = [
        (qid, t) for qid, sp in specs.items() for t in sp.scoring_terms
    ]
    qt_parts = []
    if lit_pairs:
        qt_parts.append(
            spark.createDataFrame(lit_pairs, "query_id long, term string")
        )
    pref_pairs = [
        (qid, p) for qid, sp in specs.items() for p in sp.prefixes
    ]
    if pref_pairs:
        qt_parts.append(
            expand_prefixes(spark, ts, pref_pairs, max_expansions)
        )
    fuzzy_by_edits: dict[int, list[tuple[int, str]]] = {}
    for qid, sp in specs.items():
        for t, e in sp.fuzzies:
            fuzzy_by_edits.setdefault(e, []).append((qid, t))
    for e, pairs in sorted(fuzzy_by_edits.items()):
        qt_parts.append(
            expand_fuzzy(spark, ts, pairs, max_edits=e,
                         prefix_len=prefix_len,
                         max_expansions=max_expansions)
        )
    if not qt_parts:
        return spark.createDataFrame(
            [], "query_id long, rank long, doc_id long, score double"
        )
    qt = qt_parts[0]
    for p in qt_parts[1:]:
        qt = qt.unionByName(p)
    qt = qt.distinct()

    contrib = bm25_score_col(
        F.col("tf"), F.col("dl"), F.col("idf"), stats.avgdl
    )
    scored = (
        tf.join(ts.select("term", "idf"), "term")
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_raw"))
    )

    must_pairs = sorted(
        {(qid, t) for qid, sp in specs.items() for t in sp.must}
    )
    if must_pairs:
        mt = spark.createDataFrame(
            must_pairs, "query_id long, term string"
        )
        n_must = mt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_must")
        )
        # tf is unique per (doc, term) and mt distinct per (query, term),
        # so count(*) IS the matched distinct-must count (the same
        # counting trick bm25_topk's require_all pins)
        mc = (
            tf.join(F.broadcast(mt), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.count(F.lit(1)).alias("mc"))
        )
        scored = (
            scored.join(mc, ["query_id", "doc_id"], "left")
            .join(F.broadcast(n_must), "query_id", "left")
            .filter(
                F.col("n_must").isNull()
                | (F.coalesce(F.col("mc"), F.lit(0)) == F.col("n_must"))
            )
            .drop("mc", "n_must")
        )

    not_pairs = sorted(
        {(qid, t) for qid, sp in specs.items() for t in sp.must_not}
    )
    if not_pairs:
        nt = spark.createDataFrame(not_pairs, "query_id long, term string")
        bad = (
            tf.join(F.broadcast(nt), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        scored = scored.join(bad, ["query_id", "doc_id"], "left_anti")

    ph_clauses = [
        (qid, p) for qid, sp in specs.items() for p in sp.phrases
    ]
    if ph_clauses:
        branches = [
            toks.filter(_phrase_pred(F.col("tokens"), p)).select(
                F.lit(qid).cast("long").alias("query_id"), "doc_id"
            )
            for qid, p in ph_clauses
        ]
        phm = branches[0]
        for b in branches[1:]:
            phm = phm.unionByName(b)
        phc = phm.groupBy("query_id", "doc_id").agg(
            F.count(F.lit(1)).alias("phc")
        )
        nph = spark.createDataFrame(
            [(qid, len(sp.phrases)) for qid, sp in specs.items()
             if sp.phrases],
            "query_id long, nph long",
        )
        scored = (
            scored.join(phc, ["query_id", "doc_id"], "left")
            .join(F.broadcast(nph), "query_id", "left")
            .filter(
                F.col("nph").isNull()
                | (F.coalesce(F.col("phc"), F.lit(0)) == F.col("nph"))
            )
            .drop("phc", "nph")
        )

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score_raw"), SCORE_DECIMALS).desc(),
        F.col("doc_id").asc(),
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


# --------------------------------------------------------------- DuckDB


def qstring_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    prefix_len: int = DEFAULT_PREFIX_LEN,
) -> str:
    """First-principles oracle: same parse (this module's parser runs
    driver-side for both engines), same expansion caps, same filters,
    same BM25/rounding/tie-break."""
    specs = {qid: parse_query_string(s) for qid, s in queries}

    lit_pairs = [
        (qid, t) for qid, sp in specs.items() for t in sp.scoring_terms
    ]
    pref_pairs = [(qid, p) for qid, sp in specs.items() for p in sp.prefixes]
    fuzzy_rows = [
        (qid, t, e) for qid, sp in specs.items() for t, e in sp.fuzzies
    ]
    must_pairs = sorted(
        {(qid, t) for qid, sp in specs.items() for t in sp.must}
    )
    not_pairs = sorted(
        {(qid, t) for qid, sp in specs.items() for t in sp.must_not}
    )
    ph_clauses = [(qid, p) for qid, sp in specs.items() for p in sp.phrases]

    qt_unions = []
    ctes = []
    if lit_pairs:
        ctes.append(
            f"lit_qt(query_id, term) AS (VALUES {sql_values_pairs(lit_pairs)})"
        )
        qt_unions.append("SELECT query_id, term FROM lit_qt")
    if pref_pairs:
        ctes.append(f"""qp(query_id, prefix) AS (VALUES {sql_values_pairs(pref_pairs)}),
pexp AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, prefix ORDER BY term
         ) AS rn
  FROM qp JOIN dict ON dict.term LIKE prefix || '%'
)""")
        qt_unions.append(
            f"SELECT query_id, term FROM pexp WHERE rn <= {max_expansions}"
        )
    if fuzzy_rows:
        fvals = ", ".join(
            "({}, '{}', {})".format(qid, t.replace("'", "''"), e)
            for qid, t, e in fuzzy_rows
        )
        ctes.append(f"""qf(query_id, qterm, edits) AS (VALUES {fvals}),
fexp AS (
  SELECT query_id, term,
         row_number() OVER (
           PARTITION BY query_id, qterm
           ORDER BY levenshtein(dict.term, qterm), term
         ) AS rn
  FROM qf JOIN dict
    ON substr(dict.term, 1, {prefix_len}) = substr(qterm, 1, {prefix_len})
   AND abs(length(dict.term) - length(qterm)) <= edits
   AND levenshtein(dict.term, qterm) <= edits
)""")
        qt_unions.append(
            f"SELECT query_id, term FROM fexp WHERE rn <= {max_expansions}"
        )
    if not qt_unions:
        return (
            "SELECT CAST(NULL AS BIGINT) AS query_id, "
            "CAST(NULL AS BIGINT) AS rank, CAST(NULL AS BIGINT) AS doc_id, "
            "CAST(NULL AS DOUBLE) AS score WHERE FALSE"
        )
    ctes.append(
        "qt AS (SELECT DISTINCT query_id, term FROM ("
        + " UNION ALL ".join(qt_unions)
        + "))"
    )

    joins, conds = [], []
    if must_pairs:
        ctes.append(
            f"mt(query_id, term) AS (VALUES {sql_values_pairs(must_pairs)})"
        )
        ctes.append(
            "n_must AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nm "
            "FROM mt GROUP BY query_id)"
        )
        ctes.append(
            "must_cnt AS (SELECT mt.query_id, tf.doc_id, "
            "CAST(count(*) AS BIGINT) AS mc "
            "FROM mt JOIN tf USING (term) GROUP BY mt.query_id, tf.doc_id)"
        )
        joins.append("LEFT JOIN n_must ON s.query_id = n_must.query_id")
        joins.append(
            "LEFT JOIN must_cnt ON s.query_id = must_cnt.query_id "
            "AND s.doc_id = must_cnt.doc_id"
        )
        conds.append(
            "(n_must.nm IS NULL OR coalesce(must_cnt.mc, 0) = n_must.nm)"
        )
    if not_pairs:
        ctes.append(
            f"nt(query_id, term) AS (VALUES {sql_values_pairs(not_pairs)})"
        )
        ctes.append(
            "bad AS (SELECT DISTINCT nt.query_id, tf.doc_id "
            "FROM nt JOIN tf USING (term))"
        )
        joins.append(
            "LEFT JOIN bad ON s.query_id = bad.query_id "
            "AND s.doc_id = bad.doc_id"
        )
        conds.append("bad.query_id IS NULL")
    if ph_clauses:
        branches = []
        for qid, terms in ph_clauses:
            m = len(terms)
            cond = " AND ".join(
                "tokens[i + {}] = '{}'".format(j, t.replace("'", "''"))
                for j, t in enumerate(terms)
            )
            branches.append(
                f"SELECT {qid} AS query_id, doc_id FROM toks "
                f"WHERE len(list_filter(range(1, len(tokens) - {m} + 2), "
                f"i -> {cond})) > 0"
            )
        ctes.append("phm AS (" + " UNION ALL ".join(branches) + ")")
        ctes.append(
            "phc AS (SELECT query_id, doc_id, "
            "CAST(count(*) AS BIGINT) AS pc "
            "FROM phm GROUP BY query_id, doc_id)"
        )
        nph_vals = ", ".join(
            f"({qid}, {len(sp.phrases)})"
            for qid, sp in specs.items() if sp.phrases
        )
        ctes.append(f"nph(query_id, np) AS (VALUES {nph_vals})")
        joins.append("LEFT JOIN nph ON s.query_id = nph.query_id")
        joins.append(
            "LEFT JOIN phc ON s.query_id = phc.query_id "
            "AND s.doc_id = phc.doc_id"
        )
        conds.append("(nph.np IS NULL OR coalesce(phc.pc, 0) = nph.np)")

    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    cte_block = ",\n".join(ctes)
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
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
{cte_block},
scored AS (
  SELECT qt.query_id, tf.doc_id,
         sum(
           ln(1 + (stats.n - dict.df + 0.5) / (dict.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score_raw
  FROM qt
  JOIN tf USING (term)
  JOIN dict USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.doc_id
),
filtered AS (
  SELECT s.query_id, s.doc_id, s.score_raw
  FROM scored s
  {" ".join(joins)}
  {where}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score_raw, {SCORE_DECIMALS}) DESC, doc_id ASC
         ) AS BIGINT) AS rank,
         doc_id,
         round(score_raw, {SCORE_DECIMALS}) AS score
  FROM filtered
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""
