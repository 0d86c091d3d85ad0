"""Fuzzy string matching against a bounded picklist (M16/J7-lite).

Reference: bridge_content_encoder.py:112-189 (get_matched_entries — rank
picklist values by a difflib-style ratio against the query) and :215-250
(fuzzy longest-match threshold rules).  rapidfuzz is unavailable in this
environment; stdlib ``difflib.SequenceMatcher.ratio`` is the reference's
own fallback scorer.  TWO scorers are provided:

- :func:`fuzzy_match_topk` — reference-faithful difflib ratio
  (Ratcliff-Obershelp: 2·M/(|a|+|b|) over recursively longest matching
  blocks).  No SQL engine implements that recursion, so this path is
  pytest-golden-verified (tests/test_fuzzy.py), not oracle-gated.
- :func:`fuzzy_match_topk_lcs` — pinned divergence **D6** (SURVEY.md §8):
  the same rank/threshold/tie rules with the LCS-ratio scorer
  2·LCS(lower(a), lower(b)) / (|a|+|b|) over CHARACTERS.  LCS ≥ M always
  holds and the two ratios coincide on the common no-transposition case;
  crucially the LCS is an exact integer both engines reproduce
  (metrics.generation.lcs_cte_sql), so this variant has a full DuckDB
  twin (:func:`fuzzy_match_topk_lcs_sql`) and carries the driver gate.

Shared semantics: keep score ≥ threshold; rank by (exact score DESC,
value ASC); top-k per query; reported score rounded to 6dp.

Distributed shape: the picklist is collected once (picklists are small by
construction — column value dictionaries, not corpora) and closed over by
an Arrow-batched ``mapInPandas``; queries stream through partitions, so the
operator scales with the query table, never materializing a cross join.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.rounding import r6 as _r6

OUT_SCHEMA = "query_id long, rank long, value string, score double"

#: Hard cap on the collected picklist: the operator's contract is a
#: column-value dictionary (bridge_content_encoder picklists are a few
#: hundred values), not a corpus — failing fast beats OOMing the driver.
MAX_PICKLIST = 100_000


def _collect_picklist(candidates: DataFrame, c_col: str,
                      max_picklist: int) -> list[str]:
    """Distinct non-null picklist values, sorted; raises past the cap.

    A cheap limit(max+1) probe bounds the check BEFORE the collect; the
    probe filters NULLs like the collect does, so a null row can't
    spuriously tip an at-cap picklist over the limit."""
    n_probe = (
        candidates.select(c_col)
        .filter(F.col(c_col).isNotNull())
        .distinct()
        .limit(max_picklist + 1)
        .count()
    )
    if n_probe > max_picklist:
        raise ValueError(
            f"picklist exceeds max_picklist={max_picklist} distinct "
            f"values — fuzzy matching is for column-value dictionaries; "
            f"use the LSH/ngram dedup family for corpus-scale matching"
        )
    return sorted(
        r[c_col]
        for r in candidates.select(c_col).distinct().collect()
        if r[c_col] is not None
    )


def fuzzy_match_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    threshold: float = 0.3,
    q_col: str = "query_text",
    c_col: str = "value",
    max_picklist: int = MAX_PICKLIST,
) -> DataFrame:
    """(query_id, rank, value, score) — best fuzzy picklist matches.

    ``queries``: (query_id, q_col); ``candidates``: any DataFrame with a
    string c_col (distinct-ed and collected — must be picklist-sized;
    > ``max_picklist`` distinct values raises rather than collecting).
    Null query_ids / query texts are skipped, not errors."""
    values = _collect_picklist(candidates, c_col, max_picklist)
    src = queries.select("query_id", F.col(q_col).alias("q"))

    def gen(batches):
        for pdf in batches:
            out = {"query_id": [], "rank": [], "value": [], "score": []}
            for qid, q in zip(pdf["query_id"], pdf["q"]):
                if pd.isna(qid):
                    continue  # unkeyed row: skip, don't fail the stage
                ql = q.lower() if isinstance(q, str) else ""
                scored = []
                for v in values:
                    s = round(
                        SequenceMatcher(None, ql, v.lower()).ratio(), 6
                    )
                    if s >= threshold:
                        scored.append((s, v))
                scored.sort(key=lambda t: (-t[0], t[1]))
                for i, (s, v) in enumerate(scored[:k], start=1):
                    out["query_id"].append(int(qid))
                    out["rank"].append(i)
                    out["value"].append(v)
                    out["score"].append(s)
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=OUT_SCHEMA)


def fuzzy_match_topk_lcs(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    threshold: float = 0.3,
    q_col: str = "query_text",
    c_col: str = "value",
    max_picklist: int = MAX_PICKLIST,
) -> DataFrame:
    """(query_id, rank, value, score) — LCS-ratio picklist matches (D6).

    score = 2·LCS(lower(q), lower(v)) / (|q|+|v|) over characters; both
    strings empty ⇒ score 0 (below any positive threshold).  Ranking
    compares the EXACT double 2·lcs/(la+lb) — integer inputs through one
    IEEE division, so Spark and the DuckDB twin order identically; only
    the reported score is rounded.  Same distributed shape as
    :func:`fuzzy_match_topk` (collected picklist, mapInPandas over the
    query stream).

    Contract shared with the SQL twin: query_id is a unique key (the
    twin ranks per query_id, so duplicate ids would merge into one
    rank partition there but not here); NULL-text queries are skipped;
    both-empty (query, value) pairs score nothing.

    ASCII contract: parity with the twin holds for text where Python
    ``str.lower()`` + code-point indexing and DuckDB ``lower()`` +
    ``s[i]``/``length()`` (utf8proc) agree — true for ASCII, not for
    every Unicode case fold (e.g. 'İ'.lower() is TWO code points in
    Python, one grapheme in utf8proc).  Non-ASCII picklists still rank
    deterministically on the Spark side; only the cross-engine
    bit-parity claim narrows to ASCII-ish inputs (the gated fixture's
    vocabulary is ASCII)."""
    from instructor_embedding_spark.metrics.generation import lcs_len

    values = _collect_picklist(candidates, c_col, max_picklist)
    lowered = [(v, list(v.lower())) for v in values]
    src = queries.select("query_id", F.col(q_col).alias("q"))

    def gen(batches):
        for pdf in batches:
            out = {"query_id": [], "rank": [], "value": [], "score": []}
            for qid, q in zip(pdf["query_id"], pdf["q"]):
                if pd.isna(qid) or not isinstance(q, str):
                    # unkeyed or NULL-text row: skip like the SQL twin
                    # (its VALUES inlining drops None texts)
                    continue
                ql = list(q.lower())
                scored = []
                for v, vl in lowered:
                    tot = len(ql) + len(vl)
                    if tot == 0:
                        continue  # both empty: twin's nc+nr>0 filter
                    s = 2.0 * lcs_len(ql, vl) / tot
                    if s >= threshold:
                        scored.append((s, v))
                scored.sort(key=lambda t: (-t[0], t[1]))
                for i, (s, v) in enumerate(scored[:k], start=1):
                    out["query_id"].append(int(qid))
                    out["rank"].append(i)
                    out["value"].append(v)
                    out["score"].append(_r6(s))
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=OUT_SCHEMA)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def fuzzy_match_topk_lcs_sql(
    query_rows: list[tuple[int, str]],
    candidates_sql: str,
    k: int = 3,
    threshold: float = 0.3,
    c_col: str = "value",
) -> str:
    """DuckDB twin of :func:`fuzzy_match_topk_lcs`.

    ``query_rows``: the (query_id, query_text) fixture inlined as VALUES
    (the query set is driver-known, exactly like the BM25 oracles);
    ``candidates_sql``: subquery yielding the picklist column ``c_col``.
    The character-level LCS runs through the SAME recursive CTE as the
    ROUGE-L oracle (metrics.generation.lcs_cte_sql) — integer state, so
    scores agree bit-exactly.  O(|q|·|v|²) per pair: picklist-sized
    inputs only (the Spark side's MAX_PICKLIST contract)."""
    from instructor_embedding_spark.metrics.generation import lcs_cte_sql

    vals = ", ".join(
        f"({int(qid)}, {_sql_str(text)})" for qid, text in query_rows
        if qid is not None and text is not None
    )
    if not vals:
        # all rows filtered: VALUES () is invalid SQL — emit an empty
        # typed relation so both engines return zero rows
        vals = None
    chars = (
        "list_transform(range(1, length({0}) + 1), i -> {0}[i])"
    )
    tok_sql = f"""
  SELECT pair_id, {chars.format('ql')} AS ct, {chars.format('vl')} AS rt
  FROM pairs
"""
    q_cte = (
        f"q(query_id, qtext) AS (VALUES {vals})"
        if vals is not None
        else "q AS (SELECT CAST(NULL AS BIGINT) AS query_id, "
             "CAST(NULL AS VARCHAR) AS qtext WHERE FALSE)"
    )
    return f"""
WITH {q_cte},
cand AS (
  SELECT DISTINCT {c_col} AS value FROM ({candidates_sql})
  WHERE {c_col} IS NOT NULL
),
pairs AS (
  SELECT row_number() OVER (ORDER BY q.query_id, cand.value) AS pair_id,
         q.query_id, cand.value,
         lower(q.qtext) AS ql, lower(cand.value) AS vl
  FROM q CROSS JOIN cand
),
lcs AS ({lcs_cte_sql(tok_sql)}),
scored AS (
  SELECT p.query_id, p.value,
         2.0 * l.lcs / (l.nc + l.nr) AS s
  FROM pairs p JOIN lcs l USING (pair_id)
  WHERE l.nc + l.nr > 0
),
ranked AS (
  SELECT query_id, value, s,
         row_number() OVER (
           PARTITION BY query_id ORDER BY s DESC, value ASC
         ) AS rank
  FROM scored
  WHERE s >= {threshold!r}
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, value, round(s, 6) AS score
FROM ranked WHERE rank <= {k}
"""
