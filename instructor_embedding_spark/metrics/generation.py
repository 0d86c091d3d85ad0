"""Generation metrics: ROUGE-L (M15).

Reference: prompt_retrieval main.py:153-157 loads the HF rouge metric and
reports ``rougeL``; its inputs are sentence-tokenized first (main.py:43-44 —
the M14 op, ``analytics.text_stats.sentences``).  Pinned semantics here:

- both sides tokenize with the repo's pinned tokenizer
  (functions/tokenize.py — lowercase, camel-split, stopword/len filter)
- LCS over the token sequences (classic DP)
- P = LCS/|cand|, R = LCS/|ref|, F = 2PR/(P+R); 0 for degenerate inputs

The DP runs as a numpy rolling-row kernel inside an Arrow-batched
``mapInPandas`` (one prefix-max pass per candidate token — no per-cell
Python).  The SAME prefix-max recurrence is expressible in DuckDB as a
recursive CTE whose state is the DP row carried as an integer list
(:func:`rouge_l_sql`) — integer-only state, so the twin is exact, not a
float-tolerance match; correctness is additionally pinned by
tests/test_generation.py goldens and a naive-DP parity property.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import tokenize_py

OUT_SCHEMA = (
    "pair_id long, lcs long, rouge_p double, rouge_r double, rouge_f double"
)


from instructor_embedding_spark.functions.rounding import r6 as _r6


def lcs_len(a: list[str], b: list[str]) -> int:
    """Length of the longest common subsequence (numpy rolling-row DP).

    cur[j] = max(prev[j], cur[j-1], prev[j-1]+1 if a_i == b_j); the
    cur[j-1] carry adds nothing, so it's a prefix-max over the other two —
    one vectorized pass per row."""
    if not a or not b:
        return 0
    vocab: dict[str, int] = {}
    ai = np.fromiter((vocab.setdefault(t, len(vocab)) for t in a),
                     dtype=np.int64, count=len(a))
    bi = np.fromiter((vocab.setdefault(t, len(vocab)) for t in b),
                     dtype=np.int64, count=len(b))
    prev = np.zeros(bi.size + 1, dtype=np.int32)
    cur = np.empty_like(prev)
    for x in ai:
        np.maximum(
            prev[1:],
            np.where(bi == x, prev[:-1] + 1, 0),
            out=cur[1:],
        )
        cur[0] = 0
        np.maximum.accumulate(cur, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def rouge_l(pairs: DataFrame, cand_col: str = "candidate",
            ref_col: str = "reference",
            id_col: str = "pair_id") -> DataFrame:
    """(pair_id, lcs, rouge_p, rouge_r, rouge_f) per (candidate, reference)
    pair, rounded to 6dp."""
    src = pairs.select(
        F.col(id_col).alias("pair_id"),
        F.col(cand_col).alias("cand"),
        F.col(ref_col).alias("ref"),
    )

    def gen(batches):
        for pdf in batches:
            out = {"pair_id": [], "lcs": [], "rouge_p": [], "rouge_r": [],
                   "rouge_f": []}
            for pid, c, r in zip(pdf["pair_id"], pdf["cand"], pdf["ref"]):
                ct, rt = tokenize_py(c), tokenize_py(r)
                l = lcs_len(ct, rt)
                p = l / len(ct) if ct else 0.0
                rr = l / len(rt) if rt else 0.0
                f = 2 * p * rr / (p + rr) if (p + rr) > 0 else 0.0
                out["pair_id"].append(int(pid))
                out["lcs"].append(l)
                out["rouge_p"].append(_r6(p))
                out["rouge_r"].append(_r6(rr))
                out["rouge_f"].append(_r6(f))
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=OUT_SCHEMA)


def rouge_l_sql(pairs_sql: str, cand_col: str = "candidate",
                ref_col: str = "reference",
                id_col: str = "pair_id") -> str:
    """DuckDB twin of :func:`rouge_l` over a subquery yielding
    (pair_id, candidate, reference).

    The rolling-row DP becomes a recursive CTE: iteration i consumes
    candidate token i, carrying the previous DP row as an INTEGER list;
    cur[j] = prefix-max of max(prev[j], prev[j-1]+1 if token match) —
    exactly the formulation :func:`lcs_len` vectorizes.  All state is
    integer, so the twin reproduces lcs bit-exactly; P/R/F are single
    divisions of those integers (identical in both engines).

    Size bound: the nested prefix-max makes this twin O(|cand|·|ref|²) in
    TOKENS per pair — fine at the gated fixture sizes (candidate
    substr(1,120) ⇒ ≤ ~25 tokens; references ≤ ~150 tokens) but
    quadratic in reference length if pointed at long texts.  Cap the
    reference column in ``pairs_sql`` (mirroring the candidate
    truncation) before reusing it on bigger inputs; the Spark side
    (:func:`rouge_l`) is O(|cand|·|ref|) and needs no cap."""
    from instructor_embedding_spark.functions.tokenize import (
        sql_tokens_expr,
    )

    tok_sql = f"""
  SELECT {id_col} AS pair_id, {sql_tokens_expr(cand_col)} AS ct,
         {sql_tokens_expr(ref_col)} AS rt
  FROM ({pairs_sql})
"""
    return f"""
WITH fin AS ({lcs_cte_sql(tok_sql)}),
pr AS (
  SELECT pair_id, lcs,
         CASE WHEN nc > 0 THEN lcs * 1.0 / nc ELSE 0.0 END AS p,
         CASE WHEN nr > 0 THEN lcs * 1.0 / nr ELSE 0.0 END AS r
  FROM fin
)
SELECT pair_id, lcs, round(p, 6) AS rouge_p, round(r, 6) AS rouge_r,
       round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
             ELSE 0.0 END, 6) AS rouge_f
FROM pr
"""


def lcs_cte_sql(tok_sql: str) -> str:
    """Recursive-CTE LCS core, shared by :func:`rouge_l_sql` (token
    sequences) and the fuzzy LCS-ratio twin (character sequences).

    ``tok_sql``: a subquery yielding (pair_id, ct, rt) where ct/rt are
    the two sequences as lists.  Returns a SELECT of
    (pair_id, lcs BIGINT, nc, nr).  Iteration i of the recursion consumes
    element i of ct, carrying the previous DP row as an INTEGER list;
    cur[j] = prefix-max of max(prev[j], prev[j-1]+1 on match) — the same
    recurrence :func:`lcs_len` vectorizes, with all state integer so both
    engines agree bit-exactly.  Cost: O(len(ct)·len(rt)²) per pair — cap
    input lengths at the call site (see rouge_l_sql's size-bound note)."""
    return f"""
WITH RECURSIVE
tok AS ({tok_sql}),
dp(pair_id, i, prev) AS (
  SELECT pair_id, 0, list_transform(range(0, len(rt) + 1), x -> 0)
  FROM tok
  UNION ALL
  SELECT d.pair_id, d.i + 1,
    list_prepend(0, list_transform(range(1, len(s.rt) + 1),
      j -> list_max(list_transform(range(1, j + 1),
        j2 -> greatest(d.prev[j2 + 1],
                       CASE WHEN s.rt[j2] = s.ct[d.i + 1]
                            THEN d.prev[j2] + 1 ELSE 0 END)))))
  FROM dp d JOIN tok s USING (pair_id)
  WHERE d.i < len(s.ct)
)
SELECT d.pair_id, CAST(d.prev[len(s.rt) + 1] AS BIGINT) AS lcs,
       len(s.ct) AS nc, len(s.rt) AS nr
FROM dp d JOIN tok s USING (pair_id)
WHERE d.i = len(s.ct)
"""


def rouge_l_summary(per_pair: DataFrame) -> DataFrame:
    """(n_pairs, mean_p, mean_r, mean_f) — the reference reports the mean
    rougeL over the evaluation set (main.py:153-157)."""
    return per_pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("rouge_p"), 6).alias("mean_p"),
        F.round(F.avg("rouge_r"), 6).alias("mean_r"),
        F.round(F.avg("rouge_f"), 6).alias("mean_f"),
    )
