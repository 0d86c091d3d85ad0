"""Generation metrics: ROUGE-L (M15).

Reference: prompt_retrieval main.py:153-157 loads the HF rouge metric and
reports ``rougeL``; its inputs are sentence-tokenized first (main.py:43-44 —
the M14 op, ``analytics.text_stats.sentences``).  Pinned semantics here:

- both sides tokenize with the repo's pinned tokenizer
  (functions/tokenize.py — lowercase, camel-split, stopword/len filter)
- LCS over the token sequences (classic DP)
- P = LCS/|cand|, R = LCS/|ref|, F = 2PR/(P+R); 0 for degenerate inputs

The quadratic LCS DP is not SQL-expressible, so the driver entry is
rows-only; correctness is pinned by tests/test_generation.py goldens and a
naive-DP parity property.  The DP runs as a numpy rolling-row kernel inside
an Arrow-batched ``mapInPandas`` (one prefix-max pass per candidate token —
no per-cell Python).
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
                out["rouge_p"].append(round(p, 6))
                out["rouge_r"].append(round(rr, 6))
                out["rouge_f"].append(round(f, 6))
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=OUT_SCHEMA)


def rouge_l_summary(per_pair: DataFrame) -> DataFrame:
    """(n_pairs, mean_p, mean_r, mean_f) — the reference reports the mean
    rougeL over the evaluation set (main.py:153-157)."""
    return per_pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("rouge_p"), 6).alias("mean_p"),
        F.round(F.avg("rouge_r"), 6).alias("mean_r"),
        F.round(F.avg("rouge_f"), 6).alias("mean_f"),
    )
