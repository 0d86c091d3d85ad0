"""Fuzzy string matching against a bounded picklist (M16/J7-lite).

Reference: bridge_content_encoder.py:112-189 (get_matched_entries — rank
picklist values by a difflib-style ratio against the query) and :215-250
(fuzzy longest-match threshold rules).  rapidfuzz is unavailable in this
environment; stdlib ``difflib.SequenceMatcher.ratio`` is the reference's
own fallback scorer, so semantics are pinned to it:

- score(q, v) = round(SequenceMatcher(None, lower(q), lower(v)).ratio(), 6)
- keep score ≥ threshold; rank by (score DESC, value ASC); top-k per query

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

OUT_SCHEMA = "query_id long, rank long, value string, score double"

#: Hard cap on the collected picklist: the operator's contract is a
#: column-value dictionary (bridge_content_encoder picklists are a few
#: hundred values), not a corpus — failing fast beats OOMing the driver.
MAX_PICKLIST = 100_000


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
    # cheap guard BEFORE the collect: limit(max+1) bounds the probe
    n_probe = candidates.select(c_col).distinct().limit(
        max_picklist + 1
    ).count()
    if n_probe > max_picklist:
        raise ValueError(
            f"picklist exceeds max_picklist={max_picklist} distinct "
            f"values — fuzzy_match_topk is for column-value dictionaries; "
            f"use the LSH/ngram dedup family for corpus-scale matching"
        )
    values = sorted(
        r[c_col]
        for r in candidates.select(c_col).distinct().collect()
        if r[c_col] is not None
    )
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
