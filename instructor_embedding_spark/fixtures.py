"""Pinned query fixtures over the driver-provided `documents` table.

The driver's synthetic `documents` table (doc_id, text, lang, source,
n_chars) has a small spark-flavored vocabulary; this query set is the
engine's reference query set for correctness gating (shape of MTEB retrieval
queries Dict[qid,str], /root/reference/.../AbsTaskRetrieval.py:579),
including the edge cases pinned in FIXTURES.md §2: stopword-bearing,
all-stopword (empty after tokenize), camelCase (exercises the splitter),
and duplicate-term queries.
"""

from __future__ import annotations

#: (query_id, query_text) — inlined into both Spark and oracle SQL.
DRIVER_QUERY_SET: list[tuple[int, str]] = [
    (1, "fast hash join"),
    (2, "window merge sort"),
    (3, "the spark stream"),        # stopword 'the' dropped
    (4, "a of the"),                # all stopwords → no result rows
    (5, "vector column scan"),
    (6, "slow group query data"),
    (7, "customer filter"),
    (8, "BatchStream sparkJoin"),   # camelCase → batch stream spark join
    (9, "merge merge merge"),       # duplicate terms → set semantics
]

TOP_K = 10
