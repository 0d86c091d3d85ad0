"""Length-sorted batching (SURVEY.md W6).

The reference sorts sentences by descending length before batching its
encoder, so every padded batch wastes minimal compute, and
inverse-permutes the outputs afterwards to restore input order
(instructor.py:632-641, 684).  The Spark-first analog is a
WITHIN-PARTITION sort by text length immediately before a batched
(Arrow) UDF: each pandas batch then sees similar-length texts.  Two
reference mechanics disappear by construction:

- no inverse permutation — rows are keyed (``doc_id``), not positional,
  so downstream joins/aggregations are order-free;
- no global sort — ``sortWithinPartitions`` is a narrow local sort
  (``Sort [...], global=false`` in the plan, NO Exchange), so at 100 TB
  it costs one in-memory sort per partition and zero shuffle.

Default OFF in the index build: measured on this corpus (see COVERAGE.md
W6 row) the lexical ``term_counts`` kernel's per-row cost is linear in
text length with no per-batch padding term, so batch length-uniformity
saves nothing and the local sort is pure overhead.  The operator exists
first-class for encoder-shaped UDFs whose batch cost is dominated by the
LONGEST row in the batch (padding semantics) — there the reference's
measured win applies and the flag pays for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def length_sorted(
    df: DataFrame, text_col: str = "content", descending: bool = True
) -> DataFrame:
    """Rows re-ordered by ``length(text_col)`` WITHIN each partition.

    Row set (and therefore every keyed downstream result) is unchanged;
    only intra-partition order — i.e. Arrow batch composition for a
    subsequent ``mapInPandas``/pandas UDF — differs.  Never shuffles.
    """
    col = F.length(F.col(text_col))
    return df.sortWithinPartitions(col.desc() if descending else col.asc())
