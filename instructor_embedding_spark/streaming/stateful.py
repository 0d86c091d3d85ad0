"""Custom stateful streaming operator: cross-micro-batch exact dedup.

The streaming face of ``analytics.dedup.exact_duplicates``: documents
arrive in micro-batches; only the FIRST row per content hash survives,
enforced with per-key state (``applyInPandasWithState``) so duplicates are
dropped across batches, not just within one.

Pinned semantics: first-seen wins, ties within a batch go to the smallest
doc_id — so with doc_id-ordered ingest the retained set equals the batch
operator's keep = min(doc_id) rule (stream-equals-batch, tested).

Scale shape: state is one long per distinct content hash, partitioned by
the hash — the same key the batch groupBy shuffles on.  No timeout is set
(dedup state is permanent by definition); a production deployment bounds
it with state-store TTL or periodic compaction against the batch index.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "content_md5 string, doc_id long"
STATE_SCHEMA = "doc_id long"


def _dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState):
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None or m < best else best
    if state.exists or best is None:
        # key already emitted in an earlier batch (or empty group):
        # drop everything
        yield pd.DataFrame({"content_md5": [], "doc_id": []})
        return
    state.update((best,))
    yield pd.DataFrame({"content_md5": [key[0]], "doc_id": [best]})


def stream_dedup_first_seen(docs_stream: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Streaming DataFrame of survivors: (content_md5, doc_id)."""
    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_md5"),
        F.col(id_col).alias("doc_id"),
    )
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
