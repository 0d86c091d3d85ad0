"""Map-side (term, doc_id, tf, dl) extraction — the index build's hot path.

Term frequency is a per-document aggregate, so it never needs a shuffle:
one ``mapInPandas`` pass tokenizes and counts inside each Arrow batch and
emits the (doc_id, term, tf, dl) triples directly.  Compared with
explode → groupBy(doc_id, term), this removes the build pipeline's largest
shuffle (≈240 tokens/doc → ~10^14 shuffled rows at 10^12 docs); the only
remaining wide stages are the df aggregation and the salted segment
repartition, both over the already-aggregated triples (~20× smaller).

The kernel is batch-vectorized (guide §4.2, same amortization pattern as
``build_positions``): the regex split runs per doc (C-speed), then ONE
``pd.factorize`` + ``np.lexsort`` over the whole Arrow batch groups
(doc, term) occurrences — the length/stopword filter runs once per
UNIQUE batch term instead of once per token, and tf/dl fall out of run
lengths and bincounts.  No per-token Python dict ops, no per-doc Counter
(the r5 per-doc loop was the single largest index-build stage — see
OPTIMIZATION_r06.md).

Output is token-identical to the declarative path (tested against
explode+groupBy in tests/test_bm25.py / test_index_wand.py rank gates);
row ORDER within a batch differs from the r5 kernel (term-grouped, not
per-doc insertion order), which no consumer observes — every downstream
stage aggregates or re-sorts by key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import (
    MIN_TOKEN_LEN,
    _BOUNDARY_C,
    _SPLIT_C,
    _STOPSET,
    raw_piece_codes,
)

TF_SCHEMA = "doc_id long, term string, tf long, dl long"

_EMPTY = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "term": pd.Series([], dtype="object"),
        "tf": pd.Series([], dtype="int64"),
        "dl": pd.Series([], dtype="int64"),
    }
)


def tf_pairs_map_side(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    include_doc_rows: bool = False,
) -> DataFrame:
    """(doc_id, term, tf, dl) with no shuffle (narrow mapInPandas).

    With ``include_doc_rows`` every doc additionally emits one
    ``term IS NULL`` row, so doc_stats shares the pass; that row's
    ``tf`` carries the doc's DISTINCT retained-term count (= the number
    of posting rows the doc emitted), so per-block build lineage
    (docs + postings per doc_block) aggregates over the |docs| doc rows
    instead of re-scanning all |postings| rows."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_rows = len(pdf)
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            enc = raw_piece_codes(pdf["text"])
            if enc is not None:
                # Arrow C++ fast path: camel splits + lower + regex
                # split + dictionary encode without touching Python
                # strings (ASCII batches — the common case; measured
                # ~2× the per-doc re path)
                codes, uniques, counts = enc
            else:
                raw_per_doc = [
                    _SPLIT_C.split(_BOUNDARY_C.sub(" ", t).lower())
                    if t else []
                    for t in pdf["text"]
                ]
                counts = np.fromiter(
                    (len(r) for r in raw_per_doc), dtype=np.int64,
                    count=n_rows,
                )
                flat = np.empty(int(counts.sum()), dtype=object)
                i = 0
                for pieces in raw_per_doc:
                    flat[i:i + len(pieces)] = pieces
                    i += len(pieces)
                codes, uniques = pd.factorize(flat)  # C-speed hash
            total = int(counts.sum())
            if total == 0:
                if include_doc_rows and n_rows:
                    yield pd.DataFrame(
                        {
                            "doc_id": doc_ids,
                            "term": np.full(n_rows, None, dtype=object),
                            "tf": np.zeros(n_rows, dtype=np.int64),
                            "dl": np.zeros(n_rows, dtype=np.int64),
                        }
                    )
                else:
                    yield _EMPTY
                continue

            # group by (doc row, term code)
            ridx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
            # length/stopword filter per UNIQUE term, broadcast via codes
            keep_u = np.fromiter(
                (len(u) >= MIN_TOKEN_LEN and u not in _STOPSET
                 for u in uniques),
                dtype=bool, count=len(uniques),
            )
            keep = keep_u[codes]
            rk, ck = ridx[keep], codes[keep]
            # dl per doc row = retained occurrences (zero-token docs stay 0)
            dls = np.bincount(rk, minlength=n_rows).astype(np.int64)

            order = np.lexsort((ck, rk))
            sr, sc = rk[order], ck[order]
            if sr.size:
                new_grp = np.empty(sr.size, dtype=bool)
                new_grp[0] = True
                new_grp[1:] = (sr[1:] != sr[:-1]) | (sc[1:] != sc[:-1])
                gstarts = np.flatnonzero(new_grp)
                tf = np.diff(np.append(gstarts, sr.size)).astype(np.int64)
                out_rows = sr[gstarts]
                out = {
                    "doc_id": doc_ids[out_rows],
                    "term": uniques[sc[gstarts]],
                    "tf": tf,
                    "dl": dls[out_rows],
                }
            else:
                out = {
                    "doc_id": np.empty(0, dtype=np.int64),
                    "term": np.empty(0, dtype=object),
                    "tf": np.empty(0, dtype=np.int64),
                    "dl": np.empty(0, dtype=np.int64),
                }
            if include_doc_rows:
                # one NULL-term row per doc carries dl (covers zero-token
                # docs) — doc_stats falls out of the same single pass;
                # its tf = the doc's posting-row count (distinct retained
                # terms), the per-block lineage input
                if sr.size:
                    nterms = np.bincount(
                        sr[gstarts], minlength=n_rows
                    ).astype(np.int64)
                else:
                    nterms = np.zeros(n_rows, dtype=np.int64)
                out = {
                    "doc_id": np.concatenate([out["doc_id"], doc_ids]),
                    "term": np.concatenate(
                        [out["term"], np.full(n_rows, None, dtype=object)]
                    ),
                    "tf": np.concatenate([out["tf"], nterms]),
                    "dl": np.concatenate([out["dl"], dls]),
                }
            yield pd.DataFrame(out)

    return src.mapInPandas(gen, schema=TF_SCHEMA)
