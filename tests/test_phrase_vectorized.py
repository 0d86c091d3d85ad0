"""Vectorized positions-family kernels vs their per-doc reference twins.

The r6 optimization rewrote all six family kernels from per-doc Python
loops (pandas groupby + one varint_decode per (doc, term)) to
batch-vectorized numpy over the whole (phrase_id, doc_block) group.  The
pre-r6 per-doc implementations are kept as ``*_perdoc`` twins; this file
fuzz-pins row-identity between the two on randomized corpora, plus the
segmented decoder against the per-blob decoder."""

from __future__ import annotations

import numpy as np
import pandas as pd

from instructor_embedding_spark.functions.codec import (
    varint_decode,
    varint_decode_segmented,
    varint_encode,
)
from instructor_embedding_spark.query.phrase import (
    _ordered_proximity_kernel,
    _ordered_proximity_kernel_perdoc,
    _phrase_kernel,
    _phrase_kernel_perdoc,
    _proximity_kernel,
    _proximity_kernel_perdoc,
    _span_first_kernel,
    _span_first_kernel_perdoc,
    _span_not_kernel,
    _span_not_kernel_perdoc,
)
from instructor_embedding_spark.query.snippet import (
    _snippet_kernel,
    _snippet_kernel_perdoc,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def test_varint_decode_segmented_matches_per_blob():
    rng = np.random.default_rng(3)
    blobs = []
    for _ in range(200):
        k = int(rng.integers(0, 9))
        vals = rng.integers(0, 1 << 40, size=k).astype(np.uint64)
        blobs.append(varint_encode(vals))
    vals, starts = varint_decode_segmented(blobs)
    for i, b in enumerate(blobs):
        assert np.array_equal(vals[starts[i]:starts[i + 1]],
                              varint_decode(b)), i


def _mk_group(rng, docs, qterms, pid=1, id_col="phrase_id"):
    rows = []
    for d, toks in enumerate(docs):
        for t in sorted(set(qterms)):
            ps = np.flatnonzero(
                np.array(toks, dtype=object) == t
            ).astype(np.uint64)
            if ps.size:
                deltas = np.empty_like(ps)
                deltas[0] = ps[0]
                deltas[1:] = ps[1:] - ps[:-1]
                rows.append((pid, d, t, varint_encode(deltas)))
    if not rows:
        return None
    pdf = pd.DataFrame(
        rows, columns=[id_col, "doc_id", "term", "pos_bytes"]
    )
    return pdf.sample(frac=1, random_state=int(rng.integers(1 << 30)))


def _cmp(a, b, label, ctx):
    sa = sorted(map(tuple, a.to_numpy().tolist()))
    sb = sorted(map(tuple, b.to_numpy().tolist()))
    assert sa == sb, (label, ctx, sa, sb)


def test_vectorized_kernels_match_perdoc_fuzz():
    rng = np.random.default_rng(11)
    for trial in range(150):
        ndocs = int(rng.integers(1, 10))
        docs = [
            [VOCAB[i] for i in
             rng.integers(0, len(VOCAB), size=rng.integers(0, 25))]
            for _ in range(ndocs)
        ]
        slop = int(rng.integers(0, 4))
        qset = sorted({VOCAB[i] for i in
                       rng.integers(0, len(VOCAB),
                                    size=rng.integers(1, 4))})
        g = _mk_group(rng, docs, qset)
        if g is not None:
            ts, sl = {1: qset}, {1: slop}
            _cmp(_proximity_kernel_perdoc(ts, sl)(g.copy()),
                 _proximity_kernel(ts, sl)(g.copy()),
                 "proximity", (trial, qset, slop))
        phrase = [VOCAB[i] for i in
                  rng.integers(0, len(VOCAB), size=rng.integers(1, 4))]
        g = _mk_group(rng, docs, phrase)
        if g is not None:
            to = {1: phrase}
            _cmp(_phrase_kernel_perdoc(to)(g.copy()),
                 _phrase_kernel(to)(g.copy()),
                 "phrase", (trial, phrase))
            sl = {1: slop}
            _cmp(_ordered_proximity_kernel_perdoc(to, sl)(g.copy()),
                 _ordered_proximity_kernel(to, sl)(g.copy()),
                 "ordered", (trial, phrase, slop))
        g = _mk_group(rng, docs, qset, id_col="query_id")
        if g is not None:
            w = int(rng.integers(1, 8))
            _cmp(_snippet_kernel_perdoc({1: qset}, w)(g.copy()),
                 _snippet_kernel({1: qset}, w)(g.copy()),
                 "snippet", (trial, qset, w))
        t0 = VOCAB[int(rng.integers(0, len(VOCAB)))]
        g = _mk_group(rng, docs, [t0])
        if g is not None:
            ends = {1: int(rng.integers(1, 20))}
            _cmp(_span_first_kernel_perdoc(ends)(g.copy()),
                 _span_first_kernel(ends)(g.copy()),
                 "span_first", (trial, t0, ends))
        t_inc = VOCAB[int(rng.integers(0, len(VOCAB)))]
        t_exc = VOCAB[int(rng.integers(0, len(VOCAB)))]
        if t_inc != t_exc:
            g = _mk_group(rng, docs, [t_inc, t_exc])
            if g is not None and (g["term"] == t_inc).any():
                pre = int(rng.integers(0, 3))
                post = int(rng.integers(0, 3))
                _cmp(_span_not_kernel_perdoc({1: t_exc}, pre, post)(g.copy()),
                     _span_not_kernel({1: t_exc}, pre, post)(g.copy()),
                     "span_not", (trial, t_inc, t_exc, pre, post))


def test_raw_piece_codes_matches_python_spec():
    """Arrow C++ tokenizer steps 1-4 == the pinned Python spec on ASCII;
    non-ASCII batches return None (callers take the per-doc path)."""
    import random
    import string

    from instructor_embedding_spark.functions.tokenize import (
        _BOUNDARY_C,
        _SPLIT_C,
        raw_piece_codes,
    )

    def raw_py(t):
        if not t:
            return []
        return _SPLIT_C.split(_BOUNDARY_C.sub(" ", t).lower())

    rng = random.Random(9)
    chars = string.ascii_letters + string.digits + " ._-(){}:\n\t/+#"
    texts = ["", None, "HTTPServer parseVarint the a", "a..b", ".lead",
             "trail.", "ABCdefGHI", "XMLHttpRequest"]
    texts += ["".join(rng.choice(chars)
                      for _ in range(rng.randrange(0, 60)))
              for _ in range(3000)]
    enc = raw_piece_codes(pd.Series(texts))
    assert enc is not None
    codes, uniques, counts = enc
    flat_py, counts_py = [], []
    for t in texts:
        p = raw_py(t)
        flat_py.extend(p)
        counts_py.append(len(p))
    assert counts.tolist() == counts_py
    assert uniques[codes].tolist() == flat_py

    assert raw_piece_codes(pd.Series(["ok", "мир"])) is None


def test_build_positions_arrow_matches_python_path(spark):
    """build_positions output is identical whether a batch takes the
    Arrow fast path (ASCII) or the per-doc Python path (forced by one
    non-ASCII row)."""
    from instructor_embedding_spark.query.phrase import build_positions

    rows = [
        (0, "alpha beta gamma alpha beta"),
        (1, "HTTPServer parseVarint the a"),
        (2, ""),
        (3, None),
        (4, "def planted(): zqxprobe zqxband return"),
    ]
    ascii_docs = spark.createDataFrame(rows, "doc_id long, content string")
    # the extra non-ASCII doc forces the WHOLE single-partition batch
    # down the Python path; its own rows are then excluded from the diff
    py_docs = spark.createDataFrame(
        rows + [(99, "мир")], "doc_id long, content string"
    ).coalesce(1)
    a = {(r.doc_id, r.term, r.doc_block, bytes(r.pos_bytes))
         for r in build_positions(ascii_docs, span=4).collect()}
    b = {(r.doc_id, r.term, r.doc_block, bytes(r.pos_bytes))
         for r in build_positions(py_docs, span=4).collect()
         if r.doc_id != 99}
    assert a == b
