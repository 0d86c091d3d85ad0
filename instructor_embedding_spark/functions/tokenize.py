"""Code-aware tokenizer (SURVEY.md T3) in four consistent implementations.

Spec (pinned — every implementation must agree token-for-token):

1. split acronym→word camel boundaries:  ``HTTPServer`` → ``HTTP Server``
   (regex ``([A-Z]+)([A-Z][a-z])`` → ``\\1 \\2``)
2. split lower/digit→upper camel boundaries: ``parseVarint`` → ``parse Varint``
   (regex ``([a-z0-9])([A-Z])`` → ``\\1 \\2``)
3. lowercase
4. split on runs of non-alphanumerics (snake_case, punctuation, whitespace)
5. drop tokens shorter than 2 chars and stopwords
   (stopword list = the reference's own lexical filter,
   bridge_content_encoder.py:8-22)

Implementations:

- :func:`tokens_col` — pure Spark column expression (JVM-side, whole-stage
  codegen; the fast path).
- :func:`tokens_pandas_udf` — vectorized Arrow/pandas UDF (the north-rule
  surface; same output, used to satisfy + test the pandas-UDF contract and
  as the hook point for tokenizers that genuinely need Python).
- :func:`tokenize_py` — plain Python, for unit-test goldens and datagen.
- :func:`sql_tokens_expr` — DuckDB SQL list expression, for oracle queries.

The reference's analog is HF subword tokenization inside ``encode``
(/root/reference/InstructorEmbedding/instructor.py:383-430); we replace the
subword model with a deterministic lexical splitter per the north rule.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from instructor_embedding_spark.stopwords import EFFECTIVE_STOPWORDS, stopword_sql_list

# Pinned regex spec (step numbers above).
_ACRONYM_RE = r"([A-Z]+)([A-Z][a-z])"
_CAMEL_RE = r"([a-z0-9])([A-Z])"
_SPLIT_RE = r"[^a-z0-9]+"

_ACRONYM_C = re.compile(_ACRONYM_RE)
_CAMEL_C = re.compile(_CAMEL_RE)
_SPLIT_C = re.compile(_SPLIT_RE)
_STOPSET = frozenset(EFFECTIVE_STOPWORDS)
MIN_TOKEN_LEN = 2


#: Zero-width form of the two camel rules combined: insert a space at any
#: position where (prev ∈ [A-Z] and next two ∈ [A-Z][a-z]) or (prev ∈
#: [a-z0-9] and next ∈ [A-Z]).  Equivalent to applying _ACRONYM_RE then
#: _CAMEL_RE sequentially (fuzz-verified over 20k random mixed-case
#: strings + the corpus in tests), but one pass and no group templates.
_BOUNDARY_C = re.compile(r"(?<=[A-Z])(?=[A-Z][a-z])|(?<=[a-z0-9])(?=[A-Z])")


def tokenize_py(text: str | None) -> list[str]:
    """Reference Python implementation of the pinned tokenizer spec."""
    if not text:
        return []
    s = _BOUNDARY_C.sub(" ", text).lower()
    return [
        t
        for t in _SPLIT_C.split(s)
        if len(t) >= MIN_TOKEN_LEN and t not in _STOPSET
    ]


def term_counts(text: str | None) -> tuple[dict[str, int], int]:
    """(term → tf, dl) in one pass — the index build's hot kernel.

    Counts ALL split pieces C-speed first, then applies the length/stopword
    filter per UNIQUE term (≈2-3× fewer membership tests than per-token);
    dl is the number of retained token occurrences, identical to
    ``len(tokenize_py(text))`` (parity-tested)."""
    if not text:
        return {}, 0
    from collections import Counter

    s = _BOUNDARY_C.sub(" ", text).lower()
    raw = Counter(_SPLIT_C.split(s))
    out: dict[str, int] = {}
    dl = 0
    for t, n in raw.items():
        if len(t) >= MIN_TOKEN_LEN and t not in _STOPSET:
            out[t] = n
            dl += n
    return out, dl


def tokens_col(col: Column | str) -> Column:
    """Tokenize a string column entirely with JVM-side expressions.

    Stays inside whole-stage codegen — no Python boundary.  This is the
    default index-build path; the pandas UDF below is the pluggable slow
    path for tokenizers that need real Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, _ACRONYM_RE, r"$1 $2")
    s = F.regexp_replace(s, _CAMEL_RE, r"$1 $2")
    s = F.lower(s)
    toks = F.split(s, _SPLIT_RE)
    stop_arr = F.array(*[F.lit(w) for w in EFFECTIVE_STOPWORDS])
    return F.filter(
        toks,
        lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~F.array_contains(stop_arr, t),
    )


def raw_piece_codes(texts) -> tuple | None:
    """Batch tokenizer steps 1-4 (camel splits, lower, regex split) as
    ONE Arrow C++ pipeline over a pandas Series of texts, returning
    ``(codes int64, uniques object ndarray, counts int64)``: the
    dictionary-encoded RAW split pieces (pre length/stopword filter,
    which callers apply per UNIQUE) and the piece count per row.

    Returns None when the batch contains any non-ASCII text: RE2 and
    utf8proc agree with the pinned Python spec on ASCII (fuzz-pinned in
    tests/test_tokenize.py) but CPython's str.lower() differs from
    utf8proc on a few non-ASCII codepoints (e.g. U+0130), so such
    batches take the per-doc Python path instead.  The two camel
    substitutions run as the original two-step form — RE2 has no
    lookarounds — which is the fuzz-verified equivalent of the combined
    zero-width _BOUNDARY_C form."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    if not pc.all(
        pc.fill_null(pc.string_is_ascii(arr), True)
    ).as_py():
        return None
    # '' must yield ZERO pieces like tokenize_py's falsy guard (a bare
    # regex split of '' yields one empty piece) — null rows flatten away
    arr = pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)
    s = pc.replace_substring_regex(
        arr, pattern=_ACRONYM_RE, replacement=r"\1 \2"
    )
    s = pc.replace_substring_regex(
        s, pattern=_CAMEL_RE, replacement=r"\1 \2"
    )
    s = pc.utf8_lower(s)
    lists = pc.split_pattern_regex(s, pattern=_SPLIT_RE)
    counts = pc.fill_null(
        pc.list_value_length(lists).cast(pa.int64()), 0
    ).to_numpy(zero_copy_only=False)
    dic = pc.dictionary_encode(pc.list_flatten(lists))
    import numpy as np

    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = np.asarray(dic.dictionary.to_pylist(), dtype=object)
    return codes, uniques, counts


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_pandas_udf(texts: pd.Series) -> pd.Series:
    """Vectorized Arrow-batched tokenizer (north-rule pandas-UDF surface).

    One Arrow batch in, one out — no per-row JVM↔Python round trips
    (reference analog: batch tokenize, instructor.py:383-430).
    """
    return texts.map(tokenize_py)


def sql_tokens_expr(col: str) -> str:
    """DuckDB list expression implementing the same pinned spec.

    Used to build oracle SQL; must stay token-identical to
    :func:`tokenize_py` (tested in tests/test_tokenize.py).
    """
    return (
        "list_filter("
        f"string_split_regex(lower(regexp_replace(regexp_replace({col}, "
        f"'{_ACRONYM_RE}', '\\1 \\2', 'g'), "
        f"'{_CAMEL_RE}', '\\1 \\2', 'g')), '{_SPLIT_RE}'), "
        f"t -> length(t) >= {MIN_TOKEN_LEN} AND t NOT IN ({stopword_sql_list()})"
        ")"
    )
