"""Deterministic synthetic source-code corpus + queries + qrels.

Generates the Iceberg-shaped input table from BASELINE.json's input_hint —
``(repo, path, commit, lang, content)`` plus ``content_sha256`` and a
deterministic ``doc_id`` — entirely inside Spark (``mapInPandas`` over
``spark.range``; per-doc content is a pure function of (seed, doc_id), so
the corpus is identical under any partitioning or cluster size).

Corpus properties (FIXTURES.md §1-§3):

- identifier vocabulary mixing camelCase and snake_case (exercises the
  code-aware splitter)
- English comments including stopwords
- a skew term (``sharedBufferPool``) planted in ~50% of docs to exercise
  salted shuffles
- planted rare identifiers with known placement rules → queries with exactly
  derivable qrels (the retrieval-task shape of the reference:
  corpus/queries/qrels dicts, AbsTaskRetrieval.py:578-580)

Reference analog of the generator: the reference pins seeds for every
stochastic step (AbsTask.py:16-20, Evaluator.py:12-17); we extend that to
content-addressed rows (sha256 per row, checked by tests).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

_WORDS = (
    "buffer pool parser lexer token stream batch merge sort index shard "
    "segment block header footer varint delta codec hash digest cache "
    "queue stack heap tree graph node edge vertex table column row page "
    "file reader writer scanner planner executor scheduler worker driver "
    "shuffle partition broadcast join filter project aggregate window "
    "limit offset cursor iterator snapshot commit branch tag manifest "
    "catalog schema field type codegen expr predicate literal binding "
    "socket channel packet frame request response session client server "
    "config option flag metric gauge counter tracer logger handler hook "
    "retry backoff timeout lease lock mutex atomic fence barrier latch "
).split()

_VERBS = (
    "get set read write open close init flush reset push pop peek scan "
    "seek skip emit apply bind resolve encode decode pack unpack split "
    "concat copy move swap fill drain spill load store alloc free grow "
).split()

_COMMENT_WORDS = (
    "the a of to and in for with this that is are will should when from "
    "returns result value input output case empty full next previous "
    "current total count number size length range bounds check error "
).split()

_LANGS = ["python", "java", "go", "js", "c"]
_LANG_W = np.array([0.35, 0.2, 0.15, 0.15, 0.15])
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}

#: Skew term planted in ~50% of docs (FIXTURES.md §1).
SKEW_TERM = "sharedBufferPool"

#: Planted rare identifiers: (identifier, placement modulus, residue).
#: doc i contains the identifier iff i % mod == res — so qrels are exactly
#: derivable without scanning.
PLANTED: list[tuple[str, int, int]] = [
    ("parse_varint_block_header", 97, 3),
    ("blockMaxWandScorer", 89, 7),
    ("mergePostingSegments", 83, 11),
    ("delta_gap_encoder", 79, 5),
    ("checkpointLineageManifest", 73, 2),
    ("salted_shuffle_router", 71, 9),
    ("okapiScoreAccumulator", 67, 13),
    ("inverted_index_builder", 61, 17),
]

#: (query_id, query_text, planted identifier or None).
#: Queries phrase the planted identifier as natural language; the tokenizer
#: maps both sides to the same terms, so relevant docs rank first.
QUERY_SET: list[tuple[int, str, str | None]] = [
    (1, "how to parse a varint block header", "parse_varint_block_header"),
    (2, "block max wand scorer implementation", "blockMaxWandScorer"),
    (3, "merge posting segments", "mergePostingSegments"),
    (4, "delta gap encoder for doc ids", "delta_gap_encoder"),
    (5, "checkpoint lineage manifest", "checkpointLineageManifest"),
    (6, "salted shuffle router", "salted_shuffle_router"),
    (7, "okapi score accumulator", "okapiScoreAccumulator"),
    (8, "inverted index builder", "inverted_index_builder"),
    (9, "shared buffer pool", None),          # skew-term query (huge df)
    (10, "the of a to and", None),            # all stopwords → empty
    (11, "zzzunknowntermzzz", None),          # zero-hit term
    (12, "merge merge posting posting", "mergePostingSegments"),  # dup terms
]


def _ident(rng: np.random.Generator) -> str:
    """Random identifier: camelCase or snake_case over the vocabulary."""
    n = int(rng.integers(2, 4))
    parts = [_VERBS[int(rng.integers(len(_VERBS)))]] + [
        _WORDS[int(rng.integers(len(_WORDS)))] for _ in range(n - 1)
    ]
    if rng.random() < 0.5:
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    return "_".join(parts)


def gen_doc(seed: int, i: int) -> dict:
    """Pure function (seed, doc index) → document row (counter-based RNG)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, i]))
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_W))]
    repo = f"org{i % 7}/proj{i % 23}"
    module = _WORDS[int(rng.integers(len(_WORDS)))]
    fname = _ident(rng).replace("_", "")
    path = f"src/{module}/{fname}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()

    kw = {
        "python": ("def", "return", "class"),
        "java": ("void", "return", "class"),
        "go": ("func", "return", "struct"),
        "js": ("function", "return", "class"),
        "c": ("static", "return", "struct"),
    }[lang]
    cmt = {"python": "#", "java": "//", "go": "//", "js": "//", "c": "//"}[lang]

    lines: list[str] = [f"{cmt} module {module} in {repo}"]
    n_funcs = int(rng.integers(2, 7))
    for _ in range(n_funcs):
        name = _ident(rng)
        args = ", ".join(_ident(rng) for _ in range(int(rng.integers(0, 3))))
        lines.append(f"{kw[0]} {name}({args}):")
        n_body = int(rng.integers(2, 9))
        for _ in range(n_body):
            if rng.random() < 0.25:
                words = " ".join(
                    _COMMENT_WORDS[int(rng.integers(len(_COMMENT_WORDS)))]
                    for _ in range(int(rng.integers(3, 9)))
                )
                lines.append(f"    {cmt} {words}")
            else:
                lhs, rhs = _ident(rng), _ident(rng)
                lines.append(f"    {lhs} = {rhs}({_ident(rng)})")
        lines.append(f"    {kw[1]} {_ident(rng)}")

    if i % 2 == 0:
        lines.append(f"{cmt} uses {SKEW_TERM} for reuse")
    for ident, mod, res in PLANTED:
        if i % mod == res:
            lines.append(f"{kw[0]} {ident}(): {kw[1]} {_ident(rng)}")

    content = "\n".join(lines)
    return {
        "doc_id": i,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


CORPUS_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def corpus(spark: SparkSession, n_docs: int, seed: int = SEED,
           partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` source files.

    ``doc_id`` is the generation index — already dense and deterministic,
    equivalent to the pinned ``row_number() OVER (ORDER BY repo, path,
    commit)`` rule without paying a global sort.
    """
    parts = partitions or max(8, n_docs // 25_000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([gen_doc(seed, int(i)) for i in pdf["id"]])

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(qid, text) for qid, text, _ in QUERY_SET],
        "query_id long, query_text string",
    )


def qrels_df(spark: SparkSession, n_docs: int) -> DataFrame:
    """Exact relevance from the placement rules (no scan needed)."""
    rows = [
        (qid, doc, 1)
        for qid, _, ident in QUERY_SET
        if ident is not None
        for (pid, mod, res) in PLANTED
        if pid == ident
        for doc in range(res, n_docs, mod)
    ]
    return spark.createDataFrame(rows, "query_id long, doc_id long, relevance int")


def verify_sha256(docs: DataFrame) -> int:
    """Per-row content invariant (input_hint): returns # of mismatching rows."""
    return docs.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
