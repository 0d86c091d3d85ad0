"""instructor_embedding_spark — a PySpark-native inverted-index + BM25 top-k
query engine with the query/analytics capabilities of
xlang-ai/instructor-embedding, re-expressed Spark-first.

The reference (/root/reference, read-only) is an instruction-conditioned
embedding model plus an MTEB-style retrieval/eval harness.  What this package
grafts is its *query semantics and data model* — corpus/queries/qrels,
chunked corpus scan + per-chunk top-k + merge (RetrievalEvaluator.py:121-197),
ranking metrics (RetrievalEvaluator.py:200-266), pairwise/classification/
clustering analytics — over a lexical (Okapi BM25) scoring function so results
are exactly reproducible without a neural model.

Layout
------
functions/   tokenizer (code-aware), posting codec, text-stats expressions
index/       inverted-index build pipeline (checkpointed, lineage-tracked)
query/       brute-force BM25 oracle + block-max WAND engine
metrics/     nDCG / MRR / MAP / P@k / R@k as grouped aggregations
analytics/   dedup (exact/minhash/simhash/jaccard), similarity search,
             threshold sweep, spearman, kNN — training-data-pipeline ops
multimodal/  binary-column plumbing (decode stubs, real Spark plumbing)
datagen.py   deterministic Iceberg-shaped source-code corpus + queries + qrels
"""

__version__ = "0.1.0"
