"""Datagen: determinism under repartitioning, sha256 invariant, planted terms."""

from __future__ import annotations

from instructor_embedding_spark import datagen
from instructor_embedding_spark.functions.tokenize import tokenize_py


def test_gen_doc_is_pure():
    a = datagen.gen_doc(42, 7)
    b = datagen.gen_doc(42, 7)
    assert a == b
    c = datagen.gen_doc(43, 7)
    assert c["content"] != a["content"]


def test_corpus_partition_invariant(spark):
    one = datagen.corpus(spark, 200, partitions=1).orderBy("doc_id").collect()
    many = datagen.corpus(spark, 200, partitions=13).orderBy("doc_id").collect()
    assert [r.content_sha256 for r in one] == [r.content_sha256 for r in many]


def test_sha256_invariant(spark):
    docs = datagen.corpus(spark, 300, partitions=4)
    assert datagen.verify_sha256(docs) == 0


def test_planted_terms_and_qrels(spark):
    n = 500
    docs = {r.doc_id: r.content for r in datagen.corpus(spark, n).collect()}
    qrels = datagen.qrels_df(spark, n).collect()
    assert len(qrels) > 0
    for r in qrels:
        ident = next(
            i for qid, _, i in datagen.QUERY_SET if qid == r.query_id
        )
        assert ident in docs[r.doc_id], (r, ident)
    # skew term present in exactly the even docs
    skew = [d for d, c in docs.items() if datagen.SKEW_TERM in c]
    assert skew == [d for d in sorted(docs) if d % 2 == 0]


def test_planted_identifier_tokenizes_to_query_terms():
    # query text and planted identifier must map to overlapping term sets
    for qid, text, ident in datagen.QUERY_SET:
        if ident is None:
            continue
        q_terms = set(tokenize_py(text))
        i_terms = set(tokenize_py(ident))
        assert i_terms <= q_terms or i_terms & q_terms, (text, ident)
