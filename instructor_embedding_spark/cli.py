"""Command-line entry points — the spark-submit surface.

    spark-submit --py-files ies.zip -m ... # or:
    python -m instructor_embedding_spark.cli build  --input DIR --index DIR
    python -m instructor_embedding_spark.cli query  --index DIR --query "..."
    python -m instructor_embedding_spark.cli merge  --sources A B --out DIR
    python -m instructor_embedding_spark.cli reblock --index DIR --out DIR --block-span N
    python -m instructor_embedding_spark.cli datagen --docs N --out DIR

Mirrors the reference's CLI shape (examples/evaluate_model.py — task name +
model args in, JSON out): every command prints one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    from instructor_embedding_spark.session import get_spark
    from instructor_embedding_spark.shipping import ensure_shipped

    spark = get_spark(app_name=f"ies-{args.cmd}", master=args.master)
    ensure_shipped(spark)
    return spark


def cmd_datagen(args) -> dict:
    from instructor_embedding_spark import datagen

    spark = _spark(args)
    datagen.corpus(spark, args.docs, seed=args.seed).write.mode(
        "overwrite"
    ).parquet(args.out)
    return {"cmd": "datagen", "docs": args.docs, "out": args.out}


def cmd_build(args) -> dict:
    from instructor_embedding_spark.index.build import IndexParams, build_index

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.monotonic()
    h = build_index(
        spark, docs, args.index,
        IndexParams(
            doc_block_span=args.block_span,
            n_sub_blocks=args.sub_blocks,
            corpus_fingerprint=args.input,
            store_positions=args.positions,
        ),
        text_col=args.text_col,
    )
    dt = time.monotonic() - t0
    return {
        "cmd": "build", "index": args.index, "n_docs": h.n_docs,
        "avgdl": round(h.avgdl, 4), "seconds": round(dt, 2),
        "docs_per_sec": round(h.n_docs / dt, 1),
    }


def cmd_query(args) -> dict:
    from instructor_embedding_spark.index.build import load_index
    from instructor_embedding_spark.query.phrase import phrase_topk
    from instructor_embedding_spark.query.wand import wand_topk

    spark = _spark(args)
    h = load_index(spark, args.index)
    t0 = time.monotonic()
    if args.phrase:
        if not h.params.store_positions:
            raise SystemExit(
                "index was built without --positions; phrase search "
                "needs the positional side index"
            )
        phrases = [(i + 1, q) for i, q in enumerate(args.query)]
        rows = phrase_topk(
            spark, h.positions(spark), phrases, k=args.k
        ).collect()
        results = [
            {"query_id": r.phrase_id, "rank": r.rank,
             "doc_id": r.doc_id, "matches": r.matches}
            for r in rows
        ]
    else:
        queries = spark.createDataFrame(
            [(i + 1, q) for i, q in enumerate(args.query)],
            "query_id long, query_text string",
        )
        doc_filter = None
        if args.filter_where:
            if not args.filter_parquet:
                raise SystemExit("--filter-where needs --filter-parquet")
            doc_filter = (
                spark.read.parquet(args.filter_parquet)
                .filter(args.filter_where)
                .select("doc_id")
            )
        rows = wand_topk(
            spark, h, queries, k=args.k, doc_filter=doc_filter
        ).collect()
        results = [
            {"query_id": r.query_id, "rank": r.rank,
             "doc_id": r.doc_id, "score": r.score}
            for r in rows
        ]
    dt = time.monotonic() - t0
    return {
        "cmd": "query", "k": args.k, "phrase": bool(args.phrase),
        "seconds": round(dt, 3), "results": results,
    }


def cmd_dedup(args) -> dict:
    from instructor_embedding_spark.analytics import dedup

    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    t0 = time.monotonic()
    if args.method == "exact":
        out = dedup.exact_duplicates(docs, text_col=args.text_col)
    elif args.method == "minhash":
        out = dedup.ngram_jaccard_pairs(
            docs, threshold=args.threshold, text_col=args.text_col
        )
    else:  # simhash
        out = dedup.simhash_pairs(docs, text_col=args.text_col)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    return {
        "cmd": "dedup", "method": args.method, "out": args.out,
        "rows": int(n), "seconds": round(time.monotonic() - t0, 2),
    }


def cmd_merge(args) -> dict:
    from instructor_embedding_spark.index.build import load_index
    from instructor_embedding_spark.index.merge import merge_indexes

    spark = _spark(args)
    handles = [load_index(spark, s) for s in args.sources]
    h = merge_indexes(spark, handles, args.out)
    return {"cmd": "merge", "out": args.out, "n_docs": h.n_docs,
            "sources": len(handles)}


def cmd_reblock(args) -> dict:
    from instructor_embedding_spark.index.build import load_index
    from instructor_embedding_spark.index.reblock import reblock_index

    spark = _spark(args)
    src = load_index(spark, args.index)
    t0 = time.monotonic()
    h = reblock_index(
        spark, src, args.out,
        doc_block_span=args.block_span, n_sub_blocks=args.sub_blocks,
    )
    dt = time.monotonic() - t0
    return {
        "cmd": "reblock", "out": args.out, "n_docs": h.n_docs,
        "from_span": src.params.doc_block_span,
        "to_span": h.params.doc_block_span,
        "seconds": round(dt, 2),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="instructor_embedding_spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("datagen")
    d.add_argument("--docs", type=int, required=True)
    d.add_argument("--seed", type=int, default=42)
    d.add_argument("--out", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--text-col", default="content")
    b.add_argument("--block-span", type=int, default=8192)
    b.add_argument("--sub-blocks", type=int, default=16)
    b.add_argument("--positions", action="store_true",
                   help="also build the positional side index (phrase)")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", action="append", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--phrase", action="store_true",
                   help="exact-adjacency phrase search (needs --positions)")
    q.add_argument("--filter-parquet", default=None,
                   help="metadata parquet carrying doc_id for --filter-where")
    q.add_argument("--filter-where", default=None,
                   help="SQL predicate selecting the candidate whitelist")

    m = sub.add_parser("merge")
    m.add_argument("--sources", nargs="+", required=True)
    m.add_argument("--out", required=True)

    rb = sub.add_parser(
        "reblock",
        help="rewrite an index to a new block geometry without"
             " re-tokenizing (ES shrink/split analog)",
    )
    rb.add_argument("--index", required=True)
    rb.add_argument("--out", required=True)
    rb.add_argument("--block-span", type=int, required=True)
    rb.add_argument("--sub-blocks", type=int, default=None,
                    help="defaults to the source index's value")

    dd = sub.add_parser("dedup")
    dd.add_argument("--input", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--method", choices=("exact", "minhash", "simhash"),
                    default="exact")
    dd.add_argument("--threshold", type=float, default=0.5)
    dd.add_argument("--text-col", default="content")

    args = p.parse_args(argv)
    out = {
        "datagen": cmd_datagen, "build": cmd_build,
        "query": cmd_query, "merge": cmd_merge, "reblock": cmd_reblock,
        "dedup": cmd_dedup,
    }[args.cmd](args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
