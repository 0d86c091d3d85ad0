"""Supplementary benchmarks (guide §1.4): noop-sink isolation of the
declared bench queries plus positions-family skip-rate observability.

``bench.py`` is the FROZEN driver surface; this file carries the extra
measurements OPTIMIZATION_r06.md cites:

    python bench_extra.py            # noop-isolated per-query seconds
    python bench_extra.py --skip-stats
        # conjunctive block prune observability (phrase/proximity):
        # blocks holding ANY query term vs blocks holding ALL terms —
        # what the r6 pre-shuffle prune keeps out of the Arrow kernel

Prints ONE JSON line like the main bench.  Timings use the noop sink so
the computation is measured, not the collect, and each query is labeled
(setJobDescription) for UI attribution.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_extra", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from instructor_embedding_spark.session import get_spark
    from instructor_embedding_spark.shipping import ensure_shipped

    spark = get_spark(
        app_name="ies-bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes":
                    str(4 * 1024 * 1024)},
    )
    ensure_shipped(spark, os.path.join(REPO, ".runtime"))
    mod = _entry_mod()
    out: dict = {"loadavg": [round(x, 2) for x in os.getloadavg()],
                 "sf_dir": SF_DIR, "reps": REPS}

    if "--skip-stats" in sys.argv:
        from instructor_embedding_spark.query import phrase

        handle = mod._index_for(spark, SF_DIR)
        pos = handle.positions(spark)
        stats = {}
        for label, qset in (("phrase", mod.PHRASE_SET),
                            ("proximity", mod.PROXIMITY_SET),
                            ("ordered", mod.ORDERED_PROXIMITY_SET)):
            rows = phrase.conjunctive_skip_stats(pos, qset).collect()
            stats[label] = {
                int(r["phrase_id"]): {
                    "blocks_with_any_term": int(r["blocks_with_any_term"]),
                    "blocks_conjunctive": int(r["blocks_conjunctive"]),
                }
                for r in rows
            }
        out["conjunctive_skip_stats"] = stats
        print(json.dumps({"metric": "positions_skip_stats", **out}))
        return

    names = ("bm25_topk_bruteforce", "bm25_topk_wand", "retrieval_metrics",
             "phrase_topk", "dedup_lsh_pairs", "ann_lsh_cosine_topk")
    fns = {n: mod.queries()[n] for n in names}
    fns["retrieval_metrics"] = mod.bench_retrieval_metrics
    for name in names:  # warm pass (one-off index builds)
        fns[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
    rep_s: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            fns[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            rep_s[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
    out["queries_noop"] = {n: round(min(v), 3) for n, v in rep_s.items()}
    out["query_reps"] = {n: [round(x, 3) for x in v]
                         for n, v in rep_s.items()}
    print(json.dumps({"metric": "bench_extra_noop", **out}))


if __name__ == "__main__":
    main()
