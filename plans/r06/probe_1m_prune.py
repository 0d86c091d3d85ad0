"""At-scale (1M-doc positions) evidence for the conjunctive block skip:
skip stats + block_prune on/off wall A/B on the smoke index."""
import sys, time, os
sys.path.insert(0, "/root/repo")
from instructor_embedding_spark.session import get_spark
from instructor_embedding_spark.shipping import ensure_shipped
from instructor_embedding_spark.query import phrase

spark = get_spark(app_name="probe1m", master="local[32]",
                  shuffle_partitions=32)
ensure_shipped(spark, "/root/repo/.runtime")
pos = spark.read.parquet(
    "/root/repo/.runtime/smoke_phrase_idx_1000000/positions")

qv = [(1, "zqxprobe zqxband"), (2, "merge sort"),
      (3, "parse varint block header")]
print("loadavg", [round(x, 2) for x in os.getloadavg()])
for r in phrase.conjunctive_skip_stats(pos, qv).orderBy("phrase_id").collect():
    print(f"phrase {r.phrase_id}: any={r.blocks_with_any_term} "
          f"conj={r.blocks_conjunctive}")

def t(label, fn, reps=3):
    fn()
    best = min((lambda t0=time.monotonic(): (fn(), time.monotonic()-t0)[1])()
               for _ in range(reps))
    print(f"{label:45s} {best:6.3f} s", flush=True)

t("phrase_topk 1M (kernel skip only)",
  lambda: phrase.phrase_topk(spark, pos, qv, k=100).collect())
t("phrase_topk 1M (block_prune=True)",
  lambda: phrase.phrase_topk(spark, pos, qv, k=100,
                             block_prune=True).collect())
a = sorted(tuple(r) for r in phrase.phrase_topk(spark, pos, qv, k=100).collect())
b = sorted(tuple(r) for r in phrase.phrase_topk(spark, pos, qv, k=100, block_prune=True).collect())
print("identical:", a == b, "rows:", len(a))
