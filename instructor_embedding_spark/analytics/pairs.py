"""Pairwise / statistical analytics from the reference's evaluator suite.

- threshold_sweep (W5): PairClassificationEvaluator's best-accuracy /
  best-F1 threshold search (PairClassificationEvaluator.py:156-217) as a
  cumulative-sum window scan.
- average_precision (M8): sklearn.average_precision_score re-expressed as
  the same cumulative formulation (RerankingEvaluator.py:308-324).
- spearman (M6): STSEvaluator.py:95 — rank both sides with a window, then
  Pearson on the ranks (average-rank tie handling, scipy-compatible).
- knn_classify (J6/M10): ClassificationEvaluator.py:183-192 — cosine kNN
  with majority vote, re-expressed as crossJoin + window top-k + mode.

Each op has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.analytics.similarity import (
    _dot,
    _norm,
    _pair_dot_udf,
)


def threshold_sweep(pairs: DataFrame, score_col: str = "score",
                    label_col: str = "label") -> DataFrame:
    """(best_acc, best_acc_threshold, best_f1, best_f1_threshold, ap).

    Reference semantics (PairClassificationEvaluator.py:156-217): sort by
    score DESC; predict positive above each cut between consecutive rows
    (threshold = mean of the two scores); accuracy/F1 from running
    positives.  AP per the cumulative precision formulation."""
    n_row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col)).alias("n_pos"),
    ).collect()[0]
    n, n_pos = int(n_row["n"]), int(n_row["n_pos"])

    # (score DESC, label ASC): relevant-last within ties makes the
    # cumulative AP formulation equal sklearn average_precision_score
    w = Window.orderBy(F.col(score_col).desc(), F.col(label_col).asc())
    scanned = (
        pairs.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("long").alias("label"),
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "cum_pos",
            F.sum("label").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("next_score", F.lead("score").over(w))
    )
    # predict positive for rows 1..i; threshold = midpoint of rows i, i+1.
    # The LAST row is never a cut (reference: `for i in range(len(rows)-1)`,
    # PairClassificationEvaluator.py:169, 200); AP uses all rows.  First
    # maximum wins (`>` comparison) → tie-break max_by(metric, -i).
    cuts = scanned.filter(F.col("next_score").isNotNull()).select(
        "i",
        ((F.col("cum_pos") + (n - F.col("i") - (n_pos - F.col("cum_pos"))))
         / float(n)).alias("acc"),
        (2.0 * F.col("cum_pos") / (F.col("i") + n_pos)).alias("f1"),
        ((F.col("score") + F.col("next_score")) / 2.0).alias("thr"),
    )
    best_cuts = cuts.agg(
        F.round(F.max("acc"), 6).alias("best_acc"),
        F.round(
            F.max_by("thr", F.struct(F.col("acc"), -F.col("i"))), 6
        ).alias("best_acc_threshold"),
        F.round(F.max("f1"), 6).alias("best_f1"),
        F.round(
            F.max_by("thr", F.struct(F.col("f1"), -F.col("i"))), 6
        ).alias("best_f1_threshold"),
    )
    ap = scanned.agg(
        F.round(
            F.sum(
                F.when(F.col("label") == 1, F.col("cum_pos") / F.col("i"))
            ) / float(n_pos),
            6,
        ).alias("ap")
    )
    return best_cuts.crossJoin(ap)


def threshold_sweep_sql(pairs_sql: str, score_col: str = "score",
                        label_col: str = "label") -> str:
    return f"""
WITH p AS ({pairs_sql}),
tot AS (SELECT count(*) AS n, sum({label_col}) AS n_pos FROM p),
scanned AS (
  SELECT {score_col} AS score,
         CAST({label_col} AS BIGINT) AS label,
         row_number() OVER (ORDER BY {score_col} DESC, {label_col} ASC) AS i,
         sum({label_col}) OVER (
           ORDER BY {score_col} DESC, {label_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         lead({score_col}) OVER (
           ORDER BY {score_col} DESC, {label_col} ASC) AS next_score
  FROM p
),
cuts AS (
  SELECT i,
         (cum_pos + (tot.n - i - (tot.n_pos - cum_pos))) * 1.0 / tot.n AS acc,
         2.0 * cum_pos / (i + tot.n_pos) AS f1,
         (score + next_score) / 2.0 AS thr
  FROM scanned CROSS JOIN tot
  WHERE next_score IS NOT NULL
),
acc_best AS (
  SELECT round(acc, 6) AS best_acc, round(thr, 6) AS best_acc_threshold
  FROM cuts ORDER BY acc DESC, i ASC LIMIT 1
),
f1_best AS (
  SELECT round(f1, 6) AS best_f1, round(thr, 6) AS best_f1_threshold
  FROM cuts ORDER BY f1 DESC, i ASC LIMIT 1
),
best AS (SELECT * FROM acc_best CROSS JOIN f1_best),
apx AS (
  SELECT round(sum(CASE WHEN label = 1 THEN cum_pos * 1.0 / i END)
               / (SELECT n_pos FROM tot), 6) AS ap
  FROM scanned
)
SELECT * FROM best CROSS JOIN apx
"""


def spearman(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(spearman) — average-rank (fractional) ties, matching scipy."""
    def avg_rank(c: str, out: str):
        # average rank = (rank + (rank + count - 1)) / 2 via min rank + cnt
        w = Window.orderBy(F.col(c))
        return (
            F.rank().over(w)
            + (F.count(F.lit(1)).over(Window.partitionBy(F.col(c))) - 1) / 2.0
        ).alias(out)

    ranked = df.select(avg_rank(x_col, "rx"), avg_rank(y_col, "ry"))
    return ranked.agg(F.round(F.corr("rx", "ry"), 6).alias("spearman"))


def spearman_sql(inner_sql: str, x_col: str, y_col: str) -> str:
    return f"""
WITH d AS ({inner_sql}),
r AS (
  SELECT
    rank() OVER (ORDER BY {x_col})
      + (count(*) OVER (PARTITION BY {x_col}) - 1) / 2.0 AS rx,
    rank() OVER (ORDER BY {y_col})
      + (count(*) OVER (PARTITION BY {y_col}) - 1) / 2.0 AS ry
  FROM d
)
SELECT round(corr(rx, ry), 6) AS spearman FROM r
"""


def corr_both(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(pearson, spearman) in ONE aggregation pass — M5 + M6 together
    (reference STSEvaluator reports both on the same score pairs)."""
    def avg_rank(c: str, out: str):
        w = Window.orderBy(F.col(c))
        return (
            F.rank().over(w)
            + (F.count(F.lit(1)).over(Window.partitionBy(F.col(c))) - 1) / 2.0
        ).alias(out)

    ranked = df.select(
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        avg_rank(x_col, "rx"), avg_rank(y_col, "ry"),
    )
    return ranked.agg(
        F.round(F.corr("x", "y"), 6).alias("pearson"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman"),
    )


def corr_both_sql(inner_sql: str, x_col: str, y_col: str) -> str:
    return f"""
WITH d AS ({inner_sql}),
r AS (
  SELECT CAST({x_col} AS DOUBLE) AS x, CAST({y_col} AS DOUBLE) AS y,
    rank() OVER (ORDER BY {x_col})
      + (count(*) OVER (PARTITION BY {x_col}) - 1) / 2.0 AS rx,
    rank() OVER (ORDER BY {y_col})
      + (count(*) OVER (PARTITION BY {y_col}) - 1) / 2.0 AS ry
  FROM d
)
SELECT round(corr(x, y), 6) AS pearson,
       round(corr(rx, ry), 6) AS spearman
FROM r
"""


def knn_classify(embeddings: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """(accuracy, n_test) — cosine kNN majority vote; train = even ids,
    test = odd ids (deterministic split).  Vote ties break toward the
    smaller label (pinned)."""
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.col(label_col).alias("label"),
    ).withColumn("n", _norm(F.col("v")))
    train = e.filter(F.col("vid") % 2 == 0).select(
        F.col("vid").alias("tid"), F.col("v").alias("tv"),
        F.col("n").alias("tn"), F.col("label").alias("tlabel"),
    )
    test = e.filter(F.col("vid") % 2 == 1).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"),
        F.col("n").alias("qn"), F.col("label").alias("qlabel"),
    )
    scored = test.crossJoin(train).select(
        "qid", "qlabel", "tid", "tlabel",
        (_pair_dot_udf(F.col("qv"), F.col("tv"))
         / (F.col("qn") * F.col("tn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("tid").asc()
    )
    topk = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    votes = topk.groupBy("qid", "qlabel", "tlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col("tlabel").asc()
    )
    pred = votes.withColumn("rv", F.row_number().over(wv)).filter(
        F.col("rv") == 1
    )
    return pred.agg(
        F.round(
            F.avg((F.col("tlabel") == F.col("qlabel")).cast("double")), 6
        ).alias("accuracy"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
    )


def knn_classify_lsh(embeddings: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     label_col: str = "label", dim: int = 64,
                     planes_per_table: int | None = None,
                     n_tables: int = 8,
                     n: int | None = None,
                     bucket_cap: int | None = None) -> DataFrame:
    """(accuracy, n_test) — LSH-bucketed kNN majority vote: the 100-TB
    twin of :func:`knn_classify` (same split/vote/tie semantics), with the
    test×train crossJoin replaced by a self-join on multi-table
    random-hyperplane signatures.  A test point votes only among train
    points it collides with; uncovered test points drop out (n_test counts
    the covered ones).

    Like the ANN default, the bucket join ships IDS ONLY and candidate
    (test, train) pairs de-duplicate before vectors re-join for the
    cosine — multi-table collisions are scored once and the wide payload
    stays out of the T-way shuffle.

    ``planes_per_table`` defaults to the count-derived value (r4: same
    auto-sizing discipline as the ANN family — buckets hold train+test
    together, so the full corpus count is the occupancy denominator);
    pass ``n`` to skip the eager count().

    Buckets above ``bucket_cap`` are dropped before the join (same skew
    guard as the ANN family: a near-constant embedding region would
    otherwise go quadratic); affected test points lose those voters and
    may drop out of coverage — n_test reports what remains."""
    from instructor_embedding_spark.analytics.similarity import (
        LSH_BUCKET_CAP,
        _cosine_sigs_udf,
        derive_planes_per_table,
    )

    if bucket_cap is None:
        bucket_cap = LSH_BUCKET_CAP
    if planes_per_table is None:
        planes_per_table = derive_planes_per_table(
            embeddings.count() if n is None else n
        )

    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.col(label_col).alias("label"),
    ).withColumn("n", _norm(F.col("v")))
    sig_udf = _cosine_sigs_udf(dim, planes_per_table, n_tables)
    e = base.withColumn("sigs", sig_udf(F.col("v"))).select(
        "vid", F.posexplode("sigs").alias("tbl", "sig"),
    )
    # hot-bucket guard: same (tbl, sig) keys the join hashes on
    e = e.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("tbl", "sig"))
    ).filter(F.col("bsz") <= bucket_cap).drop("bsz")
    cand = (
        e.filter(F.col("vid") % 2 == 1)
        .select(F.col("vid").alias("qid"), "tbl", "sig")
        .join(
            e.filter(F.col("vid") % 2 == 0)
            .select(F.col("vid").alias("tid"), "tbl", "sig"),
            ["tbl", "sig"],
        )
        .select("qid", "tid")
        .distinct()
    )
    scored = (
        cand.join(
            base.select(F.col("vid").alias("qid"), F.col("v").alias("qv"),
                        F.col("n").alias("qn"),
                        F.col("label").alias("qlabel")),
            "qid",
        )
        .join(
            base.select(F.col("vid").alias("tid"), F.col("v").alias("tv"),
                        F.col("n").alias("tn"),
                        F.col("label").alias("tlabel")),
            "tid",
        )
        .select(
            "qid", "qlabel", "tid", "tlabel",
            (_pair_dot_udf(F.col("qv"), F.col("tv"))
             / (F.col("qn") * F.col("tn"))).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("tid").asc()
    )
    topk = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    votes = topk.groupBy("qid", "qlabel", "tlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col("tlabel").asc()
    )
    pred = votes.withColumn("rv", F.row_number().over(wv)).filter(
        F.col("rv") == 1
    )
    return pred.agg(
        F.round(
            F.avg((F.col("tlabel") == F.col("qlabel")).cast("double")), 6
        ).alias("accuracy"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
    )


def knn_classify_lsh_sql(table: str, k: int = 5, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label", dim: int = 64,
                         planes_per_table: int | None = None,
                         n_tables: int = 8,
                         bucket_cap: int | None = None) -> str:
    from instructor_embedding_spark.analytics.similarity import (
        LSH_BUCKET_CAP,
        _vq_sql,
        cosine_sig_rows_sql,
        derive_planes_sql,
    )

    if bucket_cap is None:
        bucket_cap = LSH_BUCKET_CAP

    if planes_per_table is None:
        sigs = cosine_sig_rows_sql(
            "vid, v, nrm, label", "n", dim, n_tables=n_tables,
            nbits_expr="(SELECT nbits FROM nb)",
        )
    else:
        sigs = cosine_sig_rows_sql(
            "vid, v, nrm, label", "n", dim, planes_per_table, n_tables
        )
    return f"""
WITH e AS (
  SELECT {id_col} AS vid,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v,
         {label_col} AS label
  FROM {table}
),
nb AS (
  SELECT {derive_planes_sql('count(*)')} AS nbits FROM e
),
n AS (
  SELECT vid, v, label,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
         {_vq_sql('v')} AS vq
  FROM e
),
sigs AS ({sigs}),
capped AS (
  SELECT * FROM sigs
  QUALIFY count(*) OVER (PARTITION BY tbl, sig) <= {bucket_cap}
),
scored AS (
  SELECT DISTINCT q.vid AS qid, q.label AS qlabel,
         t.vid AS tid, t.label AS tlabel,
         list_sum(list_transform(range(1, len(q.v) + 1),
                                 i -> q.v[i] * t.v[i]))
           / (q.nrm * t.nrm) AS cos_raw
  FROM capped q JOIN capped t ON q.tbl = t.tbl AND q.sig = t.sig
  WHERE q.vid % 2 = 1 AND t.vid % 2 = 0
),
topk AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, tid ASC) AS r
  FROM scored
),
votes AS (
  SELECT qid, qlabel, tlabel, count(*) AS votes
  FROM topk WHERE r <= {k} GROUP BY qid, qlabel, tlabel
),
pred AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY votes DESC, tlabel ASC) AS rv
  FROM votes
)
SELECT round(avg(CASE WHEN tlabel = qlabel THEN 1.0 ELSE 0.0 END), 6)
         AS accuracy,
       CAST(count(*) AS BIGINT) AS n_test
FROM pred WHERE rv = 1
"""


def knn_classify_sql(table: str, k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label") -> str:
    return f"""
WITH e AS (
  SELECT {id_col} AS vid,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v,
         {label_col} AS label
  FROM {table}
),
n AS (
  SELECT vid, v, label,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
),
scored AS (
  SELECT q.vid AS qid, q.label AS qlabel, t.vid AS tid, t.label AS tlabel,
         list_sum(list_transform(range(1, len(q.v) + 1),
                                 i -> q.v[i] * t.v[i]))
           / (q.nrm * t.nrm) AS cos_raw
  FROM n q, n t
  WHERE q.vid % 2 = 1 AND t.vid % 2 = 0
),
topk AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY round(cos_raw, 6) DESC, tid ASC) AS r
  FROM scored
),
votes AS (
  SELECT qid, qlabel, tlabel, count(*) AS votes
  FROM topk WHERE r <= {k} GROUP BY qid, qlabel, tlabel
),
pred AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY votes DESC, tlabel ASC) AS rv
  FROM votes
)
SELECT round(avg(CASE WHEN tlabel = qlabel THEN 1.0 ELSE 0.0 END), 6)
         AS accuracy,
       CAST(count(*) AS BIGINT) AS n_test
FROM pred WHERE rv = 1
"""


#: Largest |src|·|tgt| the DEFAULT (exact full-matrix) bitext path will
#: plan — ~the reference's evaluation sizes with headroom; past it the
#: caller must pass candidates= (ANN output) explicitly.
BITEXT_EXACT_MAX_PAIRS = 4_000_000


def bitext_mine(src: DataFrame, tgt: DataFrame, gold: DataFrame,
                vec_col: str = "embedding",
                candidates: DataFrame | None = None) -> DataFrame:
    """(n_pairs, n_correct, accuracy, precision, recall, f1) — bitext
    gold-pair alignment (J5, BitextMiningEvaluator.py:56-68: mine the
    nearest target for every source sentence, grade the mined pair set
    against gold (i, j) pairs).

    ``src``: (a_id, vec_col); ``tgt``: (b_id, vec_col); ``gold``:
    (a_id, b_id).  Prediction = argmax cosine per a_id, tie-broken
    (round(cos, 6) DESC, b_id ASC) like every top-k in the engine (D1).
    Pair-set formulas: tp = |mined ∩ gold|, precision = tp/|mined|
    (mined pairs counted once each — a source with several gold targets
    does not inflate the denominator), recall = accuracy = tp/|gold|,
    F1 = 2·tp/(|mined|+|gold|); on the reference's 1:1 gold sets all
    four coincide (BitextMiningEvaluator reports all of them).

    ``candidates`` ((a_id, b_id), e.g. ANN output) bounds the scored
    pairs; the default scores src × tgt — the reference's full similarity
    matrix, fine for evaluation-sized sets.  At corpus scale pass the
    LSH/IVF candidate set, the same swap every similarity consumer uses;
    above :data:`BITEXT_EXACT_MAX_PAIRS` the default FAILS FAST (two
    cheap counts) instead of silently planning an O(|src|·|tgt|)
    cartesian — an evaluator must not auto-degrade to approximate
    results, so the caller chooses the swap explicitly."""
    a = src.select(
        "a_id",
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("va"),
    ).withColumn("na", _norm(F.col("va")))
    b = tgt.select(
        "b_id",
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vb"),
    ).withColumn("nb", _norm(F.col("vb")))
    if candidates is not None:
        pairs_df = candidates.join(a, "a_id").join(b, "b_id")
    else:
        # The guard makes default construction eager by two COUNT jobs —
        # deliberate (an evaluator must not silently plan a quadratic
        # product), and cheap: the id-only projections column-prune the
        # vector transforms away, so each count is a metadata-ish row
        # scan; the second is skipped when the first side is empty.
        n_src = src.select("a_id").count()
        n_pairs_full = (
            n_src * tgt.select("b_id").count() if n_src else 0
        )
        if n_pairs_full > BITEXT_EXACT_MAX_PAIRS:
            raise ValueError(
                f"bitext_mine default would score {n_pairs_full} pairs "
                f"(> BITEXT_EXACT_MAX_PAIRS={BITEXT_EXACT_MAX_PAIRS}); "
                "pass candidates= (e.g. lsh_cosine_topk / "
                "ivf_cosine_topk output) for corpus-scale mining"
            )
        pairs_df = a.crossJoin(b)
    scored = pairs_df.select(
        "a_id", "b_id",
        (_pair_dot_udf(F.col("va"), F.col("vb"))
         / (F.col("na") * F.col("nb"))).alias("cos_raw"),
    )
    w = Window.partitionBy("a_id").orderBy(
        F.round(F.col("cos_raw"), 6).desc(), F.col("b_id").asc()
    )
    pred = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("a_id", F.col("b_id").alias("pred_b"))
    )
    # PAIR-SET metrics: tp over gold rows (each gold row matches at most
    # one pred row — pred is unique per a_id), precision denominator =
    # |mined pairs| counted ONCE per prediction, not once per gold row —
    # a source with several gold targets must not inflate it
    graded = gold.join(pred, "a_id", "left").select(
        (F.col("pred_b") == F.col("b_id")).cast("int").alias("correct"),
    )
    g = graded.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum("correct"), F.lit(0)).cast("long")
        .alias("n_correct"),
    )
    p = pred.agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    return g.crossJoin(F.broadcast(p)).select(
        "n_pairs",
        "n_correct",
        F.round(F.col("n_correct") / F.col("n_pairs"), 6)
        .alias("accuracy"),
        F.round(F.col("n_correct") / F.col("n_pred"), 6)
        .alias("precision"),
        F.round(F.col("n_correct") / F.col("n_pairs"), 6).alias("recall"),
        F.round(
            2.0 * F.col("n_correct")
            / (F.col("n_pred") + F.col("n_pairs")), 6
        ).alias("f1"),
    )


def bitext_mine_sql(table: str, n: int = 200, offset: int = 200,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`bitext_mine` over the gated fixture shape:
    sources = ids < n, targets = ids in [offset, offset + n), gold pair
    (i, i + offset)."""
    return f"""
WITH e AS (
  SELECT {id_col} AS vid,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
nrm AS (
  SELECT vid, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nr
  FROM e
),
a AS (SELECT vid AS a_id, v AS va, nr AS na FROM nrm WHERE vid < {n}),
b AS (SELECT vid AS b_id, v AS vb, nr AS nb FROM nrm
      WHERE vid >= {offset} AND vid < {offset} + {n}),
scored AS (
  SELECT a.a_id, b.b_id,
         list_sum(list_transform(range(1, len(a.va) + 1),
                                 i -> a.va[i] * b.vb[i]))
           / (a.na * b.nb) AS cos_raw
  FROM a CROSS JOIN b
),
pred AS (
  SELECT a_id, b_id AS pred_b FROM (
    SELECT a_id, b_id, row_number() OVER (
      PARTITION BY a_id ORDER BY round(cos_raw, 6) DESC, b_id ASC) AS r
    FROM scored
  ) WHERE r = 1
),
gold AS (SELECT a_id, a_id + {offset} AS b_id FROM a),
graded AS (
  SELECT g.a_id,
         CASE WHEN p.pred_b = g.b_id THEN 1 ELSE 0 END AS correct
  FROM gold g LEFT JOIN pred p USING (a_id)
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM pred)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(correct) AS BIGINT) AS n_correct,
       round(sum(correct) * 1.0 / count(*), 6) AS accuracy,
       round(sum(correct) * 1.0 / (SELECT n_pred FROM np), 6) AS precision,
       round(sum(correct) * 1.0 / count(*), 6) AS recall,
       round(2.0 * sum(correct) / ((SELECT n_pred FROM np) + count(*)), 6)
         AS f1
FROM graded
"""
