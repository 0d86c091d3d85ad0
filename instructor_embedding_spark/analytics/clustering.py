"""Clustering evaluation: k-means + V-measure (reference M12/A11).

Reference: ClusteringEvaluator.py:102-109 fits MiniBatchKMeans with
n_clusters = #labels and scores ``v_measure_score(labels, cluster_assignment)``.
Here: ``pyspark.ml.clustering.KMeans`` (seeded) for assignment, and
V-measure as pure grouped entropy aggregations over the (label, cluster)
contingency table — no sklearn:

  h = 1 - H(C|K)/H(C),  c = 1 - H(K|C)/H(K),  v = 2hc/(h+c)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def kmeans_assign(embeddings: DataFrame, k: int, seed: int = 42,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, label, cluster) via seeded pyspark.ml KMeans."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col("label"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feat)
    return model.transform(feat).select(
        "vec_id", "label", F.col("prediction").cast("long").alias("cluster")
    )


#: Lloyd iterations for the deterministic k-means (pinned; the DuckDB twin
#: unrolls exactly this many assignment+recenter CTE pairs).
LLOYD_ITERS = 3
#: Rounding applied each step so partition-order float-sum differences
#: between engines can never flip an assignment.
DIST_DECIMALS = 6
CENTROID_DECIMALS = 9
#: Recentering quantum: per-dimension values are quantized to integers
#: (round(v * QUANT)) before the grouped sum, so the reduction is an EXACT
#: integer sum — order-free, hence identical regardless of partition count
#: or combiner order on either engine.  The mean is then one double
#: division + one round, both single ops with no order dependence.
CENTROID_QUANT = 10 ** 6


#: Above this many centroids the literal-expression assignment (k structs
#: × dim terms each) becomes a 10^5-node plan that blows up codegen and
#: driver heap — measured: the IVF coarse quantizer at derived cells=512
#: (20k vectors) OOMed an 8g driver.  Large k dispatches to the
#: vectorized Arrow kernel below, which computes the SAME left-assoc
#: float64 sums and half-away rounding, so assignments are identical.
LLOYD_EXPR_MAX_K = 64


def lloyd_choice_array(cents: list[tuple[int, list[float]]],
                       dist_decimals: int = DIST_DECIMALS):
    """Array column of (rounded squared L2 dist, cluster id) structs over a
    ``v`` double-array column — lexicographic order = (dist, id).

    Rounding is the SHARED floor(x·10^d + 0.5)/10^d rule — the identical
    IEEE op sequence (multiply, add, floor, divide) the Arrow kernel and
    the DuckDB twin use — not F.round (HALF_UP over the double's shortest
    decimal repr), whose result can differ on representation-boundary
    values and flip an argmin between the small-k and large-k paths."""
    scale = float(10 ** dist_decimals)
    choices = []
    for cid, c in cents:
        # explicit left-assoc sum of (v[d]-c_d)^2 — bit-identical to the
        # zip_with/aggregate fold but inside whole-stage codegen (Spark
        # interprets higher-order functions per element)
        dist_expr = None
        for d, x in enumerate(c):
            t = (F.col("v")[d] - F.lit(float(x))) * (
                F.col("v")[d] - F.lit(float(x))
            )
            dist_expr = t if dist_expr is None else dist_expr + t
        # floor(double) → BIGINT: exact for |x·scale| < 2^53, same as the
        # float64 kernel (squared dists here are ~10^3, nowhere near it)
        dist = (
            F.floor(dist_expr * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
        )
        choices.append(F.struct(dist.alias("d"), F.lit(cid).alias("c")))
    return F.array(*choices)


def _lloyd_dist_matrix(cents: list[tuple[int, list[float]]]):
    """(cids int64 array, kernel(V) -> rounded squared-distance matrix).

    The kernel accumulates (V[:,d] - C[:,d])² one dimension at a time, so
    each (row, cell) sum is the LEFT-ASSOCIATIVE float64 fold — bit-equal
    to the expression path's explicit chain and to DuckDB's list_sum —
    then rounds via floor(x·10^d + 0.5)/10^d, the ONE rule shared with
    lloyd_choice_array and the DuckDB twin's dist expression (half-up;
    distances are non-negative so this equals half-away-from-zero)."""
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    scale = 10.0 ** DIST_DECIMALS

    def dists(V):
        acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
        for d in range(C.shape[1]):
            diff = V[:, d, None] - C[None, :, d]
            acc += diff * diff
        return np.floor(acc * scale + 0.5) / scale

    return cids, dists


def _lloyd_assign_arrow(pts: DataFrame,
                        cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Large-k assignment: one Arrow-batched kernel instead of a k×dim
    literal expression tree.  np.argmin's first-match tie rule equals the
    (dist ASC, cluster ASC) order because centroid columns are sorted by
    cluster id."""

    cids, dists = _lloyd_dist_matrix(cents)
    assert all(cids[i] < cids[i + 1] for i in range(len(cids) - 1))

    @F.pandas_udf("long")
    def assign(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.to_numpy())
        return pd.Series(cids[np.argmin(dists(V), axis=1)])

    return pts.withColumn("cluster", assign(F.col("v")))


def _lloyd_assign(pts: DataFrame, cents: list[tuple[int, list[float]]],
                  dist_decimals: int = DIST_DECIMALS) -> DataFrame:
    """Add ``cluster`` = argmin_j round(||v - c_j||², d) with ties broken by
    cluster id — centroids are driver-side constants broadcast either as
    literal arrays (small k: pure narrow column expression inside codegen)
    or inside an Arrow kernel (k > LLOYD_EXPR_MAX_K: same sums, same
    rounding, same tie-break — parity-tested)."""
    if len(cents) > LLOYD_EXPR_MAX_K:
        return _lloyd_assign_arrow(pts, cents)
    # array_min over (dist, cluster) structs = lexicographic argmin
    return pts.withColumn(
        "cluster",
        F.array_min(lloyd_choice_array(cents, dist_decimals))
        .getField("c").cast("long"),
    )


def lloyd_probe_cells(pts: DataFrame,
                      cents: list[tuple[int, list[float]]],
                      nprobe: int) -> DataFrame:
    """(vec_id, cluster) — each vector's ``nprobe`` nearest cells in
    (rounded dist ASC, cluster ASC) order, the IVF probe set.  Small k
    sorts the literal choice array; large k uses the Arrow kernel with a
    stable argsort (ties keep ascending-cid column order)."""
    if len(cents) <= LLOYD_EXPR_MAX_K:
        return pts.select(
            "vec_id",
            F.explode(
                F.slice(F.array_sort(lloyd_choice_array(cents)), 1, nprobe)
            ).alias("ch"),
        ).select("vec_id", F.col("ch.c").cast("long").alias("cluster"))


    cids, dists = _lloyd_dist_matrix(cents)

    @F.pandas_udf("array<long>")
    def probe(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.to_numpy())
        order = np.argsort(dists(V), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cids[order]))

    return pts.select(
        "vec_id", F.explode(probe(F.col("v"))).alias("cluster")
    )


def kmeans_lloyd(embeddings: DataFrame, k: int, iters: int = LLOYD_ITERS,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """(vec_id, label, cluster) — fully DETERMINISTIC Lloyd's k-means,
    expressible identically in any engine (M12 inside the oracle gate —
    reference ClusteringEvaluator.py:102-109 fits MiniBatchKMeans; the
    iterative fit is made engine-reproducible by pinning every source of
    nondeterminism):

    - init: the first k vectors in md5(vec_id) order (seeded shuffle)
    - exactly ``iters`` assignment→recenter rounds
    - distances rounded to 6dp before argmin (ties → smallest cluster id),
      centroids rounded to 9dp — so float-sum partition-order differences
      between engines cannot flip a decision
    - a cluster that empties keeps no row (next assignment runs over the
      surviving centroids), matching the SQL twin's inner join semantics

    Distributed shape: assignment is a narrow column expression over
    broadcast literal centroids; recentering is one groupBy over k*dim
    cells — per iteration one small shuffle, no crossJoin."""
    pts = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cents = lloyd_centroids(pts, k=k, iters=iters, dim=dim)
    return _lloyd_assign(pts, cents).select("vec_id", "label", "cluster")


def lloyd_centroids(pts: DataFrame, k: int, iters: int = LLOYD_ITERS,
                    dim: int = 64) -> list[tuple[int, list[float]]]:
    """Run the deterministic Lloyd iterations over a (vec_id, v) frame and
    return the final [(cluster_id, centroid)] list — also the coarse
    quantizer trainer for the IVF ANN index."""
    # global sort + limit → TakeOrderedAndProject (per-partition top-k then
    # driver merge — no full shuffle even at 10^9 rows)
    seed_rows = (
        pts.select("vec_id", "v")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .collect()
    )
    cents: list[tuple[int, list[float]]] = [
        (i, list(r["v"])) for i, r in enumerate(seed_rows)
    ]
    for _ in range(iters):
        assign = _lloyd_assign(pts, cents)
        # quantize → exact integer sum → one division + one round: the
        # reduction is order-free, so a different partition count (or a
        # different engine's combiner order) can never flip a centroid
        # digit — the mean itself, not just the rounded mean, is pinned
        cell_rows = (
            assign.select("cluster", F.posexplode("v").alias("i", "val"))
            .groupBy("cluster", "i")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("val") * CENTROID_QUANT, 0)
                        .cast("long")
                    ).cast("double")
                    / (F.count(F.lit(1)) * float(CENTROID_QUANT)),
                    CENTROID_DECIMALS,
                ).alias("m")
            )
            .collect()  # k*dim cells — bounded by k, not by data size
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cell_rows:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["i"])] = float(
                r["m"]
            )
        cents = [
            (cid, [cells[i] for i in range(dim)])
            for cid, cells in sorted(by_cluster.items())
        ]
    return cents


def kmeans_lloyd_sql(table: str, k: int, iters: int = LLOYD_ITERS,
                     dim: int = 64, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     label_col: str = "label") -> str:
    """DuckDB twin of :func:`kmeans_lloyd`: the fixed iteration count is
    unrolled as CTE pairs (assign_t, cent_{t+1}); yields
    (vec_id, label, cluster)."""
    parts, _ = lloyd_ctes_sql(table, k, iters, dim, id_col, vec_col,
                              label_col)
    ctes = ",\n".join(parts)
    return (
        f"WITH {ctes}\n"
        f"SELECT vid AS vec_id, label, CAST(cluster AS BIGINT) AS cluster "
        f"FROM a{iters}"
    )


def lloyd_ctes_sql(table: str, k: int, iters: int = LLOYD_ITERS,
                   dim: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   label_col: str = "label",
                   k_expr: str | None = None) -> tuple[list[str], str]:
    """The unrolled Lloyd CTE chain, reusable by downstream oracles (the
    IVF ANN twin probes c{iters} / a{iters}).  Returns (cte_parts,
    dist_expr) where dist_expr references aliases p (points) and c
    (centroids).  ``k_expr`` (a scalar SQL expression) overrides the
    literal seed limit — how the IVF twin derives its cell count from
    count(*) inside the static SQL."""
    # same floor(x·10^d + 0.5)/10^d rule as lloyd_choice_array and
    # _lloyd_dist_matrix — ONE rounding formula across both engines and
    # both Spark paths (r4 ADVICE: F.round vs floor could disagree on
    # representation-boundary distances)
    dist = (
        "(floor(list_sum(list_transform(range(1, {dim} + 1), "
        "i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i]))) * {sc} + 0.5) / {sc})"
    ).format(dim=dim, sc=float(10 ** DIST_DECIMALS))
    assign_tpl = """
a{t} AS (
  SELECT vid, label, v, cl AS cluster FROM (
    SELECT p.vid, p.label, p.v, c.cluster AS cl,
           row_number() OVER (
             PARTITION BY p.vid ORDER BY {dist} ASC, c.cluster ASC
           ) AS rn
    FROM pts p CROSS JOIN c{t} c
  ) WHERE rn = 1
)"""
    recenter_tpl = """
c{next} AS (
  SELECT cluster, list(m ORDER BY i) AS c FROM (
    SELECT cluster, i,
           round(CAST(sum(CAST(round(v[i] * {q}) AS BIGINT)) AS DOUBLE)
                 / (count(*) * {q}.0), {cd}) AS m
    FROM a{t} CROSS JOIN (SELECT unnest(range(1, {dim} + 1)) AS i)
    GROUP BY cluster, i
  ) GROUP BY cluster
)"""
    parts = [
        f"""pts AS (
  SELECT {id_col} AS vid, {label_col} AS label,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
)""",
        f"""seed AS (
  SELECT v, row_number() OVER (
    ORDER BY md5(CAST(vid AS VARCHAR)), vid) AS rn
  FROM pts
)""",
        f"c0 AS (SELECT rn - 1 AS cluster, v AS c FROM seed "
        f"WHERE rn <= {k_expr if k_expr is not None else k})",
    ]
    for t in range(iters):
        parts.append(assign_tpl.format(t=t, dist=dist))
        if t < iters - 1:
            parts.append(
                recenter_tpl.format(
                    next=t + 1, t=t, cd=CENTROID_DECIMALS, dim=dim,
                    q=CENTROID_QUANT,
                )
            )
    # final assignment uses the centroids AFTER the last recenter, matching
    # kmeans_lloyd's trailing _lloyd_assign
    parts.append(
        recenter_tpl.format(next=iters, t=iters - 1, cd=CENTROID_DECIMALS,
                            dim=dim, q=CENTROID_QUANT)
    )
    parts.append(assign_tpl.format(t=iters, dist=dist))
    return parts, dist


def logreg_ml_classify(embeddings: DataFrame, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """(accuracy, n_test) — seeded pyspark.ml LogisticRegression (M11:
    ClassificationEvaluator.py:304-336 sklearn LogisticRegression).
    Train = even ids, test = odd ids (same split as knn_classify).

    The L-BFGS fit's float reduction order is engine-internal, so this
    variant has no SQL twin; :func:`logreg_classify` is the
    deterministic gradient-descent formulation that does."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    train = feat.filter(F.col("vid") % 2 == 0)
    test = feat.filter(F.col("vid") % 2 == 1)
    model = LogisticRegression(maxIter=50, regParam=0.01).fit(train)
    pred = model.transform(test)
    return pred.agg(
        F.round(
            F.avg((F.col("prediction") == F.col("label")).cast("double")), 6
        ).alias("accuracy"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
    )


#: Deterministic logistic-regression GD hyperparameters (pinned; the
#: DuckDB twin unrolls exactly LOGREG_ITERS weight-update CTE pairs).
LOGREG_ITERS = 4
LOGREG_LR = 50.0
#: Probability / feature quantum: sigmoid outputs are quantized to
#: round(p * QUANT) integers and features to round(v * QUANT) integers, so
#: every per-dimension gradient reduction is an EXACT integer sum —
#: order-free across partitions and engines (same discipline as
#: CENTROID_QUANT above).
LOGREG_QUANT = 10 ** 6


def _logreg_z(w: list[float]):
    """Left-assoc fold Σ_d w_d * ve[d] over the bias-extended feature
    array — the same sequential order DuckDB's list_sum uses, so per-row
    logits agree to the ulp (then pq rounding absorbs the ulp)."""
    z = None
    for d, wd in enumerate(w):
        t = F.lit(float(wd)) * F.col("ve")[d]
        z = t if z is None else z + t
    return z


def logreg_classify(embeddings: DataFrame, iters: int = LOGREG_ITERS,
                    lr: float = LOGREG_LR, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """(accuracy, n_test) — DETERMINISTIC full-batch gradient-descent
    logistic regression, expressible identically in any engine (M11
    inside the oracle gate; reference ClassificationEvaluator.py:304-336
    fits sklearn LogisticRegression — the iterative fit is made
    engine-reproducible the same way :func:`kmeans_lloyd` pins Lloyd's):

    - binary target y = label % 2; train = even ids, test = odd ids
    - features = embedding doubles with a constant-1.0 bias slot appended
      (``ve``); gradient features are the quantized integers
      ``vqe = round(ve * QUANT)``
    - w init = zeros; exactly ``iters`` rounds of
      ``w -= lr * avg((p - y) * x)`` with p quantized to
      ``pq = round(sigmoid(z) * QUANT)`` so the per-dim gradient numerator
      ``sum((pq - y*QUANT) * vqe[d])`` is an exact integer sum
      (order-free), and weights rounded to 9dp each round
    - accuracy = share of test rows where (pq >= QUANT/2) == (y == 1)

    Note: the sandbox's synthetic embedding labels carry no linear signal
    (nearest-centroid multiclass ≈ chance), so accuracy ≈ 0.5 here by
    construction — the driver gate checks Spark↔DuckDB parity of the full
    GD trajectory; that the optimizer genuinely descends is unit-tested
    on a planted linearly-separable fixture (tests/test_analytics.py).

    Distributed shape: each round is ONE narrow map (logit fold over
    broadcast literal weights) + one groupBy over dim+1 cells — the
    gradient state is O(dim), never O(n), exactly the shape a
    1000-executor full-batch GD would use."""
    Q = LOGREG_QUANT
    spark = embeddings.sparkSession
    pts = embeddings.select(
        F.col(id_col).alias("vid"),
        (F.col(label_col) % 2).cast("long").alias("y"),
        F.concat(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.array(F.lit(1.0)),
        ).alias("ve"),
    ).withColumn(
        "vqe",
        F.transform(F.col("ve"),
                    lambda x: F.round(x * Q, 0).cast("long")),
    )
    train = pts.filter(F.col("vid") % 2 == 0).cache()
    n_train = train.count()
    nn = float(n_train) * Q * Q  # exact: n ≤ 2^53 / 10^12

    w = [0.0] * (dim + 1)
    for _ in range(iters):
        scored = train.withColumn(
            "pq",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w))) * Q,
                    0).cast("long"),
        ).withColumn("resid", F.col("pq") - F.col("y") * Q)
        cells = (
            scored.select("resid", F.posexplode("vqe").alias("i", "vq"))
            .groupBy("i")
            .agg(F.sum(F.col("resid") * F.col("vq")).alias("s"))
            .collect()  # dim+1 cells — bounded by dim, not data size
        )
        s = {int(r["i"]): int(r["s"]) for r in cells}
        # the update arithmetic + 9dp rounding runs INSIDE the engine
        # (one-row job) so both engines use their own native round on the
        # same exact inputs — mirrors the recenter discipline above
        row = spark.range(1).select(*[
            F.round(
                F.lit(float(w[d])) - F.lit(float(lr)) * F.lit(s[d]) / nn, 9
            ).alias(f"w{d}")
            for d in range(dim + 1)
        ]).collect()[0]
        w = [float(row[f"w{d}"]) for d in range(dim + 1)]

    test = pts.filter(F.col("vid") % 2 == 1).withColumn(
        "pq",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w))) * Q,
                0).cast("long"),
    )
    out = test.agg(
        F.round(
            F.avg(((F.col("pq") >= Q // 2) == (F.col("y") == 1))
                  .cast("double")), 6
        ).alias("accuracy"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
    )
    train.unpersist()
    return out


def logreg_classify_sql(table: str, iters: int = LOGREG_ITERS,
                        lr: float = LOGREG_LR, dim: int = 64,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label") -> str:
    """DuckDB twin of :func:`logreg_classify`: the fixed iteration count
    is unrolled as (p_t, g_t, w_{t+1}) CTE triples; yields
    (accuracy, n_test)."""
    Q = LOGREG_QUANT
    d1 = dim + 1
    z = (
        "list_sum(list_transform(range(1, {d1} + 1), "
        "i -> w.w[i] * p.ve[i]))"
    ).format(d1=d1)
    pq = f"CAST(round(1.0 / (1.0 + exp(-({z}))) * {Q}) AS BIGINT)"
    parts = [
        f"""pts AS (
  SELECT {id_col} AS vid, CAST({label_col} % 2 AS BIGINT) AS y,
         list_append(list_transform({vec_col}, x -> CAST(x AS DOUBLE)),
                     1.0) AS ve
  FROM {table}
)""",
        """q AS (
  SELECT vid, y, ve,
         list_transform(ve, x -> CAST(round(x * {Q}) AS BIGINT)) AS vqe
  FROM pts
)""".format(Q=Q),
        "train AS (SELECT * FROM q WHERE vid % 2 = 0)",
        f"nn AS (SELECT count(*) * {float(Q) * Q} AS nn FROM train)",
        f"""w0 AS (
  SELECT list_transform(range(1, {d1} + 1), i -> 0.0) AS w
)""",
    ]
    for t in range(iters):
        parts.append(f"""
p{t} AS (
  SELECT p.y, p.vqe, {pq} AS pq
  FROM train p CROSS JOIN w{t} w
)""")
        parts.append(f"""
g{t} AS (
  SELECT i, sum((pq - y * {Q}) * vqe[i]) AS s
  FROM p{t} CROSS JOIN (SELECT unnest(range(1, {d1} + 1)) AS i)
  GROUP BY i
)""")
        parts.append(f"""
w{t + 1} AS (
  SELECT list(round(w_el - {float(lr)} * s / nn, 9) ORDER BY i) AS w
  FROM (
    SELECT g.i, w.w[g.i] AS w_el, CAST(g.s AS DOUBLE) AS s, t.nn AS nn
    FROM g{t} g CROSS JOIN w{t} w CROSS JOIN nn t
  )
)""")
    parts.append(f"""
ptest AS (
  SELECT p.y, {pq} AS pq
  FROM (SELECT * FROM q WHERE vid % 2 = 1) p CROSS JOIN w{iters} w
)""")
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT round(avg(CASE WHEN (pq >= {Q // 2}) = (y = 1)
                      THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
       CAST(count(*) AS BIGINT) AS n_test
FROM ptest"""


def v_measure(assignments: DataFrame, label_col: str = "label",
              cluster_col: str = "cluster") -> DataFrame:
    """(homogeneity, completeness, v_measure) from (label, cluster) rows —
    entropy over the contingency table (A11).

    ONE Spark action: the distributed part is the groupBy that builds the
    (c, k, n_ck) contingency table — |labels|×|clusters| cells, bounded by
    cardinalities, not data size — which is collected once; the four
    entropies are O(cells) driver-side arithmetic over those exact integer
    counts (deterministic: cells iterated in sorted order).  Under an
    expensive assignment lineage (e.g. the Lloyd chain) this runs the
    lineage once instead of five times."""
    import math

    cells = (
        assignments.select(
            F.col(label_col).alias("c"), F.col(cluster_col).alias("k")
        )
        .groupBy("c", "k")
        .agg(F.count(F.lit(1)).alias("n_ck"))
        .collect()
    )
    n = sum(int(r["n_ck"]) for r in cells)
    if n == 0:
        raise ValueError("empty assignment table")
    ln = float(n)

    joint = sorted((r["c"], r["k"], int(r["n_ck"])) for r in cells)
    by_c: dict = {}
    by_k: dict = {}
    for c, k, n_ck in joint:
        by_c[c] = by_c.get(c, 0) + n_ck
        by_k[k] = by_k.get(k, 0) + n_ck

    h_c = -sum((v / ln) * math.log(v / ln) for _, v in sorted(by_c.items()))
    h_k = -sum((v / ln) * math.log(v / ln) for _, v in sorted(by_k.items()))
    h_c_given_k = -sum(
        (n_ck / ln) * math.log(n_ck / by_k[k]) for c, k, n_ck in joint
    )
    h_k_given_c = -sum(
        (n_ck / ln) * math.log(n_ck / by_c[c]) for c, k, n_ck in joint
    )

    hom = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    com = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = 0.0 if (hom + com) == 0 else 2.0 * hom * com / (hom + com)

    # half-away-from-zero like the DuckDB twin's round(), NOT Python's
    # banker's round (same discipline as metrics.generation)
    from instructor_embedding_spark.functions.rounding import r6

    spark = assignments.sparkSession
    return spark.createDataFrame(
        [(r6(hom), r6(com), r6(v))],
        "homogeneity double, completeness double, v_measure double",
    )


def v_measure_sql(assignments_sql: str, label_col: str = "label",
                  cluster_col: str = "cluster") -> str:
    """DuckDB oracle for the same entropy formulation."""
    return f"""
WITH a AS (
  SELECT {label_col} AS c, {cluster_col} AS k FROM ({assignments_sql})
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM a),
joint AS (SELECT c, k, count(*) AS n_ck FROM a GROUP BY c, k),
by_c AS (SELECT c, sum(n_ck) AS n_c FROM joint GROUP BY c),
by_k AS (SELECT k, sum(n_ck) AS n_k FROM joint GROUP BY k),
ent AS (
  SELECT
    (SELECT -sum((n_c / tot.n) * ln(n_c / tot.n)) FROM by_c, tot) AS h_c,
    (SELECT -sum((n_k / tot.n) * ln(n_k / tot.n)) FROM by_k, tot) AS h_k,
    (SELECT -sum((n_ck / tot.n) * ln(n_ck / by_k.n_k))
     FROM joint JOIN by_k USING (k), tot) AS h_c_given_k,
    (SELECT -sum((n_ck / tot.n) * ln(n_ck / by_c.n_c))
     FROM joint JOIN by_c USING (c), tot) AS h_k_given_c
),
hc AS (
  SELECT
    CASE WHEN h_c = 0 THEN 1.0 ELSE 1.0 - h_c_given_k / h_c END AS hom,
    CASE WHEN h_k = 0 THEN 1.0 ELSE 1.0 - h_k_given_c / h_k END AS com
  FROM ent
)
SELECT round(hom, 6) AS homogeneity,
       round(com, 6) AS completeness,
       round(CASE WHEN hom + com = 0 THEN 0.0
             ELSE 2.0 * hom * com / (hom + com) END, 6) AS v_measure
FROM hc
"""
