"""Clustering evaluation: k-means + V-measure (reference M12/A11).

Reference: ClusteringEvaluator.py:102-109 fits MiniBatchKMeans with
n_clusters = #labels and scores ``v_measure_score(labels, cluster_assignment)``.
Here: ``pyspark.ml.clustering.KMeans`` (seeded) for assignment, and
V-measure as pure grouped entropy aggregations over the (label, cluster)
contingency table — no sklearn:

  h = 1 - H(C|K)/H(C),  c = 1 - H(K|C)/H(K),  v = 2hc/(h+c)
"""

from __future__ import annotations

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


def logreg_classify(embeddings: DataFrame, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """(accuracy, n_test) — seeded pyspark.ml LogisticRegression (M11:
    ClassificationEvaluator.py:304-336 sklearn LogisticRegression).
    Train = even ids, test = odd ids (same split as knn_classify)."""
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


def v_measure(assignments: DataFrame, label_col: str = "label",
              cluster_col: str = "cluster") -> DataFrame:
    """(homogeneity, completeness, v_measure) from (label, cluster) rows —
    entropy aggregations over the contingency table (A11)."""
    a = assignments.select(
        F.col(label_col).alias("c"), F.col(cluster_col).alias("k")
    )
    n = a.count()
    if n == 0:
        raise ValueError("empty assignment table")
    ln = float(n)

    joint = a.groupBy("c", "k").agg(F.count(F.lit(1)).alias("n_ck"))
    by_c = joint.groupBy("c").agg(F.sum("n_ck").alias("n_c"))
    by_k = joint.groupBy("k").agg(F.sum("n_ck").alias("n_k"))

    h_c = by_c.agg(
        (-F.sum((F.col("n_c") / ln) * F.log(F.col("n_c") / ln))).alias("h")
    ).collect()[0]["h"]
    h_k = by_k.agg(
        (-F.sum((F.col("n_k") / ln) * F.log(F.col("n_k") / ln))).alias("h")
    ).collect()[0]["h"]
    h_c_given_k = joint.join(by_k, "k").agg(
        (-F.sum(
            (F.col("n_ck") / ln) * F.log(F.col("n_ck") / F.col("n_k"))
        )).alias("h")
    ).collect()[0]["h"]
    h_k_given_c = joint.join(by_c, "c").agg(
        (-F.sum(
            (F.col("n_ck") / ln) * F.log(F.col("n_ck") / F.col("n_c"))
        )).alias("h")
    ).collect()[0]["h"]

    hom = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    com = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = 0.0 if (hom + com) == 0 else 2.0 * hom * com / (hom + com)

    spark = assignments.sparkSession
    return spark.createDataFrame(
        [(round(hom, 6), round(com, 6), round(v, 6))],
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
