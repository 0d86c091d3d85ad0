"""Deduplication operators for large-scale training-data pipelines.

Five families, each a (Spark DataFrame, DuckDB oracle SQL) pair:

- exact:            hash-groupBy on content digest
- minhash + LSH:    shingle → k minhashes → banded buckets → candidate pairs
- n-gram Jaccard:   exact Jaccard over distinct token shingles for candidates
- simhash:          64-bit sign-aggregated fingerprint, near-dup by Hamming
- embedding-cosine: sign-LSH bucketed candidates → exact cosine ≥ threshold
                    (the paraphrase-catching stage; machinery shared with
                    analytics/similarity.py's ANN family)

The reference's only dedup is Python ``set`` of sentences before encoding
(PairClassificationEvaluator.py:75, BitextMiningEvaluator.py:36) — the
"encode each distinct sentence once" optimization; these operators are the
at-scale generalization the corpus side needs.

Hash function discipline: every hash is derived from md5 hex strings so
Spark and DuckDB compute bit-identical values (both expose md5; neither
exposes the other's native hash).  Minhash uses the lexicographic MIN of
the hex digest — uniform over inputs, totally ordered, engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructor_embedding_spark.functions.tokenize import sql_tokens_expr, tokens_col

MINHASH_K = 8       # number of minhash functions
LSH_BANDS = 4       # bands (r = K / BANDS rows per band)
SHINGLE = 3         # tokens per shingle
#: Hot-band-bucket guard: a band key shared by more than this many docs
#: (boilerplate-dominated shingles — license headers, templated pages)
#: would go quadratic in the pair join; such buckets are dropped in BOTH
#: engines.  K/BANDS controls the Jaccard S-curve, not scale, so those
#: stay fixed; the cap is what bounds worst-case work at 100 TB.
LSH_BAND_BUCKET_CAP = 1024


# ----------------------------------------------------------------- exact

def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(content_md5, keep_doc_id, group_size) for groups with >1 doc.

    keep = smallest doc_id (deterministic survivor rule)."""
    return (
        docs.select(
            F.md5(F.col(text_col)).alias("content_md5"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_duplicates_sql(table: str, text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    return f"""
SELECT md5({text_col}) AS content_md5,
       min({id_col}) AS keep_doc_id,
       count(*) AS group_size
FROM {table} GROUP BY 1 HAVING count(*) > 1
"""


# --------------------------------------------------------------- shingles

def _shingles_of(toks):
    """Distinct token 3-shingles from an already-materialized token-array
    COLUMN (JVM expressions).

    Built from ZIPPED SLICES of the token array, never by indexing the
    tokenizer expression inside a lambda: ``toks[i]`` inside a transform
    re-evaluates the whole regex tokenizer per element (measured
    quadratic — ~0.6 s/doc on long docs); slices evaluate it a constant
    number of times per row.

    Callers must pass a plain column REFERENCE (``F.col('toks')`` from a
    prior select), not the tokenizer expression itself: this expression
    references its input 5× and inlining the regex tokenizer at each
    reference re-tokenizes every document 5× (plus once more per
    inferred filter) — measured 14 tokenizer evaluations per doc in the
    r5 lsh plan vs 1 with the two-step select (OPTIMIZATION_r06.md)."""
    n = F.size(toks)
    ln = F.greatest(n - (SHINGLE - 1), F.lit(0))
    z = F.arrays_zip(
        *[
            F.slice(toks, j + 1, ln).alias(f"w{j}")
            for j in range(SHINGLE)
        ]
    )
    return F.array_distinct(
        F.when(
            n >= SHINGLE,
            F.transform(
                z,
                lambda s: F.concat_ws(
                    " ", *[s[f"w{j}"] for j in range(SHINGLE)]
                ),
            ),
        ).otherwise(F.array())
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, sh) — tokens materialized in their own select so the
    shingle expression's 5 references resolve to a column, not 5 inlined
    copies of the regex tokenizer (CollapseProject keeps multi-referenced
    non-trivial aliases in their own Project)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("toks"),
    ).select("doc_id", _shingles_of(F.col("toks")).alias("sh"))


def _shingles_sql(text_col: str) -> str:
    t = sql_tokens_expr(text_col)
    return (
        f"list_distinct(CASE WHEN len({t}) >= {SHINGLE} THEN "
        f"list_transform(range(1, len({t}) - {SHINGLE} + 2), "
        f"i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2]) "
        "ELSE [] END)"
    )


# ---------------------------------------------------------------- minhash

#: Modulus of the universal minwise family — the Mersenne prime 2^31-1,
#: chosen so A_i·x + B_i < 2^62 stays exact int64 in BOTH engines (Spark
#: would wrap silently past 2^63, DuckDB would error — either way a
#: divergence).  31-bit hash range: shingle collisions within one doc's
#: min() are ~2^-31 per pair, negligible against MinHash's own 1/√K
#: estimation error.
MINHASH_P = (1 << 31) - 1


def _minhash_ab() -> list[tuple[int, int]]:
    """K fixed (A_i, B_i) pairs for h_i(x) = (A_i·x + B_i) mod P — seeded,
    so the Spark expressions and the rendered SQL literals are THE SAME
    constants by construction.  Per-HASH constants over a per-SHINGLE
    value x give pairwise-independent minhashes (the classic universal
    family: Broder et al., "Min-wise independent permutations"); deriving
    per-shingle constants varied by i instead (an earlier draft) makes
    the K minhashes correlated — measured on the sf0.01 corpus it
    inflated band-candidate pairs 31 → 145 and LOST two true
    jaccard ≥ 0.5 pairs, versus 32 candidates / full recall for this
    family at identical cost.

    Candidate-pair COUNTS on a dup-free corpus are NOT comparable
    across families or seeds: false positives are dominated by which
    corpus-common shingles happen to draw near-minimal hash values, a
    heavy-tailed luck-of-the-constants effect.  Measured on the 50k
    bench corpus (zero true jaccard ≥ 0.5 pairs, so every candidate is
    an FP): this family 42,735; the r4 md5-per-hash family 10,412; a
    4-digest-word split variant across seeds 1,456 / 1,520 / 24,386 /
    45,681 — a 30× seed spread that dwarfs any family effect.  Quality
    is therefore judged on planted-pair recall + the binomial
    signature-agreement guard (test_analytics.py's
    test_minhash_family_pairwise_independence), never on raw smoke
    pair counts."""
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(MINHASH_K)
    ]


MINHASH_AB = _minhash_ab()


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h0..h{K-1} BIGINT) — K minhashes from ONE md5 per shingle.

    Hash family: x = first 32 digest bits of md5(shingle) mod P, then
    h_i(shingle) = (A_i·x + B_i) mod P with the K fixed seeded constants
    in :data:`MINHASH_AB` (P = 2^31-1, :data:`MINHASH_P`).  Signature
    h_i = min over the doc's shingles.  All-integer — exact in both
    engines, no overflow, no float.

    Documents with no shingles are dropped (nothing to compare).

    Shape (r6): tokens → shingles → EXPLODE → one md5/x per shingle row →
    ``groupBy(doc_id).agg(min(affine_i))`` — the per-doc min is a partial
    (map-side) aggregation, so the only shuffle carries the 8 partial
    minima per (doc, map task), not the shingles.  This replaces the r5
    ``array_min(transform(xs, …))`` form whose plan re-evaluated the
    tokenizer 14× per document (7 inlined references × the inferred
    Generate filter — see OPTIMIZATION_r06.md; results are identical:
    min over the same distinct-shingle x values).  The md5 is computed
    ONCE per shingle (the dominant cost: the digest is ~8× the
    multiply-mod), and BIGINT signatures ride the band shuffle at 8
    bytes instead of 32-char hex.  Inputs with fewer splits than cores
    are repartitioned first (the digest work is CPU-bound and per-row
    deterministic, so partitioning cannot change results; at real scale
    splits >> cores and the branch never fires)."""
    spark = docs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)
    x = _shingled(docs, text_col, id_col).select(
        "doc_id", F.explode("sh").alias("shingle")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
            % F.lit(MINHASH_P)
        ).alias("x"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_P))
        .alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return x.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql(table: str, text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    aggs = ", ".join(
        f"min(({a} * x + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(MINHASH_AB)
    )
    return f"""
SELECT doc_id, {aggs}
FROM (
  SELECT doc_id, ('0x' || substr(m, 1, 8))::BIGINT % {MINHASH_P} AS x
  FROM (
    SELECT {id_col} AS doc_id, md5(unnest({_shingles_sql(text_col)})) AS m
    FROM {table}
  )
)
GROUP BY doc_id
"""


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        bucket_cap: int = LSH_BAND_BUCKET_CAP) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) — pairs sharing ≥1 LSH band.

    Scale path: the band-bucket self-join only compares docs that collide,
    never the full n² (the shuffle keys on the band value); band buckets
    larger than ``bucket_cap`` are dropped (see LSH_BAND_BUCKET_CAP)."""
    sig = minhash_signatures(docs, text_col, id_col)
    r = MINHASH_K // LSH_BANDS
    bands = sig.select(
        "doc_id",
        *[F.col(f"h{i}") for i in range(MINHASH_K)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "|", *[F.col(f"h{bi * r + j}") for j in range(r)]
                        ).alias("key"),
                    )
                    for bi in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *[f"h{i}" for i in range(MINHASH_K)],
             F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # hot-bucket guard — window shuffles on the same (band, key) the pair
    # join hashes on, so the partitioning is reused
    bands = bands.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).filter(F.col("bsz") <= bucket_cap).drop("bsz")

    # sort-merge (not broadcast) self-join: both sides are the SAME
    # windowed subtree already exchanged + sorted on (band, key), so the
    # planner reuses one exchange and the signature pipeline is computed
    # ONCE; the r5 broadcast plan rebuilt the whole tokenize→minhash
    # lineage a second time for the build side (plan diff in
    # OPTIMIZATION_r06.md).  At scale SMJ is also the safe strategy for
    # a bucket join whose total size grows with the corpus.
    a, b = bands.alias("a"), bands.hint("merge").alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[
                (F.col(f"a.h{i}") == F.col(f"b.h{i}")).cast("int").alias(f"e{i}")
                for i in range(MINHASH_K)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"e{i}") for i in range(MINHASH_K)) / float(MINHASH_K)
    return pairs.select(
        "doc_a", "doc_b", F.round(est, 6).alias("est_jaccard")
    )


def lsh_candidate_pairs_sql(table: str, text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    r = MINHASH_K // LSH_BANDS
    # build band rows via UNION ALL (engine-agnostic formulation); the
    # BIGINT signatures render to decimal identically in both engines, so
    # the band key string (and therefore bucket membership + the cap
    # filter) stays engine-independent
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        + " || '|' || ".join(
            f"CAST(h{bi * r + j} AS VARCHAR)" for j in range(r)
        )
        + " AS key, "
        + ", ".join(f"h{i}" for i in range(MINHASH_K))
        + " FROM sig"
        for bi in range(LSH_BANDS)
    )
    eqs = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_K)
    )
    return f"""
WITH sig AS ({minhash_signatures_sql(table, text_col, id_col)}),
bands_all AS ({unions}),
bands AS (
  SELECT * FROM bands_all
  QUALIFY count(*) OVER (PARTITION BY band, key) <= {LSH_BAND_BUCKET_CAP}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(({eqs}) * 1.0 / {MINHASH_K}, 6) AS est_jaccard
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
"""


# ---------------------------------------------------------- exact jaccard

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, jaccard) for LSH candidates with exact Jaccard ≥
    threshold — the verify stage after LSH recall."""
    cand = lsh_candidate_pairs(docs, text_col, id_col).select("doc_a", "doc_b")
    sh = _shingled(docs, text_col, id_col)
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a")
                  .withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


def ngram_jaccard_pairs_sql(table: str, threshold: float = 0.5,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    return f"""
WITH cand AS (
  SELECT doc_a, doc_b FROM ({lsh_candidate_pairs_sql(table, text_col, id_col)})
),
sh AS (
  SELECT {id_col} AS doc_id, {_shingles_sql(text_col)} AS sh FROM {table}
)
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(a.sh, b.sh)) * 1.0 /
             len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.doc_a
JOIN sh b ON b.doc_id = c.doc_b
WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
      len(list_distinct(list_concat(a.sh, b.sh))) >= {threshold}
"""


# ----------------------------------------------------------------- simhash

def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 60-bit simhash over tf-weighted token hashes.

    Token hash = first 15 hex chars of md5 (60 bits, fits a signed BIGINT
    in both engines); bit b contributes +tf / -tf by its parity."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn(
        "th", F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
    )
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{b}")
        for b in range(60)
    ]
    agg = h.groupBy("doc_id").agg(*bit_cols)
    sim = sum(
        F.when(F.col(f"b{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(60)
    )
    return agg.select("doc_id", sim.alias("simhash"))


SIMHASH_BANDS = 4        # 4 × 15-bit bands over the 60-bit fingerprint
SIMHASH_BAND_BITS = 15
SIMHASH_MAX_HAMMING = 3  # pigeonhole: dist ≤ bands-1 ⇒ ≥1 identical band


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, hamming) — near-duplicate pairs by simhash.

    Banded Hamming-neighbor join (the stage that turns the fingerprint
    column into a dedup operator): split the 60-bit simhash into 4×15-bit
    bands; any pair within Hamming distance ≤ 3 must agree on at least one
    band (pigeonhole), so the self-join keys on (band, band_value) — never
    the full n² — and the popcount verify runs only on collisions."""
    assert max_hamming < SIMHASH_BANDS, "pigeonhole bound requires dist < bands"
    sim = simhash64(docs, text_col, id_col)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = sim.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for bi in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))

    # merge hint: both sides shuffle the SAME subtree on (band, key), so
    # one exchange is computed and reused; a broadcast build side would
    # recompute the whole tokenize→simhash lineage a second time
    a, b = bands.alias("a"), bands.hint("merge").alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(table: str, max_hamming: int = SIMHASH_MAX_HAMMING,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    unions = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {bi} AS band, "
        f"(simhash >> {bi * SIMHASH_BAND_BITS}) & {mask} AS key FROM sim"
        for bi in range(SIMHASH_BANDS)
    )
    return f"""
WITH sim AS ({simhash64_sql(table, text_col, id_col)}),
bands AS ({unions})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def simhash64_sql(table: str, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    bit_sum = " + ".join(
        f"CASE WHEN sum(CASE WHEN (th // {2 ** b}) % 2 = 1 THEN tf "
        f"ELSE -tf END) > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        for b in range(60)
    )
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT {id_col} AS doc_id, unnest({sql_tokens_expr(text_col)}) AS term
    FROM {table}
  ) GROUP BY doc_id, term
),
h AS (
  SELECT doc_id, tf,
         CAST(('0x' || substr(md5(term), 1, 15))::UBIGINT AS BIGINT) AS th
  FROM tf
)
SELECT doc_id, {bit_sum} AS simhash FROM h GROUP BY doc_id
"""


# --------------------------------------- embedding-cosine near-duplicates

def plant_near_dup_copies(embeddings: DataFrame, *, n_plant: int,
                          partner: int, id_offset: int, alpha_near: float,
                          n_decoy: int = 0, alpha_far: float = 1.0,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """base ∪ planted near-copies — the ONE construction behind every
    known-truth recall probe for :func:`embedding_near_dup_pairs` (the
    oracle-gate fixture and the 10× smoke share it, so the arithmetic
    cannot drift between the two evidence sites).

    Ids ``i < n_plant`` are copied as ``i + id_offset`` with vector
    ``v_i + alpha_near · v_{i+partner}`` (a paraphrase-grade near-dup);
    ids in ``[n_plant, n_plant + n_decoy)`` get ``alpha_far`` mixed in
    (provably below a 0.9 threshold for unit-ish uncorrelated vectors).
    Pure double arithmetic — no RNG — so an engine twin can reproduce the
    planted vectors bit-exactly.  Rows whose partner id is absent plant
    nothing (inner join); callers that require all plants must check the
    corpus is at least ``n_plant + n_decoy + partner`` ids deep."""
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    partner_df = base.select(
        (F.col("vec_id") - partner).alias("vec_id"),
        F.col("embedding").alias("pv"),
    )
    # alpha is materialized as its own column BEFORE the id re-alias: a
    # when() referencing vec_id inline in the same select would resolve
    # against the aliased OUTPUT id (+id_offset) and silently pick the
    # decoy alpha for every row
    copies = (
        base.filter(F.col("vec_id") < n_plant + n_decoy)
        .join(partner_df, "vec_id")
        .withColumn(
            "alpha",
            F.when(F.col("vec_id") < n_plant, F.lit(alpha_near))
            .otherwise(F.lit(alpha_far)),
        )
        .select(
            (F.col("vec_id") + id_offset).alias("vec_id"),
            F.zip_with(
                "embedding", "pv", lambda x, y: x + F.col("alpha") * y
            ).alias("embedding"),
        )
    )
    return base.unionByName(copies)


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding", dim: int = 64,
                             planes_per_table: int | None = None,
                             n_tables: int = 8,
                             bucket_cap: int | None = None,
                             n: int | None = None) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with exact cosine >= ``threshold`` —
    embedding-space near-duplicate detection, the semantic sibling of the
    text families above (the reference dedups by exact sentence identity,
    PairClassificationEvaluator.py:75; embeddings are how you catch the
    paraphrased/reformatted copies exact hashing misses).

    Scale shape: candidates come from the multi-table sign-LSH bucket
    self-join (same derived planes, fixed-block layout, and hot-bucket cap
    as :func:`..similarity.lsh_cosine_topk` — occupancy stays
    ~LSH_TARGET_BUCKET as n grows, so per-bucket pair work is bounded);
    ids-only ride the bucket shuffle, each distinct candidate pair is
    exact-cosine-scored ONCE after a vector re-join, and only pairs at or
    above the threshold survive.  No crossJoin at any size.

    ``n``: precomputed corpus count (skips the derive-P count())."""
    from instructor_embedding_spark.analytics import similarity as sim

    if bucket_cap is None:
        bucket_cap = sim.LSH_BUCKET_CAP
    if planes_per_table is None:
        planes_per_table = sim.derive_planes_per_table(
            embeddings.count() if n is None else n
        )
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("n", sim._norm(F.col("v")))
    cand = sim.bucketed_candidate_pairs(
        base, dim, planes_per_table, n_tables, bucket_cap, canonical=True
    )
    from instructor_embedding_spark.functions.rounding import r6_col

    # pair membership gates on the rounded cosine, so the rounding is the
    # SHARED floor(x·1e6 + 0.5)/1e6 rule (functions/rounding.py), not
    # F.round vs DuckDB round() — those two can disagree on a
    # representation-boundary cosine right at the threshold and flip the
    # pair SET between engines (the same divergence class the Lloyd
    # distance rule eliminates in clustering.py)
    return (
        sim.score_candidate_pairs(base, cand)
        .select(
            F.col("vec_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            r6_col(F.col("cos_raw")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_sql(table: str, threshold: float = 0.9,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding", dim: int = 64,
                                 planes_per_table: int | None = None,
                                 n_tables: int = 8,
                                 bucket_cap: int | None = None) -> str:
    """DuckDB twin of :func:`embedding_near_dup_pairs` — the SAME
    approximate candidate set (the shared
    :func:`..similarity.lsh_pairs_ctes` scaffolding with the canonical
    a < b pair predicate), then the same round-6 cosine threshold."""
    from instructor_embedding_spark.analytics import similarity as sim

    if bucket_cap is None:
        bucket_cap = sim.LSH_BUCKET_CAP
    from instructor_embedding_spark.functions.rounding import r6_sql

    ctes = sim.lsh_pairs_ctes(
        table, id_col, vec_col, dim, planes_per_table, n_tables,
        bucket_cap, pair_pred="a.vid < b.vid",
    )
    return f"""
WITH {ctes}
SELECT vec_id AS id_a, neighbor_id AS id_b,
       {r6_sql('cos_raw')} AS cosine
FROM pairs WHERE {r6_sql('cos_raw')} >= {threshold}
"""
