"""Embedding similarity search (SURVEY.md §2-J sim-search).

Baseline: brute-force cosine top-k — probes broadcast against the
corpus, dot products as JVM array expressions (zip_with + left-fold
aggregate; verified bit-identical to DuckDB's list_dot_product), top-k
per probe via window. Linear scan of the corpus per probe batch: the
right baseline at any scale when probe count is small (it's one pass).

Scale path: BucketedRandomProjectionLSH (random-hyperplane buckets) so
candidate sets shrink from |corpus| to bucket occupancy; rows-only
check (bucket boundaries are model-internal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic; portable).

    Measured note: this interpreted higher-order fold BEATS a fully
    unrolled element_at(1)·…+element_at(64)· expression tree by ~3.5×
    on pairwise workloads — the 127-node tree falls out of whole-stage
    codegen and pays per-element ANSI bounds checks, while the fold
    runs one tight specialized loop. Don't "optimize" this by
    unrolling."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """`cosine` with the two norms PRECOMPUTED per side (round 11,
    guide §4/§1.2-2): on a pairwise panel the plain form re-runs both
    norm folds for every pair — 3 interpreted 64-element folds per
    pair where 1 suffices. `na`/`nb` must be `norm(a)`/`norm(b)`
    computed on the join inputs; the division and the na*nb product
    keep the exact expression order of `cosine`, so values are
    bit-identical."""
    return dot(a, b) / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per probe (excluding self-matches).

    Plan: broadcast probes → one corpus scan computes all pair scores →
    rank window partitioned by probe. Output: (probe_id, neighbor_id,
    cosine_sim, rank).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("pv")
    ).withColumn("pn", norm(F.col("pv")))
    scored = (
        c.join(F.broadcast(p), F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_pre(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine ≥ threshold) — the confirm stage of embedding dedup.

    Pairwise self-join: quadratic by definition, so at corpus scale run
    it on CANDIDATES only (lsh_topk buckets / ivf_topk cells generate
    them); norms are precomputed once per side so each pair costs one
    dot product. Output: (id_a, id_b, cosine_sim).
    """
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", norm(F.col("v")))
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def argmax_dim(v: Column) -> Column:
    """1-based index of the max-|component| dimension (first on ties)."""
    mags = F.transform(v, lambda x: F.abs(x))
    return F.array_position(mags, F.array_max(mags))


def top2_cells(v: Column) -> Column:
    """1-based indices of the two largest-|component| dims as a
    2-element array (first occurrence wins ties — mirrored exactly by
    the DuckDB oracle's list_position)."""
    mags = F.transform(v, lambda x: F.abs(x))
    p1 = F.array_position(mags, F.array_max(mags))
    masked = F.transform(mags, lambda x, i: F.when(i + 1 == p1, F.lit(-1.0)).otherwise(x))
    p2 = F.array_position(masked, F.array_max(masked))
    return F.array(p1, p2)


def ivf_topk_multiprobe(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with multi-probe (probe visits its nearest TWO cells): the
    standard recall lever for inverted-file ANN — candidate count
    doubles (still ~2·|corpus|/dims per probe, not |corpus|), recall
    strictly dominates single-probe since the probed set is a superset.

    Corpus stays single-cell (the inverted file); only the probe side
    fans out, so the explode is O(|probes|·n_probe) — negligible next
    to the corpus. Join remains a broadcast of the exploded probes.
    """
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cell", argmax_dim(F.col("cv")))
        .withColumn("cn", norm(F.col("cv")))
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("pv"),
        )
        .withColumn("cell", F.explode(top2_cells(F.col("pv"))))
        .withColumn("pn", norm(F.col("pv")))
    )
    scored = (
        c.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_pre(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate neighbors with a deterministic coarse
    quantizer: cell = argmax-|dim| of the vector (an inverted file of
    dim-dominant cells; a trained k-means codebook drops into the same
    plan as a broadcast centroid join).

    Candidates shrink from |corpus| to one cell's occupancy (~|corpus|/
    dims for isotropic data); the cell equi-join shuffles on cell id,
    then exact cosine re-ranks within the cell. Fully SQL-expressible →
    DuckDB-oracle-checkable, unlike model-internal LSH buckets.
    """
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cell", argmax_dim(F.col("cv")))
        .withColumn("cn", norm(F.col("cv")))
    )
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).cast("array<double>").alias("pv"),
        )
        .withColumn("cell", argmax_dim(F.col("pv")))
        .withColumn("pn", norm(F.col("pv")))
    )
    scored = (
        c.join(F.broadcast(p), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_pre(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as a fold (same codegen posture as `dot`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def ivf_topk_kmeans(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """True IVF: a TRAINED k-means codebook (MLlib KMeans, kmeans||
    init) replaces the deterministic argmax-dim quantizer of
    `ivf_topk`. Centroids adapt to the data distribution, so cell
    occupancy is balanced even when the corpus is anisotropic — the
    case where argmax-dim cells collapse onto a few dominant axes.

    Plan shape per the IVF contract: the codebook is tiny (n_cells
    rows) and BROADCAST; corpus rows are assigned once (nearest
    centroid at index time); probes rank centroids and fan out to
    their nearest `n_probes` cells; candidates shrink to the probed
    cells' occupancy, exact cosine re-ranks. At 100 TB the fit runs on
    a sample (KMeans cost is per-iteration linear in rows) and the
    assignment is the one full pass — exactly how production IVF
    indexes are built.

    Rows-only check (k-means internals are not SQL-expressible);
    recall gates live in tests/test_ivf_recall.py.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c_feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(c_feat)
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    c = model.transform(c_feat).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    )
    w_cells = Window.partitionBy("probe_id").orderBy(F.asc("d2"), F.asc("cell"))
    probe_cells = (
        p.crossJoin(F.broadcast(cents))
        .withColumn("d2", l2_sq(F.col("pv"), F.col("center")))
        .withColumn("cell_rank", F.row_number().over(w_cells))
        .filter(F.col("cell_rank") <= n_probes)
        .select("probe_id", "pv", "cell")
        .withColumn("pn", norm(F.col("pv")))
    )
    scored = (
        c.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_pre(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate neighbors via random-projection LSH (MLlib).

    Euclidean-bucketed candidates, exact cosine re-rank on candidates.
    Rows-only correctness (approx recall checked in unit tests).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    ).withColumn("pn", norm(F.col("pv")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_tables, seed=42,
    )
    if c.isEmpty():
        # MLlib fit() cannot infer the vector width from zero rows; an
        # empty corpus has a well-defined answer (no neighbors), so
        # return it with the normal output schema instead of raising.
        return p.limit(0).select(
            "probe_id",
            F.lit(None).cast("bigint").alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine_sim"),
            F.lit(None).cast("int").alias("rank"),
        )
    model = lsh.fit(c)
    cand = (
        model.approxSimilarityJoin(p, c, float("inf"), distCol="l2")
        .filter(F.col("datasetA.probe_id") != F.col("datasetB.neighbor_id"))
        .select(
            F.col("datasetA.probe_id").alias("probe_id"),
            F.col("datasetB.neighbor_id").alias("neighbor_id"),
            cosine_pre(
                F.col("datasetA.pv"),
                F.col("datasetB.cv"),
                F.col("datasetA.pn"),
                F.col("datasetB.cn"),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def _sql_double(x: float) -> str:
    """Exact SQL double literal: `repr` is the shortest round-trip
    representation and Spark's parser lands `<digits>D` in
    Double.parseDouble, which is correctly rounded — so the parsed
    Literal carries the identical IEEE-754 bits `F.lit` would."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite value {x!r} has no SQL double literal")
    return repr(x) + "D"


def lit_double_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> codebook literal built as ONE parsed SQL
    expression instead of ~n_rows x n_dims `F.lit` calls (round 11,
    guide §1.2-2): the Column-API construction of a 16x64 codebook
    costs ~1 s of driver-side py4j round-trips PER CALL SITE (~1.5 ms
    x ~1100 JVM calls) — pure plan-construction overhead, invisible in
    explain output. The parsed tree is the same array-of-array-of-
    double-Literal expression, so analyzed plans and values are
    bit-identical."""
    body = ",".join(
        "array(" + ",".join(_sql_double(x) for x in r) + ")" for r in rows
    )
    return F.expr("array(" + body + ")")


def _frozen_cell_distances(v: Column, centroids: list[list[float]]) -> Column:
    """array<double> of squared L2 distances from `v` to each frozen
    centroid — a literal-folded map expression, NO shuffle and NO
    centroid table: the codebook compiles into the plan."""
    cents = lit_double_matrix(centroids)
    return F.transform(cents, lambda c: l2_sq(v, c))


def ivf_topk_frozen(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF top-k over a FROZEN k-means codebook
    (operators.ivf_codebook.FROZEN_CENTROIDS by default): the
    production posture — the codebook is a committed build artifact, so
    index assignment and probe routing are pure deterministic
    expressions and the whole pipeline is SQL-expressible (DuckDB
    oracle inlines the same literals).

    Plan shape: corpus assignment is a narrow map (argmin over the
    literal distance array — no centroid join, no shuffle); probes rank
    the same distance array and explode to their nearest `n_probes`
    cells; the candidate set shrinks to the probed cells' occupancy via
    one broadcast equi-join on cell id; exact cosine re-ranks. At
    100 TB the only wide op is the final per-probe top-k window over
    candidates.
    """
    if centroids is None:
        from ocean_data_pipeline_spark.operators.ivf_codebook import FROZEN_CENTROIDS

        centroids = FROZEN_CENTROIDS
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    c_d2 = _frozen_cell_distances(F.col("cv"), centroids)
    # argmin with lowest-cell tie-break: array_position finds the FIRST
    # occurrence of the minimum (1-based → -1)
    assigned = c.withColumn(
        "cell", (F.array_position(c_d2, F.array_min(c_d2)) - 1).cast("int")
    ).withColumn("cn", norm(F.col("cv")))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    )
    p_d2 = _frozen_cell_distances(F.col("pv"), centroids)
    ranked_cells = F.array_sort(
        F.transform(p_d2, lambda d, i: F.struct(d.alias("d2"), i.alias("cell")))
    )
    probe_cells = p.withColumn(
        "cell", F.explode(F.slice(ranked_cells, 1, n_probes).getField("cell"))
    ).withColumn("pn", norm(F.col("pv")))
    scored = (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_pre(
                F.col("pv"), F.col("cv"), F.col("pn"), F.col("cn")
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )


def pq_encode(v: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of PQ codes for `v`: per subspace, the index of the
    nearest sub-centroid (first-minimum = lowest-code tie-break).
    Codebook literals compile into the plan — encoding is a narrow map
    with NO join and NO shuffle, exactly what a 100 TB index build
    pass wants (one scan, 8 bytes out per vector)."""
    subdim = len(codebooks[0][0])
    codes = []
    for m, book in enumerate(codebooks):
        lits = lit_double_matrix(book)
        sub = F.slice(v, m * subdim + 1, subdim)
        d2s = F.transform(lits, lambda c: l2_sq(sub, c))  # noqa: B023
        codes.append((F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"))
    return F.array(*codes)


def pq_reconstruct(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<double> decoded vector: concatenation of the chosen
    sub-centroids (the `x̂` of asymmetric distance computation)."""
    parts = []
    for m, book in enumerate(codebooks):
        lits = lit_double_matrix(book)
        parts.append(F.element_at(lits, F.element_at(codes, m + 1) + F.lit(1)))
    return F.flatten(F.array(*parts))


def pq_topk_frozen(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011) over FROZEN
    sub-codebooks (operators.pq_codebook by default): each 64-dim
    vector is encoded as 8 nibble codes (32x compression), and probes
    rank candidates by asymmetric distance d(q, x̂) — exact query
    vector against the quantized corpus vector.

    Plan shape: encode is a narrow literal-folded map (no shuffle);
    the ADC scan streams the encoded corpus past broadcast probes (8
    bytes/candidate instead of 256 — the reason PQ exists at 100 TB);
    the only wide op is the per-probe top-k window. At cluster scale
    the scan composes with IVF cell routing (encode once, route
    probes, ADC only the probed cells); here the full-scan posture
    keeps the query oracle-exact. Implementation reconstructs x̂ and
    folds (q-x̂)² — algebraically identical to the per-subspace
    lookup-table formulation, and SQL-expressible so the DuckDB twin
    inlines the same literals.

    Distances are rounded to 6 decimals BEFORE ranking on both engines
    so rank order never hinges on sub-ulp summation-order drift.
    """
    if codebooks is None:
        from ocean_data_pipeline_spark.operators.pq_codebook import PQ_CODEBOOKS

        codebooks = PQ_CODEBOOKS
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    encoded = c.select(
        "neighbor_id", pq_encode(F.col("cv"), codebooks).alias("codes")
    ).withColumn("xhat", pq_reconstruct(F.col("codes"), codebooks))
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).cast("array<double>").alias("pv"),
    )
    scored = (
        encoded.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(l2_sq(F.col("pv"), F.col("xhat")), 6).alias("approx_d2"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("approx_d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("probe_id", "rank")
    )
