"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus — the exact baseline. Dot products stay JVM-side via
  ``zip_with`` + ``aggregate``; one partial-agg window per query for
  top-k. At 100 TB the corpus side never shuffles: queries broadcast,
  scan streams.
- LSH-bucketed ANN: random-hyperplane signature (deterministic
  md5-seeded planes) → candidates share a bucket → exact re-rank inside
  buckets. The scale path: candidate generation is an equi-join on the
  bucket key.
- cosine near-dup pairs: same inverted-bucket shape for embedding-based
  dedup.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_spark.functions.util import ensure_parallelism


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    # sequential divides (never dot/(na*nb)) — the exact FP evaluation
    # order a SQL oracle reproduces: ((dot / norm_a) / norm_b)
    return dot(a, b) / norm(a) / norm(b)


def hyperplanes(
    dim: int, n_planes: int, seed: str = "lsh"
) -> list[list[float]]:
    """Public alias of :func:`_planes` — oracle SQL builders inline
    these deterministic plane literals."""
    return _planes(dim, n_planes, seed)


def auto_plane_count(
    n_rows: int,
    target_bucket: int = 4,
    ladder: tuple[int, ...] = (8, 16, 24, 32),
) -> int:
    """Corpus-scaled LSH width: the smallest ladder width ``w`` whose
    bucket space keeps the MEAN population at or under
    ``target_bucket`` (``2^w · target_bucket ≥ n``). A fixed width is
    a fixture-scale artifact — bucket populations grow linearly with
    the corpus, so within-bucket pair work re-becomes quadratic at the
    10^10 target; scaling w ≈ log2(n / target_bucket) keeps expected
    per-bucket work constant at any n (the hard worst-case bound is
    the separate ``max_bucket`` population cap). The ladder is
    deliberately coarse so widths stay stable across nearby corpus
    sizes (an oracle can enumerate the variants)."""
    for w in ladder:
        if (1 << w) * target_bucket >= n_rows:
            return w
    return ladder[-1]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    ``queries`` is broadcast (query sets are small by construction);
    the corpus scan never shuffles — the only exchange is the final
    per-query top-k, whose input is already cut to k rows per
    (query, partition) by the window's partial top-k under AQE.
    Excludes self-matches (same id).
    """
    corpus = ensure_parallelism(corpus)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"), _as_double(F.col(qvec_col)).alias("qv")
    )
    scored = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id")).select(
        "query_id",
        "nbr_id",
        F.round(cosine(F.col("qv"), F.col("v")), round_to).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "sim")
    )


def sq8_stats(corpus: DataFrame, vec_col: str = "v") -> tuple[list, list]:
    """Per-dimension (min, max) for scalar quantization: posexplode →
    ONE partial-agg shuffle (combiners cut dim·n rows to dim·partitions
    before the exchange) → dim rows to the driver (control-plane — 64
    scalars, not data). At 100 TB this is a single cheap stats pass, or
    the bounds ride the ingest pipeline's existing per-batch metrics."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    dim = max(r["pos"] for r in rows) + 1
    mns, mxs = [0.0] * dim, [0.0] * dim
    for r in rows:
        mns[r["pos"]], mxs[r["pos"]] = float(r["mn"]), float(r["mx"])
    return mns, mxs


def sq8_quantize(
    vec: Column, mns: list[float], mxs: list[float]
) -> Column:
    """FAISS-style SQ8: per-dimension linear map onto integer codes
    0..255 (``floor((x-mn)·255/(mx-mn) + 0.5)``, clamped; degenerate
    dims code to 0). floor(+0.5) instead of round() so Spark and a SQL
    oracle agree on halfway cases. The payoff at scale is scan
    bandwidth: 1 byte/dim instead of 8 — the corpus side of an ANN scan
    reads 8× less."""
    arr_mn = F.array(*[F.lit(m) for m in mns])
    arr_mx = F.array(*[F.lit(m) for m in mxs])
    def code(x: Column, i: Column) -> Column:
        mn = F.element_at(arr_mn, i + 1)
        mx = F.element_at(arr_mx, i + 1)
        q = F.floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("long")
        return F.when(
            mx > mn, F.greatest(F.lit(0), F.least(F.lit(255), q))
        ).otherwise(F.lit(0))
    return F.transform(vec, code)


def sq8_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k by cosine over SQ8 codes — the quantized analogue of
    :func:`brute_force_topk` (approximate by quantization only; FAISS's
    IndexScalarQuantizer scan). Same scale shape: queries broadcast,
    corpus never shuffles, per-query window on locally cut candidates.
    Integer dot products; similarity reported in deci-milli units with
    the floor-then-tie-break discipline the oracles use. Expects
    ``corpus_codes(nbr_id, qv8)`` / ``query_codes(query_id, qq8)``."""
    corpus_codes = ensure_parallelism(corpus_codes)
    idot = F.aggregate(
        F.zip_with(F.col("qq8"), F.col("qv8"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    def inorm(c: str) -> Column:
        return F.sqrt(
            F.aggregate(
                F.col(c),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v * v,
            ).cast("double")
        )
    sim = F.floor(
        idot.cast("double") / inorm("qq8") / inorm("qv8") * 1e4
    ).cast("long")
    guarded = F.when(
        (inorm("qq8") > 0) & (inorm("qv8") > 0), sim
    ).otherwise(F.lit(-10000).cast("long"))
    scored = corpus_codes.join(
        F.broadcast(query_codes), F.col("nbr_id") != F.col("query_id")
    ).select("query_id", "nbr_id", guarded.alias("qsim_dmil"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qsim_dmil"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "qsim_dmil")
    )


def _planes(dim: int, n_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bytes —
    reproducible with no RNG state, identical on every executor."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}|{p}|{i}".encode()).digest()
            for off in range(0, 16, 4):
                u = int.from_bytes(h[off : off + 4], "big") / 2**32
                vals.append(u * 2.0 - 1.0)
            i += 1
        vals = vals[:dim]
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signature = concatenated sign bits of plane dot products.

    The sign test is on ``floor(dot · 1e6)`` — engines that agree on the
    dot product to micro precision produce identical buckets, so a SQL
    oracle can reproduce the exact candidate set (a raw ``>= 0`` on a
    double is one ulp away from disagreement)."""
    bits = [
        (
            F.floor(dot(vec, F.array(*[F.lit(x) for x in pl])) * 1e6) >= 0
        ).cast("int")
        for pl in planes
    ]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    max_bucket: int | None = None,
    target_bucket: int = 32,
    ladder: tuple[int, ...] = (4, 8, 16, 32),
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. Recall trades with n_planes; bucket join replaces the
    full scan — at 10^10 vectors this is the difference between a
    broadcast-scan and an indexed lookup.

    ``n_planes=None`` (default) scales the width to the corpus
    (:func:`auto_plane_count`, one count job) so mean bucket size stays
    ~``target_bucket`` at any n. ``max_bucket`` additionally hard-caps
    each bucket's corpus population (first ``max_bucket`` ids,
    deterministic) — the bucketed index is materialized once in
    production, so the cap's window runs at index build, not per
    query."""
    corpus = ensure_parallelism(corpus)
    if n_planes is None:
        n_planes = auto_plane_count(
            corpus.count(), target_bucket=target_bucket, ladder=ladder
        )
    planes = _planes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    if max_bucket is not None:
        wb = Window.partitionBy("bucket").orderBy("nbr_id")
        c = (
            c.withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") <= max_bucket)
            .drop("__rn")
        )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    sim_dmil = F.floor(cosine(F.col("qv"), F.col("v")) * 1e4).cast("long")
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("nbr_id") != F.col("query_id")
    ).select("query_id", "nbr_id", sim_dmil.alias("sim_dmil"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_dmil"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "sim_dmil")
    )


IVF_LADDER: tuple[int, ...] = (
    16, 64, 256, 1024, 4096, 16384, 65536, 262144,
)


def auto_centroid_count(
    n_rows: int,
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
) -> int:
    """Corpus-scaled IVF codebook size: smallest ladder ``C`` at or
    above ``4·sqrt(n)`` (the standard flat-IVF sizing, e.g. FAISS
    guidelines). This is the rule that stays balanced at any corpus
    size: assignment work is ``n·C`` and per-probe work is ``n/C``,
    so C ∝ √n makes BOTH grow as n^1.5 / √n — whereas the previous
    constant-mean-cell rule (C ∝ n/target_cell) made the assignment
    pass O(n²), a scale-killer past ~10^7 vectors. Above the routed
    threshold :func:`ann_ivf_topk` additionally assigns through a
    two-level router (≈2√C dots/row instead of C), so the 10^10-row
    assignment pass is n·2√C ≈ n·10^3, executor-parallel.
    ``target_cell`` is kept for API compatibility (the hard per-cell
    bound is ``max_cell``'s population cap, not this)."""
    want = 4.0 * (max(n_rows, 1) ** 0.5)
    for c in ladder:
        if c >= want:
            return c
    return ladder[-1]


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    seed: str = "ivf",
) -> DataFrame:
    """Deterministic IVF codebook: the ``n_centroids`` corpus vectors
    with the smallest ``md5(seed|id)`` — a seeded uniform sample, no
    k-means iterations (engine-portable; a SQL oracle reproduces the
    exact codebook). Compiles to TakeOrderedAndProject — a distributed
    partial top-C, never a single-partition sort."""
    key = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    return (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            key.alias("__k"),
        )
        .orderBy("__k", "cid")
        .limit(n_centroids)
        .drop("__k")
    )


def _routed_assign(c: DataFrame, cent: DataFrame, n_centroids: int):
    """Two-level (IMI-style) nearest-centroid assignment: route every
    row through R ≈ √C super-centroids (an md5-seeded sample of the
    codebook itself), then argmax only over the centroids mapped to
    the chosen super-cell — ≈ R + C/R ≈ 2√C dot products per row
    instead of C. Routing is approximate (a row may land one cell off
    the global argmax — inherent to every hierarchical quantizer);
    cell membership stays deterministic: floor(cos·1e6) with
    lowest-id tie-break at BOTH levels, so runs and engines agree.

    Plan shape: two chained broadcast joins (supers: R rows; routed
    codebook: C rows) + two map-side-combined argmax aggregations —
    the corpus never shuffles before its per-row argmax."""
    r_width = 1
    while r_width * r_width < n_centroids:
        r_width *= 2
    sup = (
        ivf_centroids(
            cent, r_width, id_col="cid", vec_col="cv", seed="ivfsup"
        )
        .select(F.col("cid").alias("sid"), F.col("cv").alias("sv"))
        .withColumn("nsv", norm(F.col("sv")))
    )
    cs6 = F.floor(
        dot(F.col("cv"), F.col("sv")) / F.col("ncv") / F.col("nsv") * 1e6
    ).cast("long")
    cent_routed = (
        cent.crossJoin(F.broadcast(sup))
        .select(
            "cid",
            "cv",
            "ncv",
            F.struct(
                cs6.alias("s"), (-F.col("sid")).alias("ns")
            ).alias("sc"),
        )
        .groupBy("cid")
        .agg(
            F.first("cv").alias("cv"),
            F.first("ncv").alias("ncv"),
            F.max("sc").alias("m"),
        )
        .select("cid", "cv", "ncv", (-F.col("m.ns")).alias("sid"))
    )
    rs6 = F.floor(
        dot(F.col("v"), F.col("sv")) / F.col("nv") / F.col("nsv") * 1e6
    ).cast("long")
    routed_rows = (
        c.crossJoin(F.broadcast(sup))
        .select(
            "nbr_id",
            "v",
            "nv",
            F.struct(
                rs6.alias("s"), (-F.col("sid")).alias("ns")
            ).alias("sc"),
        )
        .groupBy("nbr_id")
        .agg(
            F.first("v").alias("v"),
            F.first("nv").alias("nv"),
            F.max("sc").alias("m"),
        )
        .select("nbr_id", "v", "nv", (-F.col("m.ns")).alias("sid"))
    )
    sim6 = F.floor(
        dot(F.col("v"), F.col("cv")) / F.col("nv") / F.col("ncv") * 1e6
    ).cast("long")
    return (
        routed_rows.join(F.broadcast(cent_routed), "sid")
        .select(
            "nbr_id",
            "v",
            "nv",
            F.struct(
                sim6.alias("s"), (-F.col("cid")).alias("nc")
            ).alias("sc"),
        )
        .groupBy("nbr_id")
        .agg(
            F.first("v").alias("v"),
            F.first("nv").alias("nv"),
            F.max("sc").alias("m"),
        )
        .select(
            "nbr_id",
            "v",
            "nv",
            F.col("m.s").alias("cs6"),
            (-F.col("m.nc")).alias("cid"),
        )
    )


def _flat_assign(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Flat nearest-centroid assignment: per-row argmax over the
    broadcast codebook — lexicographic max of (floor(cos·1e6), -cid)
    = highest similarity, lowest cid on ties. The corpus never
    shuffles before its per-id argmax groupBy (map-side combined).
    Emits ``cs6`` (similarity to the OWN cell's centroid in micro
    units) alongside ``cid`` — the prototypicality score SemDeDup /
    SSL-prototype pruning rank by."""
    sim6 = F.floor(
        dot(F.col("v"), F.col("cv")) / F.col("nv") / F.col("ncv") * 1e6
    ).cast("long")
    return (
        c.crossJoin(F.broadcast(cent))
        .select(
            "nbr_id",
            "v",
            "nv",
            F.struct(
                sim6.alias("s"), (-F.col("cid")).alias("nc")
            ).alias("sc"),
        )
        .groupBy("nbr_id")
        .agg(
            F.first("v").alias("v"),
            F.first("nv").alias("nv"),
            F.max("sc").alias("m"),
        )
        .select(
            "nbr_id",
            "v",
            "nv",
            F.col("m.s").alias("cs6"),
            (-F.col("m.nc")).alias("cid"),
        )
    )


def ivf_assign(
    c: DataFrame,
    n_centroids: int,
    route_threshold: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """Shared IVF index-build stage: materialize the deterministic
    md5-sampled codebook (control-plane: C rows) and assign every
    corpus row to its nearest centroid. ``c`` must carry
    ``(nbr_id, v, nv)``. Returns ``(assigned, cent)`` where assigned
    has ``(nbr_id, v, nv, cs6, cid)``. Above ``route_threshold``
    centroids the two-level routed (IMI-style) assignment replaces
    the flat n·C pass (≈2√C dots/row)."""
    c = ensure_parallelism(c)
    cent_rows = ivf_centroids(
        c, n_centroids, id_col="nbr_id", vec_col="v"
    ).collect()
    spark = c.sparkSession
    cent = spark.createDataFrame(
        [(r["cid"], r["cv"]) for r in cent_rows],
        "cid long, cv array<double>",
    ).withColumn("ncv", norm(F.col("cv")))
    if n_centroids >= route_threshold:
        return _routed_assign(c, cent, n_centroids), cent
    return _flat_assign(c, cent), cent


def _cap_cells(assigned: DataFrame, max_cell: int) -> DataFrame:
    """Truncate any cell to its ``max_cell`` lowest-id members (the
    ``max_postings`` discipline applied at index build)."""
    wc = Window.partitionBy("cid").orderBy("nbr_id")
    return (
        assigned.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= max_cell)
        .drop("__rn")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    max_cell: int | None = 128,
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
    route_threshold: int = 1024,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign every corpus
    vector to its nearest codebook centroid (the inverted lists); a
    query probes only its ``nprobe`` nearest cells and re-ranks
    exactly inside them.

    The scale path complementary to :func:`ann_lsh_topk`: the index
    build is one broadcast pass over the corpus (C centroid rows
    broadcast, per-row argmax, one O(n) map-side-combined shuffle) —
    at 10^10 vectors a probe touches ~``nprobe·n/C`` rows instead of
    n. ``n_centroids=None`` scales C with the corpus
    (:func:`auto_centroid_count`); ``max_cell`` hard-caps any
    degenerate hot cell at index build (the ``max_postings``
    discipline). Assignment ties break by floor(cos·1e6) then lowest
    centroid id — micro-precision signs, so a SQL oracle reproduces
    the exact cell layout."""
    # norms precomputed once per vector (not once per pair): the
    # cosine stays the exact sequential-divide form dot/na/nb, so
    # values — and the SQL oracle — are bit-identical, but the n·C
    # assignment pass evaluates one dot product per pair instead of
    # one dot + two norms
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    if n_centroids is None:
        n_centroids = auto_centroid_count(
            c.count(), target_cell=target_cell, ladder=ladder
        )
    # codebook materialized once inside ivf_assign (control-plane: C
    # rows, the index build artifact); above route_threshold the
    # two-level routed assignment replaces the flat n·C pass
    assigned, cent = ivf_assign(
        c, n_centroids, route_threshold=route_threshold
    )
    if max_cell is not None:
        assigned = _cap_cells(assigned, max_cell)
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("nqv", norm(F.col("qv")))
    qsim6 = F.floor(
        dot(F.col("qv"), F.col("cv")) / F.col("nqv") / F.col("ncv") * 1e6
    ).cast("long")
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("__s"), F.asc("cid")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "nqv", "cid", qsim6.alias("__s"))
        .withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "qv", "nqv", "cid")
    )
    sim_dmil = F.floor(
        dot(F.col("qv"), F.col("v")) / F.col("nqv") / F.col("nv") * 1e4
    ).cast("long")
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "nbr_id", sim_dmil.alias("sim_dmil"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_dmil"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "sim_dmil")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    integer_sim: bool = False,
    max_bucket: int | None = 64,
    target_bucket: int = 4,
    ladder: tuple[int, ...] = (8, 16, 24, 32),
) -> DataFrame:
    """Embedding near-dup pairs (cosine >= threshold).

    ``exact=True`` compares all pairs via a self-join keyed by a
    broadcast of ids — only for oracle-checkable small inputs.
    Default path buckets by LSH signature first (the scale path):
    candidates share a (table, bucket) key — never a cross join.
    ``n_tables`` is the OR-construction: each table uses independently
    seeded planes, a pair is a candidate if it collides in ANY table
    (recall at cosine c is 1-(1-p^n_planes)^n_tables with
    p = 1 - acos(c)/π).

    Two bounds keep candidate work from going quadratic at corpus
    scale: ``n_planes=None`` scales the signature width with the
    corpus (:func:`auto_plane_count` — mean bucket stays
    ~``target_bucket`` at any n), and ``max_bucket`` hard-caps each
    bucket's population (an over-full bucket — a degenerate hot region
    — is dropped, the ``max_postings`` discipline), making per-bucket
    pair work ≤ max_bucket² by construction. With ``max_bucket`` set,
    candidate generation is join-free: ONE groupBy per (table, bucket)
    builds a bounded postings list and pairs explode locally.

    ``integer_sim=True`` emits ``sim_dmil = floor(cosine·1e4)`` instead
    of a rounded double — the engine-portable form a SQL oracle can
    reproduce bit-for-bit.
    """
    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if exact:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        if n_planes is None:
            n_planes = auto_plane_count(
                base.count(), target_bucket=target_bucket, ladder=ladder
            )
        buckets = [
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(
                    F.col("v"), _planes(dim, n_planes, seed=f"lsh{t}")
                ).alias("bk"),
            )
            for t in range(n_tables)
        ]
        bk = base.select(
            "id", "v", F.explode(F.array(*buckets)).alias("tb")
        ).select("id", "v", "tb.tbl", "tb.bk")
        if max_bucket is not None:
            from debezium_spark.functions.dedup import capped_pair_explode

            pairs = (
                capped_pair_explode(
                    bk, ["tbl", "bk"], F.struct("id", "v"), max_bucket
                )
                .select(
                    F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a.v").alias("va"),
                    F.col("b.v").alias("vb"),
                )
                .dropDuplicates(["id_a", "id_b"])
            )
        else:
            a = bk.select(
                "tbl", "bk", F.col("id").alias("id_a"), F.col("v").alias("va")
            )
            b = bk.select(
                "tbl", "bk", F.col("id").alias("id_b"), F.col("v").alias("vb")
            )
            pairs = (
                a.join(b, ["tbl", "bk"])
                .filter(F.col("id_a") < F.col("id_b"))
                .dropDuplicates(["id_a", "id_b"])
            )
    if integer_sim:
        sim = F.floor(cosine(F.col("va"), F.col("vb")) * 1e4).cast("long")
        # round, not truncate: 0.7*1e4 is 6999.999... in IEEE754
        thr = round(threshold * 1e4)
        return (
            pairs.withColumn("sim_dmil", sim)
            .filter(F.col("sim_dmil") >= thr)
            .select("id_a", "id_b", "sim_dmil")
        )
    return (
        pairs.withColumn(
            "sim", F.round(cosine(F.col("va"), F.col("vb")), 4)
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ===========================================================================
# Product quantization (FAISS IndexPQ / ADC inner-product scan)
# ===========================================================================


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as the same left-to-right fold a SQL oracle
    reproduces (list_sum over an index-ordered transform)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sub_slices(vec: Column, n_sub: int, sub_dim: int) -> Column:
    """array of the M contiguous sub-vectors of ``vec``."""
    return F.array(
        *[F.slice(vec, m * sub_dim + 1, sub_dim) for m in range(n_sub)]
    )


def pq_codebook(
    corpus: DataFrame,
    dim: int,
    n_sub: int = 4,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "v",
    seed: str = "pq",
) -> DataFrame:
    """Deterministic PQ codebook ``(m, j, cv)``: the ``k`` corpus
    vectors with the smallest ``md5(seed|id)`` (a seeded uniform
    sample — no k-means iterations, so a SQL oracle reproduces the
    exact codebook, same discipline as :func:`ivf_centroids`), sliced
    into ``n_sub`` contiguous sub-vectors. ``j`` is the 1-based rank in
    the sample order, shared by all sub-spaces.

    ``k`` defaults to ``min(256, |corpus|)``. Unlike LSH widths or IVF
    codebook sizes, K does NOT scale with the corpus: K=256 is the
    fixed 8-bit-code budget of production PQ (FAISS IndexPQ; Jégou et
    al. 2011) — it bounds the per-query LUT (M·K floats) and the code
    width (M bytes/vector) regardless of n. Corpus-scaled recall comes
    from composing with the IVF index (IVFPQ), whose width already
    auto-scales (:func:`auto_centroid_count`)."""
    if k is None:
        k = min(256, corpus.count())
    sub_dim = dim // n_sub
    key = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    )
    samp = (
        corpus.select(
            F.col(id_col).alias("sid"),
            _as_double(F.col(vec_col)).alias("sv"),
            key.alias("__k"),
        )
        .orderBy("__k", "sid")
        .limit(k)
    )
    # rank within the K-row sample — a single-partition window over a
    # control-plane-sized input (K ≤ 256), never over the corpus
    w = Window.orderBy("__k", "sid")
    return (
        samp.withColumn("j", F.row_number().over(w))
        .select(
            "j",
            F.posexplode(_sub_slices(F.col("sv"), n_sub, sub_dim)).alias(
                "m", "cv"
            ),
        )
    )


def pq_encode(
    corpus: DataFrame,
    cent: DataFrame,
    dim: int,
    n_sub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """PQ encoding ``(nbr_id, code)`` — per sub-space, the 1-based index
    of the L2-nearest sub-codebook entry (``floor(l2sq·1e6)`` with
    lowest-``j`` tie-break, so engines agree on boundaries). ``code``
    is an array of ``n_sub`` small ints: M bytes/vector of index state
    against ``4·dim`` bytes of float32 — at 10^10 vectors the scan-side
    working set shrinks 64× (dim=64, M=4).

    Plan shape: posexplode (M rows/vector, same partition) → broadcast
    join with the M·K codebook → two map-side-complete groupBys (the
    argmin rows for one key never leave their partition, so each
    exchange carries one row per key) — the corpus is never sort-merge
    joined or replicated."""
    corpus = ensure_parallelism(corpus)
    sub_dim = dim // n_sub
    sub = corpus.select(
        F.col(id_col).alias("nbr_id"),
        *carry,
        F.posexplode(
            _sub_slices(_as_double(F.col(vec_col)), n_sub, sub_dim)
        ).alias("m", "sv"),
    )
    d6 = F.floor(l2sq(F.col("sv"), F.col("cv")) * 1e6).cast("long")
    # `carry` columns (e.g. the IVF cell id) ride the two groupBys as
    # first() — one value per nbr_id by construction — so composed
    # indexes need no extra join against the encode output
    return (
        sub.join(F.broadcast(cent), "m")
        .select(
            "nbr_id", *carry, "m", F.struct(d6.alias("d"), "j").alias("dj")
        )
        .groupBy("nbr_id", "m")
        .agg(
            F.min("dj").alias("dj"),
            *[F.first(c).alias(c) for c in carry],
        )
        .groupBy("nbr_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("m", F.col("dj.j").alias("j")))
                ),
                lambda s: s["j"],
            ).alias("code"),
            *[F.first(c).alias(c) for c in carry],
        )
    )


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    cent: DataFrame,
    dim: int,
    n_sub: int = 4,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) inner-product top-k over PQ codes —
    FAISS IndexPQ's search loop re-expressed. Per query, the float work
    is ONE tiny LUT (``ip6[m][j] = floor(dot(q_m, c_mj)·1e6)``, M·K
    longs); the corpus side reads ONLY the M-byte codes and sums M
    integer LUT hits per (query, vector) — exact integer arithmetic,
    so summation order cannot perturb the ranking and a SQL oracle
    hash-matches. Expects ``corpus_codes(nbr_id, code)`` from
    :func:`pq_encode` and ``queries(query_id, qv)``.

    Plan shape: the LUT build touches Q·M·K rows (broadcast codebook);
    the scan posexplodes codes (M rows/vector, partition-local), joins
    the broadcast LUT on (m, j), and partial-aggregates the M-term sums
    map-side — one exchange of Q rows per corpus vector, the corpus is
    never sort-merge joined."""
    sub_dim = dim // n_sub
    qsub = queries.select(
        "query_id",
        F.posexplode(
            _sub_slices(_as_double(F.col("qv")), n_sub, sub_dim)
        ).alias("m", "qsv"),
    )
    lut = qsub.join(F.broadcast(cent), "m").select(
        "query_id",
        "m",
        "j",
        F.floor(dot(F.col("qsv"), F.col("cv")) * 1e6)
        .cast("long")
        .alias("ip6"),
    )
    codepos = corpus_codes.select(
        "nbr_id", F.posexplode("code").alias("m", "j")
    )
    scored = (
        codepos.join(F.broadcast(lut), ["m", "j"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .groupBy("query_id", "nbr_id")
        .agg(F.sum("ip6").alias("ip6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ip6"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "ip6")
    )


def ann_ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_sub: int = 4,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int | None = None,
    max_cell: int | None = 128,
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
    id_col: str = "vec_id",
    vec_col: str = "v",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """IVFPQ — the composed production index at the 10^10-vector
    target (FAISS IndexIVFPQ with ``by_residual=false``: PQ codes of
    the raw vectors, not cell residuals — residual encoding re-centers
    floats per cell, which buys recall but breaks exact SQL
    reproducibility; the scan shape is identical). IVF bounds WHICH
    rows a query touches (~nprobe·n/C, C ∝ √n via
    :func:`auto_centroid_count`); PQ bounds the BYTES per touched row
    (M codes instead of 4·dim). The scan joins the code table against
    ONE broadcast probe×LUT table on (cid, m, j) — cell pruning and
    ADC scoring in a single broadcast hash join, exact integer sums.

    Composes the two independently-oracle-verified constructions
    unchanged: md5-sampled IVF codebook + floor(cos·1e6) assignment
    with ``max_cell`` capping, md5-sampled PQ sub-codebooks (fixed
    K=min(256,n) code budget) + floor(l2sq·1e6) encoding."""
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    n_rows = c.count()
    if n_centroids is None:
        n_centroids = auto_centroid_count(
            n_rows, target_cell=target_cell, ladder=ladder
        )
    # shared IVF build stage (same construction ann_ivf_topk
    # verifies; the routed two-level variant plugs in above its C
    # threshold exactly as there)
    assigned, cent = ivf_assign(c, n_centroids)
    if max_cell is not None:
        assigned = _cap_cells(assigned, max_cell)
    # PQ codebook from the FULL corpus (stable under cell capping);
    # codes carry their cell id through the encode — no join back
    pcent = pq_codebook(
        c,
        dim=dim,
        n_sub=n_sub,
        k=min(256, n_rows),
        id_col="nbr_id",
        vec_col="v",
    )
    codes = pq_encode(
        assigned,
        pcent,
        dim=dim,
        n_sub=n_sub,
        id_col="nbr_id",
        vec_col="v",
        carry=("cid",),
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("nqv", norm(F.col("qv")))
    qsim6 = F.floor(
        dot(F.col("qv"), F.col("cv")) / F.col("nqv") / F.col("ncv") * 1e6
    ).cast("long")
    wp = Window.partitionBy("query_id").orderBy(F.desc("__s"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "cid", qsim6.alias("__s"))
        .withColumn("__pr", F.row_number().over(wp))
        .filter(F.col("__pr") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    sub_dim = dim // n_sub
    qsub = q.select(
        "query_id",
        F.posexplode(
            _sub_slices(F.col("qv"), n_sub, sub_dim)
        ).alias("m", "qsv"),
    )
    lut = qsub.join(F.broadcast(pcent), "m").select(
        "query_id",
        "m",
        "j",
        F.floor(dot(F.col("qsv"), F.col("cv")) * 1e6)
        .cast("long")
        .alias("ip6"),
    )
    # ONE broadcast table = probed (query, cell) pairs × the query's
    # LUT rows: joining codes on (cid, m, j) prunes to probed cells
    # and scores in the same hash join
    probelut = probes.select("query_id", "cid").join(
        F.broadcast(lut), "query_id"
    )
    codepos = codes.select(
        "nbr_id", "cid", F.posexplode("code").alias("m", "j")
    )
    scored = (
        codepos.join(F.broadcast(probelut), ["cid", "m", "j"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .groupBy("query_id", "nbr_id")
        .agg(F.sum("ip6").alias("ip6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ip6"), F.asc("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "ip6")
    )


# ===========================================================================
# Embedding-space corpus curation (SemDeDup / SSL-prototype pruning)
# ===========================================================================


def semdedup(
    corpus: DataFrame,
    tau6: int = 350000,
    n_centroids: int | None = None,
    max_cell: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
    route_threshold: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, then look for duplicate
    pairs ONLY inside each cluster — the curation-side complement of
    :func:`cosine_near_dup_pairs` (LSH finds lexical-scale near-dups;
    cluster-local scan finds semantic ones at a lower threshold
    without a global pair explosion).

    Construction (every stage engine-portable so a SQL oracle
    reproduces it bit-for-bit):

    - cells = deterministic md5-sampled IVF codebook + nearest-
      centroid assignment (:func:`ivf_assign`; C scales as ~4√n, so
      assignment work is n·C ≈ n^1.5 flat, n·2√C routed above the
      threshold — never n²);
    - within-cell candidate pairs via the shared capped-postings
      stage (:func:`debezium_spark.functions.dedup.capped_pair_explode`
      — ONE groupBy, pair work ≤ max_cell² per cell by construction,
      degenerate hot cells dropped, no join);
    - a doc is REMOVED iff some same-cell doc with a better keep-key
      is tau6-similar to it, keep-key = (cs6 DESC, id ASC) — the most
      prototypical member of each duplicate relation survives
      (SemDeDup's representative rule, made deterministic with
      micro-unit similarities and id tie-breaks). Pairwise-greedy,
      not transitive closure — matching the paper, which thresholds
      per-pair max-similarity within a cluster.

    Returns one row per corpus doc: ``(id, cid, cent_sim6, kept)``
    with kept ∈ {0,1} as BIGINT (cross-engine hashable)."""
    from debezium_spark.functions.dedup import capped_pair_explode

    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    if n_centroids is None:
        n_centroids = auto_centroid_count(
            c.count(), target_cell=target_cell, ladder=ladder
        )
    assigned, _ = ivf_assign(
        c, n_centroids, route_threshold=route_threshold
    )
    item = F.struct(
        F.col("nbr_id").alias("id"),
        F.col("cs6").alias("k"),
        F.col("v").alias("v"),
        F.col("nv").alias("nv"),
    )
    pairs = capped_pair_explode(assigned, ["cid"], item, max_cell)
    s6 = F.floor(
        dot(F.col("a.v"), F.col("b.v"))
        / F.col("a.nv")
        / F.col("b.nv")
        * 1e6
    ).cast("long")
    # cells partition the corpus, so each unordered pair occurs in
    # exactly one cell — no dropDuplicates needed. Worse side of a
    # qualifying pair = lower cs6, ties to the higher id (a.id < b.id
    # by construction, so a tie removes b).
    removed = (
        pairs.withColumn("s6", s6)
        .filter(F.col("s6") >= F.lit(tau6))
        .select(
            F.when(F.col("b.k") <= F.col("a.k"), F.col("b.id"))
            .otherwise(F.col("a.id"))
            .alias("nbr_id")
        )
        .distinct()
    )
    return (
        assigned.join(
            removed.withColumn("__r", F.lit(1)), "nbr_id", "left"
        )
        .select(
            F.col("nbr_id").alias(id_col),
            "cid",
            F.col("cs6").alias("cent_sim6"),
            F.when(F.col("__r").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("kept"),
        )
    )


def ssl_prototype_prune(
    corpus: DataFrame,
    drop_num: int = 1,
    drop_den: int = 4,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
    route_threshold: int = 1024,
) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al. 2022 "Beyond
    neural scaling laws", the prototypicality half of D4, Tirumala et
    al. 2023): rank each cluster's members by similarity to their own
    centroid and prune the most prototypical ``drop_num/drop_den``
    fraction — the easy, redundant examples near cluster cores add
    the least information at large data scale.

    Same deterministic cell construction as :func:`semdedup` (shared
    :func:`ivf_assign`); the prune rule is exact-integer:
    ``pruned = 1 iff cell_rank·drop_den <= cell_count·drop_num`` with
    rank ordered by (cs6 DESC, id ASC). One window exchange on cid;
    no joins.

    Returns ``(id, cid, cent_sim6, cell_rank, pruned)``."""
    c = corpus.select(
        F.col(id_col).alias("nbr_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    if n_centroids is None:
        n_centroids = auto_centroid_count(
            c.count(), target_cell=target_cell, ladder=ladder
        )
    assigned, _ = ivf_assign(
        c, n_centroids, route_threshold=route_threshold
    )
    w = Window.partitionBy("cid").orderBy(
        F.desc("cs6"), F.asc("nbr_id")
    )
    wc = Window.partitionBy("cid")
    return (
        assigned.withColumn(
            "cell_rank", F.row_number().over(w).cast("long")
        )
        .withColumn("__cnt", F.count(F.lit(1)).over(wc))
        .select(
            F.col("nbr_id").alias(id_col),
            "cid",
            F.col("cs6").alias("cent_sim6"),
            "cell_rank",
            F.when(
                F.col("cell_rank") * F.lit(drop_den)
                <= F.col("__cnt") * F.lit(drop_num),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("pruned"),
        )
    )


def d4_prune(
    corpus: DataFrame,
    tau6: int = 350000,
    max_cell: int = 128,
    drop_num: int = 1,
    drop_den: int = 4,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 32,
    ladder: tuple[int, ...] = IVF_LADDER,
    route_threshold: int = 1024,
) -> DataFrame:
    """The full D4 pipeline (Tirumala et al. 2023, arXiv:2308.12284):
    SemDeDup first, then SSL-prototype pruning over the SURVIVORS —
    per-example verdict ``decision ∈ {drop_dup, prune_proto, keep}``.

    Composition is one pass over :func:`semdedup`'s output: rank-
    among-survivors is a running ``sum(kept)`` window and the survivor
    count a plain cell window, so both stages share the one IVF
    assignment and the cid exchange — no second embedding scan, no
    union of branches (which would put the SemDeDup subtree in the DAG
    twice). The prune rule is the same exact-integer
    ``rank·den <= count·num`` as :func:`ssl_prototype_prune`, applied
    to survivor rank/count only.
    """
    from pyspark.sql import Window

    sd = semdedup(
        corpus,
        tau6=tau6,
        n_centroids=n_centroids,
        max_cell=max_cell,
        id_col=id_col,
        vec_col=vec_col,
        target_cell=target_cell,
        ladder=ladder,
        route_threshold=route_threshold,
    )
    w_ord = Window.partitionBy("cid").orderBy(
        F.desc("cent_sim6"), F.col(id_col)
    )
    w_cell = Window.partitionBy("cid")
    rk = F.sum("kept").over(w_ord)
    cnt = F.sum("kept").over(w_cell)
    decision = (
        F.when(F.col("kept") == 0, F.lit("drop_dup"))
        .when(rk * drop_den <= cnt * drop_num, F.lit("prune_proto"))
        .otherwise(F.lit("keep"))
    )
    return sd.select(
        id_col, "cid", "cent_sim6", decision.alias("decision")
    )
