"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the point of each design):

- **exact**: one hash-groupBy shuffle on the digest — map-side partial
  aggregation collapses duplicates before the exchange, so shuffle
  volume is O(distinct), not O(rows).
- **n-gram Jaccard**: candidate pairs come from an equi-join on shared
  shingles (never a cross join); per-shingle postings are capped
  (`max_postings`) so a stop-shingle ("the quick brown") can't create a
  quadratic bucket — the standard inverted-index guard at corpus scale.
- **MinHash+LSH**: signatures are built by a single groupBy over
  exploded shingles using `min(hash_j)` per permutation — map-side
  combinable. Banding turns near-dup search into an equi-join on
  (band_id, band_hash); only same-bucket pairs are verified. This is
  the only fuzzy-dedup shape that survives 10^10 docs.
- **SimHash**: 64-bit signature via bit-vote aggregation; Hamming
  verification on banded buckets.

Hashes bottom out in md5 (``portable_hash32``) where a DuckDB oracle
must reproduce values; swap ``hash_fn=F.xxhash64`` in production for
speed — the algorithms are hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_spark.functions.util import ensure_parallelism
from debezium_spark.functions.text import (
    fingerprint,
    portable_hash32,
    word_shingles,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id document per exact (normalized) content hash.

    Output: (keep_id, dup_count, content_hash). One shuffle, partial-agg
    friendly; the winner is min(id) so the result is deterministic under
    any partitioning.
    """
    h = fingerprint(F.col(text_col)).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
        .select("keep_id", "dup_count", "content_hash")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup (inverted-index join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int | None = None,
) -> DataFrame:
    """Document pairs with shingle-Jaccard >= threshold.

    Plan (``max_postings`` set — the corpus-scale shape): doc →
    distinct n-gram shingles → ONE groupBy(shingle) building the
    postings list, dropped when longer than the cap (stop-shingles
    can't create quadratic buckets, and the per-shingle pair explosion
    is bounded by cap²) → pairs generated locally from each list →
    count shared shingles per pair → jaccard = |∩| / (|A|+|B|-|∩|).
    Two shuffles total, one tokenization pass, no self-join.

    Plan (``max_postings=None`` — exactness for small inputs): classic
    inverted-index self-equi-join on shingle. No cross join anywhere.
    """
    df = ensure_parallelism(df)
    sized = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    sized = sized.filter(F.col("n_sh") > 0)
    posts = sized.select("id", "n_sh", F.explode("sh").alias("shingle"))
    if max_postings is not None:
        # shared capped-postings pair stage; co-occurrences keep their
        # multiplicity — the per-pair count IS the intersection size
        co = capped_pair_explode(
            posts, ["shingle"], F.struct("id", "n_sh"), max_postings
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
    else:
        a = posts.select(
            F.col("shingle"),
            F.col("id").alias("id_a"),
            F.col("n_sh").alias("n_a"),
        )
        b = posts.select(
            F.col("shingle"),
            F.col("id").alias("id_b"),
            F.col("n_sh").alias("n_b"),
        )
        co = a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "n_a", "n_b"
        )
    pairs = (
        co.groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_a", "n_b", "inter", "jaccard")
    )
    return pairs


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = True,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) — sig[j] = min over shingles
    of hash_j(shingle).

    Built as ONE aggregation: explode shingles, compute all J hashes per
    shingle, groupBy(id).agg(min per slot). Map-side combine keeps
    shuffle volume at J longs per doc regardless of document size.

    Portable hash family: one md5's 32 hex chars yield FOUR independent
    32-bit words (``int(md5('mh{k}|'+x)[8m:8m+8], 16)``), so J hashes
    cost ⌈J/4⌉ digest computations per shingle instead of J — the
    digest is the dominant per-shingle cost at corpus scale. The
    digests are materialized in an explicit projection before the
    aggregate so the 4-way reuse never depends on codegen CSE.
    """
    df = ensure_parallelism(df)
    posts = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    if portable:
        n_digests = (num_hashes + 3) // 4
        posts = posts.select(
            "id",
            *[
                F.md5(
                    F.concat(F.lit(f"mh{k}|"), F.col("shingle"))
                ).alias(f"d{k}")
                for k in range(n_digests)
            ],
        )
        hashes = [
            F.conv(
                F.substring(F.col(f"d{j // 4}"), 1 + 8 * (j % 4), 8), 16, 10
            ).cast("long")
            for j in range(num_hashes)
        ]
    else:
        hashes = [
            F.xxhash64(F.col("shingle"), F.lit(j)) for j in range(num_hashes)
        ]
    mins = posts.groupBy("id").agg(
        *[F.min(h).alias(f"h{j}") for j, h in enumerate(hashes)]
    )
    return mins.select(
        "id", F.array(*[f"h{j}" for j in range(num_hashes)]).alias("sig")
    )


def banded_signature(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig, band, bkey) — the LSH index rows: one row per (doc,
    band) with the band's row-slice digest as the join key. This IS the
    persisted dedup index at corpus scale: stored bucketed by
    (band, bkey) so an arrival batch probes only matching buckets."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, num_hashes, n, id_col, text_col)
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bkey")


def incremental_lsh_dedup(
    index_df: DataFrame,
    arrivals_df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental near-dup: probe a batch of newly-arrived documents
    against the EXISTING corpus index, without touching index-vs-index
    pairs — the operation a CDC-fed training corpus runs per batch.

    Returns one row per arrival: ``(id, matched_id, est_jaccard,
    is_dup)`` where ``matched_id`` is the best-estimated-Jaccard index
    doc over the banded collisions (ties broken toward the smallest
    index id), NULL when no collision verifies ≥ threshold.

    Scale path: the arrival batch is small by construction (one
    micro-batch), so its banded keys are **broadcast** — the index side
    joins with no shuffle (and, stored bucketed by (band, bkey) as
    :func:`banded_signature` describes, with no full scan either).
    Best-match election is two map-side-combinable aggs (max est, then
    min id at that est), not a window; works for any orderable id type.
    """
    idx = banded_signature(index_df, num_hashes, bands, n, id_col, text_col)
    return probe_lsh_index(
        idx, arrivals_df, num_hashes, bands, n, threshold, id_col, text_col
    )


def probe_lsh_index(
    index_banded: DataFrame,
    arrivals_df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe a PREBUILT banded index (the output of
    :func:`banded_signature`, typically persisted once and reused by
    every micro-batch) with an arrival batch — the streaming hot path:
    the index signature agg is paid once at build time, per-batch work
    is one broadcast join against the stored index."""
    idx = index_banded
    arr = banded_signature(
        arrivals_df, num_hashes, bands, n, id_col, text_col
    )
    cand = (
        idx.withColumnRenamed("id", "idx_id")
        .withColumnRenamed("sig", "idx_sig")
        .join(
            F.broadcast(
                arr.withColumnRenamed("id", "new_id").withColumnRenamed(
                    "sig", "new_sig"
                )
            ),
            ["band", "bkey"],
        )
    )
    matches = F.size(
        F.filter(
            F.zip_with("new_sig", "idx_sig", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    scored = cand.withColumn(
        "est_jaccard", F.round(matches / F.size("new_sig"), 6)
    ).filter(F.col("est_jaccard") >= threshold)
    # best-match election (max est, ties toward min idx_id) as TWO
    # stacked map-side-combinable aggs over ONE lineage — no
    # dropDuplicates (a pair colliding in several bands scores the
    # same est every time, and max/min are duplicate-insensitive, so
    # the dedup shuffle bought nothing) and no self-back-join (which
    # put `scored` — and the whole index signature build under it —
    # into the DAG twice). Level 1 collapses to one row per
    # (arrival, est) with the min id at that est; level 2's max_by is
    # deterministic because est values are now distinct per arrival.
    # Id-type agnostic: no negated-id struct trick, so string ids work.
    best = (
        scored.groupBy("new_id", "est_jaccard")
        .agg(F.min("idx_id").alias("matched_id"))
        .groupBy("new_id")
        .agg(
            F.max_by("matched_id", "est_jaccard").alias("matched_id"),
            F.max("est_jaccard").alias("est_jaccard"),
        )
    )
    # best has at most one row per arrival — always batch-sized
    return (
        arrivals_df.select(F.col(id_col).alias("id"))
        .join(F.broadcast(best), F.col("id") == F.col("new_id"), "left")
        .select(
            "id",
            "matched_id",
            "est_jaccard",
            F.col("new_id").isNotNull().alias("is_dup"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified by
    signature-estimated Jaccard.

    bands × rows-per-band = num_hashes; a pair collides if any band's
    row-slice hashes equal. Collision is an equi-join on
    (band, band_key) — the scale path: shuffle keys are tiny band
    digests, never document content.
    """
    banded = banded_signature(df, num_hashes, bands, n, id_col, text_col)
    a = banded.select(
        "band", "bkey", F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = banded.select("band", "bkey", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    est = F.round(matches / F.size("sig_a"), 6)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_parts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document (token-level) as two non-negative
    32-bit halves ``(id, simhash_hi, simhash_lo)`` — halves keep every
    value inside signed-64 range, so the same arithmetic is
    reproducible in any SQL engine (no sign-bit games).

    Token hash = two portable 32-bit words; per bit b the doc
    aggregates sum(±1) votes over tokens, sign → bit. Expressed as ONE
    groupBy(id) with 64 per-bit set-bit-count aggregates + a token
    count: vote_b = 2·set_b − n, so bit b is set iff 2·set_b > n. No
    per-token ×32 row blowup, single map-side-combinable exchange of
    65 longs per doc.
    """
    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "\\s+"),
                    lambda t: t != F.lit(""),
                )
            )
        ).alias("tok"),
    )
    lohi = toks.select(
        "id",
        portable_hash32(F.col("tok"), salt="lo").alias("lo"),
        portable_hash32(F.col("tok"), salt="hi").alias("hi"),
    )
    aggs = [F.count("*").alias("n")]
    for b in range(32):
        aggs.append(
            F.sum(F.shiftright(F.col("lo"), b) % 2).alias(f"slo{b}")
        )
        aggs.append(
            F.sum(F.shiftright(F.col("hi"), b) % 2).alias(f"shi{b}")
        )
    counts = lohi.groupBy("id").agg(*aggs)

    def pack(prefix: str) -> Column:
        out = F.lit(0).cast("long")
        for b in range(32):
            out = out + F.when(
                F.col(f"{prefix}{b}") * 2 > F.col("n"),
                F.lit(1 << b).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        return out

    return counts.select(
        "id",
        pack("shi").alias("simhash_hi"),
        pack("slo").alias("simhash_lo"),
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: long) — the two halves packed into one word
    (bitwise, wrap-safe under ANSI mode)."""
    parts = simhash_parts(df, id_col, text_col)
    return parts.select(
        "id",
        F.shiftleft(F.col("simhash_hi"), 32)
        .bitwiseOR(F.col("simhash_lo"))
        .alias("simhash"),
    )


def simhash_blocks(n_blocks: int) -> list[tuple[int, int]]:
    """(offset, width) of each block when the 64-bit signature is split
    into ``n_blocks`` near-equal blocks (wider blocks first)."""
    base, rem = divmod(64, n_blocks)
    out, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < rem else 0)
        out.append((off, w))
        off += w
    return out


def _block_col(off: int, width: int) -> Column:
    """Block value extracted from the (hi, lo) 32-bit halves — every
    intermediate stays in non-negative signed-64 range, so the same
    arithmetic runs in any SQL engine (mirrored by
    :func:`simhash_block_sql`)."""
    mask = (1 << width) - 1
    lo, hi = F.col("simhash_lo"), F.col("simhash_hi")
    if off + width <= 32:
        v = F.shiftright(lo, off) if off else lo
    elif off >= 32:
        v = F.shiftright(hi, off - 32) if off > 32 else hi
    else:  # straddles the half boundary
        v = F.shiftright(lo, off).bitwiseOR(F.shiftleft(hi, 32 - off))
    return v.bitwiseAND(F.lit(mask))


def simhash_block_sql(
    off: int, width: int, hi: str = "simhash_hi", lo: str = "simhash_lo"
) -> str:
    """SQL expression computing the identical block value (for DuckDB
    oracles) — must stay bit-for-bit in lockstep with
    :func:`_block_col`."""
    mask = (1 << width) - 1
    if off + width <= 32:
        v = f"({lo} >> {off})" if off else lo
    elif off >= 32:
        v = f"({hi} >> {off - 32})" if off > 32 else hi
    else:
        v = f"(({lo} >> {off}) | ({hi} << {32 - off}))"
    return f"({v} & {mask})"


def simhash_band_pairs(n_blocks: int) -> list[tuple[int, int]]:
    """All C(n_blocks, 2) block-index pairs — one band table each."""
    return [
        (i, j) for i in range(n_blocks) for j in range(i + 1, n_blocks)
    ]


def capped_pair_explode(
    bucketed: DataFrame, key_cols: list[str], item: Column, cap: int
) -> DataFrame:
    """All i<j item pairs co-located in a bucket whose population is in
    ``[2, cap]`` — the shared capped-postings candidate stage (n-gram
    inverted index, simhash bands, embedding LSH buckets all use this
    exact shape).

    ``item`` must be a struct whose FIRST field is the item's unique
    id (postings sort by it, and the strict ``a.id < b.id`` guard
    excludes self-pairs if an id ever appears twice in one bucket).
    Returns columns ``a``, ``b`` (the item structs) WITH multiplicity —
    one row per co-occurrence, so callers that count shared buckets
    (n-gram) aggregate, and callers that want distinct pairs
    (simhash / embeddings) dropDuplicates on ``(a.id, b.id)``.
    One groupBy; pair work ≤ cap² per bucket by construction; no join.
    """
    lists = (
        bucketed.groupBy(*key_cols)
        .agg(F.collect_list(item).alias("ps"))
        .filter(F.size("ps").between(2, cap))
        .select(F.array_sort("ps").alias("ps"))
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, cap),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        lists.select(F.explode(pairs_arr).alias("p"))
        .select("p.a", "p.b")
        .filter(F.col("a")["id"] < F.col("b")["id"])
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidate generation (Manku-style paired-block banding): split the
    64-bit signature into ``max_hamming + 2`` blocks and use every
    PAIR of blocks as a band key — with ≤ k differing bits at most k
    blocks are touched, leaving ≥ 2 intact, so some pair matches
    exactly (pigeonhole): exact recall for Hamming ≤ max_hamming. For
    k=3 that is C(5,2)=10 tables of ~26-bit keys — a 2^10× larger key
    space than single 16-bit chunks, so bucket populations stay small
    as the corpus grows instead of growing as n/65k (the round-2
    scale-killer).

    ``max_bucket`` bounds worst-case work by construction: a band
    bucket holding more than this many docs (a degenerate hot
    signature region) is dropped from candidate generation — the same
    discipline as ``max_postings`` in the n-gram index; per-bucket
    pair work is ≤ max_bucket² regardless of corpus size.

    Shape: ONE groupBy per (table, band-key) building a bounded
    postings list, pairs generated locally from each list (join-free
    candidate stage), verified with popcount on the two 32-bit halves
    (hamming = popcount(hi_a⊕hi_b) + popcount(lo_a⊕lo_b) — every value
    signed-64-safe, reproducible in any SQL engine).
    """
    n_blocks = max_hamming + 2
    sig = simhash_parts(df, id_col, text_col)
    layout = simhash_blocks(n_blocks)
    blocks = [_block_col(o, w) for o, w in layout]
    bands = F.array(
        *[
            F.struct(
                F.lit(t).alias("ti"),
                # band key = b_i · 2^width_j + b_j — the multiplier is
                # block j's OWN width so the key is injective for any
                # block layout (a fixed 8192 collided whenever
                # width_j > 13, silently merging buckets)
                (
                    blocks[i] * F.lit(1 << layout[j][1]) + blocks[j]
                ).alias("bv"),
            )
            for t, (i, j) in enumerate(simhash_band_pairs(n_blocks))
        ]
    )
    banded = sig.select(
        "id",
        "simhash_hi",
        "simhash_lo",
        F.explode(bands).alias("ch"),
    ).select("id", "simhash_hi", "simhash_lo", "ch.ti", "ch.bv")
    item = F.struct(
        "id",
        F.col("simhash_hi").alias("hi"),
        F.col("simhash_lo").alias("lo"),
    )
    cand = (
        capped_pair_explode(banded, ["ti", "bv"], item, max_bucket)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.hi").alias("hi_a"),
            F.col("a.lo").alias("lo_a"),
            F.col("b.hi").alias("hi_b"),
            F.col("b.lo").alias("lo_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs (cluster dedup)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, cluster_id) connected-component labels over an undirected
    pair list — the final stage of fuzzy dedup: near-dup PAIRS become
    near-dup CLUSTERS, and ``cluster_id`` (the component's minimum id)
    is the canonical keeper.

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    shape that survives corpus scale: O(log n) rounds, each round a
    constant number of groupBy/join shuffles on (node, neighbor) pairs,
    never an adjacency list collected to one task and never a
    driver-side graph. Long chains (the worst case for naive min-label
    propagation, O(diameter) rounds) contract exponentially instead.

    Each round ends in ``localCheckpoint`` to truncate lineage (an
    iterative plan otherwise grows without bound); on a real cluster
    prefer ``checkpoint()`` with a reliable checkpoint dir for
    fault-tolerance. Convergence is detected by an order-independent
    (count, sum-of-xxhash64) signature of the edge set — one tiny
    aggregate job per round, control-plane only.

    Reference analogue: none (Debezium stops at row identity); this is
    the training-data-pipeline extension over the documents table.
    """
    e = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    sig = _sig(e)
    for _ in range(max_rounds):
        # Large-star: over the symmetrized graph, connect every
        # strictly-larger neighbor of u to min(Γ(u) ∪ {u}).
        sym = e.select("hi", "lo").union(
            e.select(F.col("lo").alias("hi"), F.col("hi").alias("lo"))
        ).select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # Small-star: edges now all point large→small; attach u and
        # its smaller neighbors to min(Γ(u)).
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        e = (
            mins2.select("hi", F.col("m").alias("lo"))
            .union(
                large.join(mins2, "hi")
                .where(F.col("lo") != F.col("m"))
                .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            )
            .distinct()
            .localCheckpoint()
        )
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_rounds} rounds"
        )
    # Fixpoint edge set is a star forest (member → component minimum);
    # roots label themselves.
    return (
        e.select(F.col("hi").alias("id"), F.col("lo").alias("cluster_id"))
        .union(
            e.select(F.col("lo").alias("id"), F.col("lo").alias("cluster_id"))
        )
        .distinct()
    )


def line_dedup_stats(
    df: DataFrame,
    threshold: int = 10,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """Line-level boilerplate dedup stats (the CCNet pre-dedup pass,
    Wenzek et al. 2020 §2: drop lines repeated across many documents —
    headers, navigation, license banners — before any doc-level
    dedup). Per doc: line count, lines shared by ≥ ``threshold``
    distinct docs, boilerplate character mass (micro-units), and the
    md5 fingerprint of the doc with boilerplate lines REMOVED (what a
    downstream exact-dedup would key on).

    Plan: explode lines with position, ONE partial-agg groupBy on the
    line hash for the distinct-doc frequency, equi-join back on the
    hash, one per-doc rollup. The frequency subtree shares the
    exploded-lines exchange with the join's probe side, so AQE's
    exchange reuse runs the explode once. Hot boilerplate lines skew
    only the probe side's partition sizes (the frequency side is one
    row per distinct line) — AQE skew-split territory, never a pair
    explosion.
    """
    L = df.select(
        F.col(id_col),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    ).select(
        id_col,
        "pos",
        "line",
        F.length("line").cast("long").alias("llen"),
        F.md5(F.col("line")).alias("lh"),
    )
    freq = L.groupBy("lh").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    j = L.join(freq, "lh")
    bp = F.col("n_docs") >= threshold
    kept = F.array_sort(
        F.collect_list(
            F.when(~bp, F.struct(F.col("pos"), F.col("line")))
        )
    )
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(bp.cast("int")).cast("long").alias("bp_lines"),
        F.floor(
            F.sum(F.when(bp, F.col("llen")).otherwise(0)).cast("double")
            * 1e6
            / F.greatest(F.sum("llen"), F.lit(1))
        )
        .cast("long")
        .alias("bp_char_micro"),
        F.md5(
            F.array_join(
                F.transform(kept, lambda s: s["line"]), " "
            )
        ).alias("kept_fp"),
    )
