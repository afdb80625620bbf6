"""Tests for the training-data function library (text / dedup /
similarity / multimodal) against tiny hand-built fixtures with
Python-computed expectations."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from debezium_spark.functions import dedup as D
from debezium_spark.functions import multimodal as M
from debezium_spark.functions import similarity as S
from debezium_spark.functions import text as X

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a lazy dog"),  # near dup of 0
    (3, "completely different text about spark engines and shuffles"),
    (4, "el perro y el gato de la casa que duerme"),  # spanish-ish
    (5, "  "),  # whitespace-only
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_tokens_and_counts(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            X.token_count(F.col("text")).alias("n"),
            X.bpe_ish_token_count(F.col("text")).alias("b"),
        ).collect()
    }
    assert rows[0]["n"] == 9
    assert rows[5]["n"] == 0
    assert rows[0]["b"] >= rows[0]["n"]  # BPE-ish splits at least as fine


def test_quality_and_lang(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            X.quality_score(F.col("text")).alias("q"),
            X.lang_id(F.col("text")).alias("lang"),
        ).collect()
    }
    assert 0.0 <= rows[0]["q"] <= 1.0
    assert rows[0]["lang"] == "en"
    assert rows[4]["lang"] == "es"
    assert rows[5]["lang"] == "und"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world "), (2, "other")],
        "doc_id: long, text: string",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", X.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[0] == fps[1] != fps[2]
    assert fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_word_shingles(spark, docs):
    rows = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", X.word_shingles(F.col("text"), 3).alias("s")
        ).collect()
    }
    assert "the quick brown" in rows[0]
    assert len(rows[0]) == 7  # 9 tokens -> 7 trigrams, all distinct
    assert rows[5] == []


def test_exact_dedup(spark, docs):
    out = {r["content_hash"]: r for r in D.exact_dedup(docs).collect()}
    dup_groups = [r for r in out.values() if r["dup_count"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 0 and dup_groups[0]["dup_count"] == 2


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs


def test_ngram_jaccard_max_postings_drops_stop_shingles(spark, docs):
    # with a cap of 1 every shared shingle is dropped -> no pairs
    assert (
        D.ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_postings=1).count()
        == 0
    )


def test_minhash_lsh_finds_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.4
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact dup always collides
    assert (0, 3) not in pairs and (0, 4) not in pairs
    # near dup (true jaccard ~0.4) needs 1-row bands to collide
    # reliably; the estimate is deterministic given the md5 hash family
    loose = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in D.minhash_lsh_pairs(
            docs, num_hashes=16, bands=16, threshold=0.2
        ).collect()
    }
    assert loose[(0, 2)] == 0.5  # deterministic given the md5 family
    assert (0, 3) not in loose and (0, 4) not in loose


def test_simhash_properties(spark, docs):
    parts = {r["id"]: r for r in D.simhash_parts(docs).collect()}
    # identical docs -> identical signatures
    assert (parts[0]["simhash_hi"], parts[0]["simhash_lo"]) == (
        parts[1]["simhash_hi"],
        parts[1]["simhash_lo"],
    )
    for r in parts.values():
        assert 0 <= r["simhash_hi"] < 2**32
        assert 0 <= r["simhash_lo"] < 2**32
    sig = {r["id"]: r["simhash"] for r in D.simhash64(docs).collect()}
    assert sig[0] == sig[1]

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    # near dup is closer in hamming space than unrelated text
    assert ham(sig[0], sig[2]) < ham(sig[0], sig[3])


def test_simhash_near_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(docs, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0


def test_simhash_banding_exact_recall_vs_brute_force(spark):
    """Paired-block banding must find EVERY pair within Hamming ≤ k
    (pigeonhole over k+2 blocks) — checked against a brute-force
    popcount over all pairs of the sf0.001 documents corpus with the
    bucket cap disabled."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = {
        r["id"]: (r["simhash_hi"], r["simhash_lo"])
        for r in D.simhash_parts(docs).collect()
    }
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        ha, la = sigs[a]
        for b in ids[i + 1 :]:
            hb, lb = sigs[b]
            if bin(ha ^ hb).count("1") + bin(la ^ lb).count("1") <= 3:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_pairs(
            docs, max_hamming=3, max_bucket=10**9
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture has near-dup clusters


def test_simhash_band_keys_injective_for_any_layout():
    """Band key = b_i · 2^width_j + b_j must be injective over
    (b_i, b_j) for EVERY block layout — a fixed multiplier collided
    whenever width_j exceeded it, silently merging buckets (inflated
    populations → cap drops → lost pairs)."""
    import random

    rnd = random.Random(7)
    for n_blocks in (3, 4, 5, 6, 10):
        layout = D.simhash_blocks(n_blocks)
        assert sum(w for _, w in layout) == 64
        for i, j in D.simhash_band_pairs(n_blocks):
            wj = layout[j][1]
            seen = {}
            for _ in range(500):
                bi = rnd.randrange(1 << layout[i][1])
                bj = rnd.randrange(1 << wj)
                key = bi * (1 << wj) + bj
                assert seen.setdefault(key, (bi, bj)) == (bi, bj)


def test_simhash_exact_recall_other_radius(spark):
    """The banding guarantee is parameterized (k+2 blocks for radius
    k) — verify recall at k=2 too, where 4×16-bit blocks make the
    old fixed-8192 key collide."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    sigs = {
        r["id"]: (r["simhash_hi"], r["simhash_lo"])
        for r in D.simhash_parts(docs).collect()
    }
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        ha, la = sigs[a]
        for b in ids[i + 1 :]:
            hb, lb = sigs[b]
            if bin(ha ^ hb).count("1") + bin(la ^ lb).count("1") <= 2:
                want.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_pairs(
            docs, max_hamming=2, max_bucket=10**9
        ).collect()
    }
    assert got == want and want


def test_capped_pair_explode_excludes_self_pairs(spark):
    """A duplicated item id inside one bucket must not produce an
    (a, a) pair — the strict a.id < b.id guard matches the join-based
    shape's invariant."""
    rows = [(1, "k"), (1, "k"), (2, "k")]
    df = spark.createDataFrame(rows, "id: long, bk: string")
    pairs = [
        (r["a"]["id"], r["b"]["id"])
        for r in D.capped_pair_explode(
            df, ["bk"], F.struct("id"), 16
        ).collect()
    ]
    assert (1, 1) not in pairs
    assert sorted(set(pairs)) == [(1, 2)]


def test_connected_components_chain(spark):
    """A 40-node chain is the adversarial case for naive min-label
    propagation (needs O(diameter)=40 rounds); star contraction must
    label the whole chain with its minimum id well inside max_rounds."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    labels = {r["id"]: r["cluster_id"] for r in D.connected_components(df).collect()}
    assert set(labels) == set(range(41))
    assert set(labels.values()) == {0}


def test_connected_components_multi_and_orientation(spark):
    """Multiple components, reversed/duplicated edges, and self-loops:
    labels are per-component minima; self-loop-only nodes (no real
    neighbor) vanish with the loop edge."""
    edges = [
        (2, 1), (3, 2),          # component {1,2,3} with reversed edges
        (10, 11), (11, 10),      # duplicate both orientations
        (20, 20),                # pure self-loop -> dropped
        (30, 31), (31, 32), (30, 32),  # triangle
    ]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    labels = {r["id"]: r["cluster_id"] for r in D.connected_components(df).collect()}
    assert labels == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        30: 30, 31: 30, 32: 30,
    }


def test_connected_components_matches_python_oracle(spark):
    """Random sparse graph vs a driver-side union-find ground truth."""
    import random

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edges:
        if a != b:
            touched.add(a)
            touched.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in touched}
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {r["id"]: r["cluster_id"] for r in D.connected_components(df).collect()}
    assert got == want


def test_simhash_bucket_cap_bounds_hot_buckets(spark):
    """max_bucket drops degenerate hot buckets by construction: a
    cluster larger than the cap produces no pairs (bounded work), a
    small cluster still pairs fully."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)]
    rows += [(100 + i, "one two three four five six seven") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_near_pairs(df, max_hamming=3, max_bucket=4).collect()
    }
    assert pairs == {(100, 101), (100, 102), (101, 102)}
    # cap lifted: the big cluster's 45 pairs appear
    uncapped = D.simhash_near_pairs(df, max_hamming=3, max_bucket=64).count()
    assert uncapped == 45 + 3


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),  # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
    (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        VECS, "vec_id: long, embedding: array<double>"
    )


def test_brute_force_topk(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = S.brute_force_topk(vecs, q, k=3).collect()
    ranked = [r["nbr_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]
    sims = {r["nbr_id"]: r["sim"] for r in out}
    expect = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(sims[1] - round(expect, 4)) < 1e-9


def test_lsh_bucket_groups_similar_vectors(spark, vecs):
    pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in S.cosine_near_dup_pairs(
            vecs, threshold=0.9, n_planes=4, dim=4
        ).collect()
    }
    # 0 and 1 are near-identical: same bucket with high probability for
    # 4 planes — exact=False path must surface them
    assert (0, 1) in pairs
    exact = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in S.cosine_near_dup_pairs(vecs, threshold=0.9, exact=True).collect()
    }
    assert set(exact) == {(0, 1)}


def test_ann_lsh_topk_subset_of_bruteforce(spark, vecs):
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    approx = S.ann_lsh_topk(vecs, q, k=3, n_planes=2, dim=4).collect()
    brute = S.brute_force_topk(vecs, q, k=4).collect()
    assert {r["nbr_id"] for r in approx} <= {r["nbr_id"] for r in brute}


def test_auto_plane_count_scales_with_corpus():
    """The width rule must grow ~log2(n): fixed widths make bucket
    populations linear in corpus size (quadratic pair work at 10^10)."""
    a = S.auto_plane_count
    assert a(100) == 8
    assert a(1024) == 8  # boundary inclusive
    assert a(1025) == 16
    assert a(10**6) == 24
    assert a(10**10) == 32
    assert a(10**12) == 32  # ladder top
    # ann ladder
    assert a(500, target_bucket=32, ladder=(4, 8, 16, 32)) == 4
    assert a(5000, target_bucket=32, ladder=(4, 8, 16, 32)) == 8
    # monotone non-decreasing in n
    widths = [a(n) for n in (10, 10**3, 10**4, 10**6, 10**9, 10**11)]
    assert widths == sorted(widths)
    # mean bucket population stays bounded at every rung
    for n in (10**3, 10**6, 10**9):
        assert n / (1 << a(n)) <= 4


def test_embedding_bucket_cap_bounds_hot_buckets(spark):
    """max_bucket drops degenerate hot buckets (population > cap) from
    candidate generation — bounded work by construction; small clusters
    still pair fully."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(10)]
    rows += [(100 + i, [0.0, 0.0, 1.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    capped = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_near_dup_pairs(
            df, threshold=0.9, n_planes=4, dim=4, max_bucket=4
        ).collect()
    }
    assert capped == {(100, 101), (100, 102), (101, 102)}
    uncapped = S.cosine_near_dup_pairs(
        df, threshold=0.9, n_planes=4, dim=4, max_bucket=64
    ).count()
    assert uncapped == 45 + 3


def test_media_table_and_metadata(spark, docs):
    media = M.to_media_table(docs)
    meta = {r["media_id"]: r for r in M.media_metadata(media).collect()}
    text0 = DOCS[0][1]
    assert meta[0]["n_bytes"] == len(text0.encode())
    assert meta[0]["sha256"] == hashlib.sha256(text0.encode()).hexdigest()
    assert meta[0]["mime"] == "text/plain"


def test_decode_stub_features_deterministic(spark, docs):
    media = M.to_media_table(docs)
    f1 = {r["media_id"]: r["feature"] for r in M.decode_stub_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["feature"] for r in M.decode_stub_features(media, dim=8).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert f1[0] == f1[1]  # same payload -> same feature
    assert f1[0] != f1[3]


def test_decode_rejects_malformed_png(spark, docs):
    # A text payload relabelled image/png reaches the real PNG codec and
    # must fail loudly on the missing signature, not silently feature-ise.
    media = M.to_media_table(docs).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.sha256").alias("sha256"),
        ),
    )
    with pytest.raises(Exception, match="not a PNG payload"):
        M.decode_stub_features(media).collect()


def test_decode_stub_rejects_unknown_mime(spark, docs):
    # A mime with no decoder at all (tiff) must raise the loud
    # no-decoder error rather than fall back to a fake feature.
    media = M.to_media_table(docs).withColumn(
        "meta",
        F.struct(
            F.lit("image/tiff").alias("mime"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.sha256").alias("sha256"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        M.decode_stub_features(media).collect()


def test_frame_sample_offsets(spark, docs):
    media = M.to_media_table(docs)
    rows = [
        r
        for r in M.frame_sample(media, every_n_bytes=10, max_frames=3).collect()
        if r["media_id"] == 0
    ]
    offs = sorted(r["byte_offset"] for r in rows)
    assert offs == [0, 10, 20]
    assert all(r["n_bytes"] == len(DOCS[0][1].encode()) for r in rows)


def test_resize_stub_dims_and_digest(spark, docs):
    """Thumbnail-fit rule: never upscale, aspect preserved, the long
    side pinned to the box; the fake resized payload is the md5 of
    (payload || '|resize|WxH') so digests are reproducible."""
    import hashlib

    media = M.to_media_table(docs)
    out = {r["media_id"]: r for r in M.resize_stub(media).collect()}
    for mid, text in DOCS:
        r = out[mid]
        nb = len(text.encode())
        assert (r["src_w"], r["src_h"]) == (
            16 + nb % 497,
            16 + (nb * 31) % 359,
        )
        if r["src_w"] <= 256 and r["src_h"] <= 256:
            assert (r["out_w"], r["out_h"]) == (r["src_w"], r["src_h"])
        else:
            assert max(r["out_w"], r["out_h"]) == 256
            assert r["out_w"] <= r["src_w"] and r["out_h"] <= r["src_h"]
            # aspect preserved up to integer floor
            assert abs(
                r["out_w"] * r["src_h"] - r["out_h"] * r["src_w"]
            ) <= max(r["src_w"], r["src_h"])
        want = hashlib.md5(
            text.encode() + f"|resize|{r['out_w']}x{r['out_h']}".encode()
        )
        assert r["out_md5"] == want.hexdigest()
        assert bytes(r["resized"]) == want.digest()


# --- round-3 pipeline ops: PII, repetition, quota sample, shard pack ---

SF_DIR = "/root/testdata/sf0.001"


def test_pii_redact_masks_and_counts(spark):
    rows = spark.createDataFrame(
        [
            (
                0,
                "mail bob.smith+x@corp.example.org server 192.168.001.1 "
                "call +1 (555) 010-4242 done",
            ),
            (1, "no pii here at all"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r
        for r in rows.select(
            "doc_id",
            X.pii_count(F.col("text"), X.PII_EMAIL).alias("e"),
            X.pii_count(F.col("text"), X.PII_IPV4).alias("i"),
            X.pii_count(F.col("text"), X.PII_PHONE).alias("p"),
            X.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[0]["e"], out[0]["i"], out[0]["p"]) == (1, 1, 1)
    assert out[0]["red"] == "mail <EMAIL> server <IP> call <PHONE> done"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (0, 0, 0)
    assert out[1]["red"] == "no pii here at all"


def test_repetition_stats_hand_fixture(spark):
    rows = spark.createDataFrame(
        [(0, "a a b"), (1, "x x x x"), (2, "all distinct words here")],
        "doc_id: long, text: string",
    )
    d = rows.select("doc_id", X.capped_tokens(F.col("text")).alias("tk"))
    out = {
        r["doc_id"]: r
        for r in d.select(
            "doc_id",
            X.dup_fraction_micro(F.col("tk")).alias("dtok"),
            X.dup_char_fraction_micro(F.col("tk")).alias("dchr"),
            X.dup_fraction_micro(X.bigrams(F.col("tk"))).alias("dbg"),
        ).collect()
    }
    # "a a b": 1 of 3 tokens repeat; 1 of 3 chars; bigrams "a a","a b" distinct
    assert out[0]["dtok"] == 333_333
    assert out[0]["dchr"] == 333_333
    assert out[0]["dbg"] == 0
    # "x x x x": 3/4 tokens repeat; bigrams "x x" ×3 → 2/3 repeat
    assert out[1]["dtok"] == 750_000
    assert out[1]["dbg"] == 666_666
    assert out[2]["dtok"] == 0 and out[2]["dchr"] == 0 and out[2]["dbg"] == 0


def test_quota_sample_is_exact_per_lang_topk(spark):
    """The two-level (salted) top-K must equal the single global
    per-language top-K."""
    import hashlib

    from debezium_spark.queries import _QUOTA_K, corpus_quota_sample

    got = corpus_quota_sample(spark, SF_DIR).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    expected = {}
    for lang, ids in by_lang.items():
        order = sorted(
            ids,
            key=lambda d: (
                hashlib.md5(f"qs|{d}".encode()).hexdigest(),
                d,
            ),
        )
        for rk, d in enumerate(order[:_QUOTA_K], start=1):
            expected[(lang, d)] = rk
    assert {(r["lang"], r["doc_id"]): r["rk"] for r in got} == expected


def test_pack_shards_matches_python_prefix_sum(spark):
    import hashlib

    from debezium_spark.queries import _SHARD_BUDGET, corpus_pack_shards

    out = {
        r["doc_id"]: r for r in corpus_pack_shards(spark, SF_DIR).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r["doc_id"]: len(r["text"].lower().split()) for r in docs}
    order = sorted(
        toks,
        key=lambda d: (hashlib.md5(f"ps|{d}".encode()).hexdigest(), d),
    )
    acc = 0
    for d in order:
        acc += toks[d]
        assert out[d]["cum_tokens"] == acc, d
        assert out[d]["shard_id"] == (acc - toks[d]) // _SHARD_BUDGET
    assert len(out) == len(toks)


def test_reselect_backfills_unavailable(spark):
    from debezium_spark.queries import cdc_reselect_columns

    got = cdc_reselect_columns(spark, SF_DIR).collect()
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    )
    last_visible: dict[int, float] = {}
    expected = {}
    for r in sorted(ev, key=lambda r: r["event_id"]):
        unavailable = r["event_id"] % 7 == 0 and r["event_type"] not in (
            "signup",
            "error",
        )
        if not unavailable:
            last_visible[r["user_id"]] = r["value"]
        expected[r["event_id"]] = (
            unavailable,
            last_visible.get(r["user_id"]),
        )
    for r in got:
        want_flag, want_val = expected[r["event_id"]]
        assert r["was_unavailable"] == want_flag
        assert r["reselected_value"] == want_val


def test_auto_centroid_count_ladder():
    # 4·sqrt(n) flat-IVF sizing, snapped up to the next ladder rung
    assert S.auto_centroid_count(16) == 16        # 4·√16 = 16 exactly
    assert S.auto_centroid_count(500) == 256      # 4·√500 ≈ 89.4
    assert S.auto_centroid_count(8193) == 1024    # 4·√8193 ≈ 362
    assert S.auto_centroid_count(10**10) == S.IVF_LADDER[-1]  # capped last rung
    # C grows with n (monotone over the ladder)
    counts = [S.auto_centroid_count(n) for n in (10, 10**3, 10**5, 10**7)]
    assert counts == sorted(counts)


def test_ivf_assigns_each_vector_to_one_cell(spark):
    """Full-corpus IVF on sf0.001 embeddings: every corpus vector lands
    in exactly one cell, and probing all cells with k=corpus recovers
    the brute-force top-k exactly (nprobe=C ⇒ IVF is exact)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = S.ann_ivf_topk(
        e, q, k=5, n_centroids=16, nprobe=16, max_cell=None
    ).collect()
    brute = S.brute_force_topk(e, q, k=5).collect()
    assert [r["nbr_id"] for r in sorted(exact, key=lambda r: r["rank"])] == [
        r["nbr_id"] for r in sorted(brute, key=lambda r: r["rank"])
    ]


def test_ivf_topk_subset_of_bruteforce(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    approx = S.ann_ivf_topk(e, q, k=3, n_centroids=16, nprobe=4).collect()
    brute = S.brute_force_topk(e, q, k=500).collect()
    assert {r["nbr_id"] for r in approx} <= {r["nbr_id"] for r in brute}
    assert 1 <= len(approx) <= 3


def test_doc_chunking_char_semantics_multichunk_and_nonascii(spark, tmp_path):
    """Chunk boundaries are CHARACTER offsets (multi-byte text must not
    shift them) and the multi-chunk branch covers the doc exactly with
    size/stride overlap."""
    from debezium_spark.queries import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        doc_chunk_windows,
    )

    # 1000 chars, 3 bytes each in UTF-8 — byte-based math would claim
    # ceil((3000-400)/320)+1 = 10 chunks instead of the correct 3
    uni = ("中зé七" * 250)
    assert len(uni) == 1000
    ascii_short = "short doc"
    spark.createDataFrame(
        [(1, uni), (2, ascii_short)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in doc_chunk_windows(spark, str(tmp_path)).collect()
    }
    n = 1 + math.ceil((1000 - _CHUNK_SIZE) / _CHUNK_STRIDE)
    assert {k for k in rows} == {(1, i) for i in range(n)} | {(2, 0)}
    for i in range(n):
        expect = uni[i * _CHUNK_STRIDE : i * _CHUNK_STRIDE + _CHUNK_SIZE]
        got = rows[(1, i)]
        assert got["chunk"] == expect
        assert got["chunk_chars"] == len(expect)
    # chunks tile the doc: strides cover every char up to the end
    assert (n - 1) * _CHUNK_STRIDE + _CHUNK_SIZE >= 1000
    assert rows[(2, 0)]["chunk"] == ascii_short
    assert rows[(2, 0)]["chunk_tokens"] == 2
