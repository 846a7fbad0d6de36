"""Tests: dedup family, similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzylink_spark.functions.text import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from fuzzylink_spark.functions.vectors import embed_strings
from fuzzylink_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_candidate_pairs,
)
from fuzzylink_spark.operators.multimodal import extract_features, frame_sample_plan, synth_media
from fuzzylink_spark.operators.similarity_search import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    rows = [
        (0, base, "en"),
        (1, base, "en"),                                   # exact dup of 0
        (2, base.replace("quick", "quikc"), "en"),         # near dup of 0
        (3, "completely different content about spark shuffles and joins", "en"),
        (4, "el rapido zorro marron salta sobre el perro que es perezoso", "es"),
        (5, base + " extra tail tokens here", "en"),       # near dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 in ids and 1 not in ids
    assert out.where("doc_id = 0").first()["n_dupes"] == 2
    assert out.count() == 5


def test_minhash_lsh_finds_near_dups(spark, docs):
    cand = lsh_candidate_pairs(docs, num_hashes=32, bands=16, shingle=5)
    pairs = {(r["a"], r["b"]) for r in cand.collect()}
    assert (0, 1) in pairs          # exact dup always a candidate
    assert (0, 2) in pairs or (0, 5) in pairs  # near dups recalled
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_signature_identical_for_identical_docs(spark, docs):
    sig = minhash_signature(docs, num_hashes=16)
    s = {r["doc_id"]: tuple(r["minhash"]) for r in sig.collect()}
    assert s[0] == s[1]
    assert s[0] != s[3]


def test_ngram_jaccard_verification(spark, docs):
    cand = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "a long, b long")
    out = ngram_jaccard_pairs(docs, cand, threshold=0.5)
    got = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    assert got[(0, 1)] == 1.0
    assert (0, 2) in got
    assert (0, 3) not in got


def test_simhash_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]) for r in simhash_candidate_pairs(docs, max_hamming=6).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_embedding_near_dup(spark):
    texts = ["alpha beta gamma", "alpha beta gamma", "alpha beta gamma delta",
             "totally unrelated words here"]
    mat = embed_strings(texts, dim=64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(len(texts))],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, threshold=0.9, planes=6).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((200, 16)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[:3]  # top-1 must be the vector itself
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in queries[i]]) for i in range(3)],
        "query_id long, embedding array<float>",
    )
    out = brute_force_topk(cdf, qdf, k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in out.where("rank = 1").collect()}
    assert top1 == {0: 0, 1: 1, 2: 2}
    # scores match numpy exactly per query
    want = (queries @ corpus.T)
    got = out.where("query_id = 0").orderBy("rank").collect()
    np_top5 = sorted(np.argsort(-want[0])[:5])
    assert sorted(r["vec_id"] for r in got) == [int(x) for x in np_top5]


def test_lsh_topk_self_hit(spark):
    rng = np.random.default_rng(2)
    corpus = rng.standard_normal((300, 16)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]]) for i in range(5)],
        "query_id long, embedding array<float>",
    )
    out = lsh_bucketed_topk(cdf, qdf, k=3, planes=6)
    top1 = {r["query_id"]: r["vec_id"] for r in out.where("rank = 1").collect()}
    assert top1 == {i: i for i in range(5)}  # same bucket as self, cosine 1


# --- text analysis -----------------------------------------------------------

def test_text_analysis_columns(spark, docs):
    out = docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        bpe_ish_token_count("text").alias("n_bpe"),
        lang_id("text").alias("lang_pred"),
        quality_score("text").alias("q"),
        rolling_fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_tok"] == 14
    assert by_id[0]["n_bpe"] >= by_id[0]["n_tok"]
    assert by_id[0]["lang_pred"] == "en"
    assert by_id[4]["lang_pred"] == "es"
    assert 0.0 <= by_id[0]["q"] <= 1.0
    assert by_id[0]["fp"] == by_id[1]["fp"]          # identical docs
    assert by_id[0]["fp"] != by_id[3]["fp"]


# --- multimodal --------------------------------------------------------------

def test_multimodal_fake_features(spark):
    media = synth_media(spark, n=12)
    feats = extract_features(media, dim=32, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["feature"]) == 32 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=32, fake=True).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first


def test_multimodal_real_decode_raises(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, dim=8, fake=False).collect()


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=500)
    vids = media.where("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == vids
    one = plan.groupBy("media_id").count().first()
    assert one["count"] >= 2


def test_banded_lsh_near_dup_recall(spark):
    """Banded multi-table sign-LSH must recover >= 90% of PERTURBED
    near-duplicates (cosine ~0.95, not identical vectors) — the round-1
    single-probe design measured ~0.28 theoretical recall here."""
    rng = np.random.default_rng(7)
    n, d = 300, 64
    base = rng.standard_normal((n, d)).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    eps = 0.33  # cos = 1/sqrt(1+eps^2) ~ 0.95
    dup = base + eps * noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    rows += [(i + 10_000, [float(x) for x in dup[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"])
           for r in embedding_near_dup_pairs(df, threshold=0.9,
                                             tables=4, planes=6).collect()}
    planted = {(i, i + 10_000) for i in range(n)}
    # only count planted pairs that really are above the verify threshold
    truly_above = {
        (i, i + 10_000) for i in range(n)
        if float(base[i] @ dup[i]) >= 0.9
    }
    recall = len(got & truly_above) / len(truly_above)
    assert recall >= 0.9, recall
    # verification step: nothing below the threshold sneaks through
    assert all(
        (a, b) in planted or abs(a - b) != 10_000 for a, b in got
    )


def test_lsh_topk_perturbed_neighbor_recall(spark):
    """ANN top-k: a perturbed query (cosine ~0.95 to its source) must find
    its source in the top-k for >= 90% of queries."""
    rng = np.random.default_rng(11)
    n, d, nq = 400, 64, 40
    corpus = rng.standard_normal((n, d))
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    noise = rng.standard_normal((nq, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    q = corpus[:nq] + 0.33 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in corpus[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in q[i]]) for i in range(nq)],
        "query_id long, embedding array<double>",
    )
    out = lsh_bucketed_topk(cdf, qdf, k=5, tables=4, planes=6)
    hits = {r["query_id"] for r in out.collect() if r["vec_id"] == r["query_id"]}
    assert len(hits) / nq >= 0.9, len(hits) / nq


# --- multimodal: real stdlib codecs -----------------------------------------

def test_wav_roundtrip_and_features():
    from fuzzylink_spark.operators.multimodal import audio_features, decode_wav, encode_wav

    t = np.arange(1600) / 8000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float64)
    rate, back = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and len(back) == 1600
    assert np.max(np.abs(back - x)) < 1e-3  # 16-bit quantization only
    f = audio_features(rate, back, dim=16)
    assert f.shape == (16,)
    assert abs(f[0] - 0.2) < 1e-6            # duration 1600/8000 s
    assert abs(f[1] - 1 / np.sqrt(2)) < 0.01  # sine RMS


def test_bmp_roundtrip_and_resize():
    from fuzzylink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        image_features,
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)  # odd row padding
    back = decode_bmp(encode_bmp(img))
    assert back.shape == img.shape
    assert np.array_equal(back, img)  # lossless roundtrip
    small = resize_nearest(img, 4, 5)
    assert small.shape == (4, 5, 3)
    f = image_features(img, dim=16)
    assert f.shape == (16,)
    assert np.allclose(f[:3], img.reshape(-1, 3).mean(axis=0) / 255.0, atol=1e-6)
    assert abs(f[3:].sum() - 1.0) < 1e-5  # histogram mass-normalized


def test_extract_features_real_decode(spark):
    from fuzzylink_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, n=24)
    real = media.where("kind != 'video'")
    out = extract_features(real, dim=16).collect()
    assert len(out) == 16  # 8 images + 8 audio
    assert all(len(r["feature"]) == 16 for r in out)
    # image features are non-degenerate and kind-dependent
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r["feature"])
    assert len({tuple(f) for f in by_kind["image"]}) == len(by_kind["image"])
    # undecodable payloads fail FAST, naming the magic
    import pytest as _pytest

    with _pytest.raises(Exception, match="no decoder for payload magic"):
        extract_features(media.where("kind = 'video'"), dim=8).collect()


def test_ivf_topk_recall(spark):
    """IVF (k-means cells + nprobe) ANN: >= 90% of perturbed queries must
    find their source vector in the top-k, on CLUSTERED data where the
    cells matter."""
    from fuzzylink_spark.operators.similarity_search import ivf_topk, train_ivf_centroids

    rng = np.random.default_rng(21)
    d, n_clusters, per = 32, 12, 40
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per, axis=0) + 0.25 * rng.standard_normal((n_clusters * per, d))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    nq = 50
    noise = rng.standard_normal((nq, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    q = pts[:nq] + 0.3 * noise
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in q[i]]) for i in range(nq)],
        "query_id long, embedding array<double>",
    )
    C = train_ivf_centroids(cdf, n_centroids=16, sample=n, iters=10)
    assert C.shape[1] == d
    out = ivf_topk(cdf, qdf, C, k=5, nprobe=4)
    hits = {r["query_id"] for r in out.collect() if r["vec_id"] == r["query_id"]}
    assert len(hits) / nq >= 0.9, len(hits) / nq
