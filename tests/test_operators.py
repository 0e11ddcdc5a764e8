"""Smoke + invariant tests for the operator library at sf0.001.

Full cross-engine value checks run via tools/check_correctness.py (and
the driver's own gate); these tests pin cheap structural invariants.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_byte_features_and_media_decode():
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        byte_features, decode_media, decode_ppm, decode_wav,
        encode_ppm, encode_wav_pcm16,
    )

    feats = byte_features(np.array([b"abc", b"", b"aaa"], dtype=object))
    assert feats["n_bytes"].tolist() == [3, 0, 3]
    assert feats["distinct_bytes"].tolist() == [3, 0, 1]
    assert feats["mean_byte"][2] == ord("a")

    # WAV PCM-16 round trip through real container bytes
    s = np.arange(-1000, 1000, 13, dtype=np.int16)
    payload = encode_wav_pcm16(s, rate=8000)
    dec, rate = decode_wav(payload)
    assert rate == 8000 and (dec == s).all()
    assert (decode_media(payload, "audio/wav") == s).all()

    # PPM P6 round trip, incl. a comment line in the header
    img = (np.arange(4 * 5 * 3) % 251).astype(np.uint8).reshape(4, 5, 3)
    p6 = encode_ppm(img)
    assert (decode_ppm(p6) == img).all()
    commented = p6.replace(b"P6\n", b"P6\n# synthetic\n", 1)
    assert (decode_ppm(commented) == img).all()

    # compressed codecs still raise until their libraries exist
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_shingles_short_doc(spark):
    from atr_adaptive_laguerre_spark.operators.dedup import shingles_col

    df = spark.createDataFrame(
        [("a b",), ("a b c d",)], "text string").select(
        shingles_col().alias("sh"))
    rows = df.collect()
    assert rows[0]["sh"] == []
    assert rows[1]["sh"] == ["a b c", "b c d"]


def test_dedup_invariants(spark):
    from atr_adaptive_laguerre_spark.operators.dedup import (
        q_dedup_exact, q_dedup_minhash_lsh, q_dedup_ngram_jaccard,
        q_dedup_simhash,
    )

    exact = q_dedup_exact(spark, SF).toPandas()
    assert (exact["canonical_id"] <= exact["doc_id"]).all()
    assert ((exact["group_size"] > 1) | (exact["is_duplicate"] == 0)).all()

    jac = q_dedup_ngram_jaccard(spark, SF).toPandas()
    assert (jac["doc_a"] < jac["doc_b"]).all()
    assert ((jac["jaccard"] >= 0.2) & (jac["jaccard"] <= 1.0)).all()

    lsh = q_dedup_minhash_lsh(spark, SF).toPandas()
    assert (lsh["doc_a"] < lsh["doc_b"]).all()
    # jaccard is the LSH *verification* stage: its pairs are a subset of
    # the candidates
    cands = {(a, b) for a, b in lsh.itertuples(index=False)}
    assert {(a, b) for a, b in jac[["doc_a", "doc_b"]]
            .itertuples(index=False)} <= cands

    sim = q_dedup_simhash(spark, SF).toPandas()
    assert ((sim["simhash"] >= 0) & (sim["simhash"] < 2 ** 16)).all()


def test_lsh_recall_vs_exact_jaccard(spark, tmp_path):
    """LSH candidate recall against an INDEPENDENT exact all-pairs
    Jaccard baseline (not the verification query, which is downstream of
    LSH): on a corpus with planted near-duplicates, every pair with true
    Jaccard >= 0.8 must be an LSH candidate (expected candidate
    probability 1-(1-j^3)^4 ~ 0.94 at j=0.8; deterministic here since the
    hashes are md5 of a fixed corpus), and overall recall at j >= 0.5
    must beat the ~0.4 single-pair expectation."""
    import itertools

    from atr_adaptive_laguerre_spark.operators.dedup import (
        NGRAM, _lsh_candidate_pairs,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    base_docs = ["".join(" " + rng.choice(vocab) for _ in range(40)).strip()
                 for _ in range(12)]
    rows = []
    for i, text in enumerate(base_docs):
        rows.append((f"o{i:02d}", text))
        words = text.split()
        # planted near-dup: perturb a few words (high jaccard)
        k = int(rng.integers(1, 4))
        for j in rng.choice(len(words), size=k, replace=False):
            words[int(j)] = str(rng.choice(vocab))
        rows.append((f"d{i:02d}", " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    def sh_set(text):
        w = text.lower().split()
        return {" ".join(w[i:i + NGRAM]) for i in range(len(w) - NGRAM + 1)}

    sets = {d: sh_set(t) for d, t in rows}
    exact = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        u = len(sa | sb)
        if u:
            exact[(a, b)] = len(sa & sb) / u

    cands = {(a, b) for a, b in
             _lsh_candidate_pairs(docs).toPandas().itertuples(index=False)}
    strong = {p for p, j in exact.items() if j >= 0.8}
    mid = {p for p, j in exact.items() if j >= 0.5}
    assert strong, "corpus must contain planted strong near-dups"
    assert strong <= cands, strong - cands
    recall_mid = len(mid & cands) / len(mid)
    assert recall_mid >= 0.6, (recall_mid, mid - cands)


def test_ann_topk_structure(spark):
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_ann_topk_cosine,
    )

    top = q_ann_topk_cosine(spark, SF).toPandas()
    assert set(top["rank"]) == {1, 2, 3, 4, 5}
    for _, grp in top.groupby("query_id"):
        sims = grp.sort_values("rank")["cos_sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all()  # non-increasing by rank
        assert (np.abs(sims) <= 1.0 + 1e-9).all()


def test_text_quality_ranges(spark):
    from atr_adaptive_laguerre_spark.operators.text import q_text_stats

    stats = q_text_stats(spark, SF).toPandas()
    assert (stats["token_count"] > 0).all()
    for c in ("stopword_ratio", "type_token_ratio", "quality_score"):
        assert ((stats[c] >= 0) & (stats[c] <= 1)).all(), c
