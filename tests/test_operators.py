"""Smoke + invariant tests for the operator library at sf0.001.

Full cross-engine value checks run via tools/check_correctness.py (and
the driver's own gate); these tests pin cheap structural invariants.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_byte_features_and_decode_stub():
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        byte_features, decode_stub,
    )

    feats = byte_features(np.array([b"abc", b"", b"aaa"], dtype=object))
    assert feats["n_bytes"].tolist() == [3, 0, 3]
    assert feats["distinct_bytes"].tolist() == [3, 0, 1]
    assert feats["mean_byte"][2] == ord("a")
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


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
    # LSH candidates should recall most high-jaccard pairs
    strong = {(a, b) for a, b, j in
              jac[jac["jaccard"] >= 0.5][["doc_a", "doc_b", "jaccard"]]
              .itertuples(index=False)}
    cands = {(a, b) for a, b in lsh.itertuples(index=False)}
    if strong:
        recall = len(strong & cands) / len(strong)
        assert recall >= 0.8, (recall, strong - cands)

    sim = q_dedup_simhash(spark, SF).toPandas()
    assert ((sim["simhash"] >= 0) & (sim["simhash"] < 2 ** 16)).all()


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
