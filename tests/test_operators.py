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


def test_multimodal_ascii_gate_excludes_multibyte(spark):
    """The byte-vs-codepoint divergence guard: non-ASCII docs (where
    UTF-8 bytes != chars, so Spark featurizers and DuckDB string twins
    would disagree) are excluded from the oracle-gated demo queries on
    the Spark side exactly as the SQL twins exclude them."""
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        _ascii_docs,
    )

    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, "日本語 text"), (3, "café")],
        "doc_id bigint, text string")
    kept = sorted(r["doc_id"] for r in _ascii_docs(df).collect())
    assert kept == [1]


def test_split_ppm_frames_rejects_truncation():
    """Truncated payloads raise instead of hanging (a mid-comment or
    mid-data truncation used to spin the header scan forever)."""
    import pytest

    from atr_adaptive_laguerre_spark.operators.multimodal import (
        encode_ppm, split_ppm_frames,
    )

    img = (np.arange(2 * 3 * 3) % 251).astype(np.uint8).reshape(2, 3, 3)
    p6 = encode_ppm(img)
    with pytest.raises(ValueError, match="truncated frame data"):
        split_ppm_frames(p6[:-4])
    with pytest.raises(ValueError, match="truncated frame header"):
        split_ppm_frames(b"P6\n# comment with no newline")


def test_resize_and_frame_split_primitives():
    """box_downsample2 equals a naive per-block loop (odd rows cropped)
    and split_ppm_frames round-trips a multi-frame P6 concatenation."""
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        box_downsample2, encode_ppm, split_ppm_frames,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 6, 3)).astype(np.uint8)
    rz = box_downsample2(img)
    assert rz.shape == (2, 3, 3)
    for r in range(2):
        for c in range(3):
            for ch in range(3):
                block = img[2 * r:2 * r + 2, 2 * c:2 * c + 2, ch]
                assert rz[r, c, ch] == block.astype(np.int64).sum() / 4.0

    f1 = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    f2 = rng.integers(0, 256, (2, 7, 3)).astype(np.uint8)
    frames = split_ppm_frames(encode_ppm(f1) + encode_ppm(f2))
    assert len(frames) == 2
    assert (frames[0] == f1).all() and (frames[1] == f2).all()


def test_vectorized_featurizers_match_per_row_reference():
    """The batch-vectorized byte/audio feature math must equal a naive
    per-row loop on adversarial layouts: empty rows at the front, middle
    and END of the batch (reduceat/cumsum boundary traps), and
    single-element segments."""
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        byte_features,
    )

    rng = np.random.default_rng(7)
    payloads = [b"", bytes(rng.integers(0, 256, 37, dtype=np.uint8)),
                b"\x00", b"", bytes(rng.integers(0, 256, 5, dtype=np.uint8)),
                bytes([255]) * 9, b""]
    feats = byte_features(np.array(payloads, dtype=object))
    for i, b in enumerate(payloads):
        arr = np.frombuffer(b, dtype=np.uint8)
        assert feats["n_bytes"][i] == len(arr)
        assert feats["mean_byte"][i] == (arr.mean() if len(arr) else 0.0)
        assert feats["distinct_bytes"][i] == len(np.unique(arr))

    # audio segment math: vectorized cumsum/reduceat path vs the naive
    # per-row formulas, on adversarial layouts (empty first/middle/LAST
    # segments, single-sample segments)
    from atr_adaptive_laguerre_spark.operators.multimodal import (
        audio_segment_features,
    )

    segs = [np.empty(0, np.int16),
            np.array([5], np.int16),
            rng.integers(-32768, 32768, 97).astype(np.int16),
            np.empty(0, np.int16),
            np.array([-3, 4, -5, 6], np.int16),
            np.array([-32768] * 7, np.int16),
            np.empty(0, np.int16)]
    got = audio_segment_features(segs)
    for i, s in enumerate(segs):
        f = s.astype(np.float64)
        assert got["n_samples"][i] == len(s)
        exp_rms = float(np.sqrt(np.dot(f, f) / len(f))) if len(f) else 0.0
        assert got["rms"][i] == exp_rms, i
        nonneg = s >= 0
        assert got["zero_crossings"][i] == int(
            (nonneg[1:] != nonneg[:-1]).sum()), i
        exp_peak = int(np.abs(f).max()) if len(f) else 0
        assert got["peak"][i] == exp_peak, i


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

    from atr_adaptive_laguerre_spark.operators.dedup import (
        HAMMING_MAX, _simhash_fps64, q_dedup_simhash_pairs,
    )

    pairs = q_dedup_simhash_pairs(spark, SF).toPandas()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()
    assert (pairs["hamming"] <= HAMMING_MAX).all()
    # banding recall is pigeonhole-EXACT: every pair within the radius
    # must appear — verify against brute force on the 64-bit fingerprints
    fps = _simhash_fps64(
        spark.read.parquet(f"{SF}/documents.parquet")).toPandas()
    import itertools

    want = set()
    vals = list(zip(fps["doc_id"], fps["sh_lo"], fps["sh_hi"]))
    for (da, la, ha), (db, lb, hb) in itertools.combinations(vals, 2):
        if bin(la ^ lb).count("1") + bin(ha ^ hb).count("1") <= HAMMING_MAX:
            want.add((min(da, db), max(da, db)))
    got = {(a, b) for a, b in pairs[["doc_a", "doc_b"]]
           .itertuples(index=False)}
    assert got == want, (len(got), len(want))


def test_connected_components_known_graph(spark):
    """Min-label propagation on a known graph: a 4-chain, a triangle,
    and an isolated pair must produce exactly their component minima,
    and the loop must converge (chain diameter > 1 exercises >1 round)."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),    # triangle
         (20, 21)],                       # pair
        "doc_a bigint, doc_b bigint")
    comp = {r["id"]: r["comp"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                    10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # pointer doubling: a 60-node version-drift CHAIN (diameter 59,
    # worst-case orientation: labels must travel from the high end)
    # must converge in O(log diameter) rounds, far under max_iter
    chain = spark.createDataFrame(
        [(100 + i, 100 + i + 1) for i in range(60)],
        "doc_a bigint, doc_b bigint")
    got = {r["id"]: r["comp"]
           for r in connected_components(chain, max_iter=12).collect()}
    assert got == {100 + i: 100 for i in range(61)}


def test_connected_components_property_vs_union_find(spark):
    """Property check on random graphs: min-label propagation must equal
    an independent union-find on every sampled edge list (chains force
    multi-round convergence; duplicate and self-referencing-free)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from atr_adaptive_laguerre_spark.operators.dedup import (
        connected_components,
    )

    edge = st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1])

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(edge, min_size=1, max_size=25))
    def check(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges],
            "doc_a bigint, doc_b bigint")
        got = {r["id"]: r["comp"]
               for r in connected_components(pairs).collect()}
        assert got == want, (edges, got, want)

    check()


def test_canonicalize_consistent_with_pairs(spark):
    """Every verified near-dup pair must land in the same component, and
    each cluster has exactly one canonical == its minimum doc_id."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        q_dedup_canonicalize, q_dedup_ngram_jaccard,
    )

    pairs = q_dedup_ngram_jaccard(spark, SF).toPandas()
    cano = q_dedup_canonicalize(spark, SF).toPandas()
    comp = dict(zip(cano["doc_id"], cano["canonical_id"]))
    for a, b in pairs[["doc_a", "doc_b"]].itertuples(index=False):
        assert comp[a] == comp[b], (a, b)
    by_cluster = cano.groupby("canonical_id")
    assert (by_cluster["is_canonical"].sum() == 1).all()
    assert (by_cluster["doc_id"].min()
            == by_cluster["canonical_id"].first()).all()
    assert (by_cluster["doc_id"].size()
            == by_cluster["cluster_size"].first()).all()


def test_curation_neardup_consistent_with_components(spark):
    """The near-dup curation variant keeps a subset of the base curation
    keeps, and the difference in kept docs is exactly the non-canonical
    cluster members that the base gates would have kept."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        q_corpus_curation, q_corpus_curation_neardup,
    )
    from atr_adaptive_laguerre_spark.operators.dedup import (
        q_dedup_canonicalize,
    )

    base = (q_corpus_curation(spark, SF).toPandas()
            .set_index(["source", "lang_guess"]))
    nd = (q_corpus_curation_neardup(spark, SF).toPandas()
          .set_index(["source", "lang_guess"]))
    assert (nd["n_kept"] <= base["n_kept"]).all()
    assert (nd["n_docs"] == base["n_docs"]).all()
    cano = q_dedup_canonicalize(spark, SF).toPandas()
    n_noncanon = int((cano["is_canonical"] == 0).sum())
    dropped = int(base["n_kept"].sum() - nd["n_kept"].sum())
    # every extra drop is a non-canonical member (some non-canonicals
    # were already dropped by the exact/token/quality gates)
    assert 0 <= dropped <= n_noncanon
    assert n_noncanon > 0          # the synthetic corpus has near-dups


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


def test_token_counts_invariants(spark):
    """Every whitespace token contributes >= 1 BPE-ish piece, so
    bpe_tokens >= ws_tokens; chars-per-token is bounded by the longest
    letter run."""
    from atr_adaptive_laguerre_spark.operators.text import q_token_counts

    tc = q_token_counts(spark, SF).toPandas()
    assert (tc["bpe_tokens"] >= tc["ws_tokens"]).all()
    assert (tc["chars_per_bpe_token"] > 0).all()
    assert (tc["bpe_per_ws_token"] >= 1.0).all()


def test_corpus_curation_consistency(spark):
    """The composite curation report must agree with its component
    operators run separately: total docs, per-group sanity, and the keep
    decision recomputed from text_stats + dedup_exact."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        MIN_QUALITY, MIN_TOKENS, q_corpus_curation,
    )
    from atr_adaptive_laguerre_spark.operators.dedup import q_dedup_exact
    from atr_adaptive_laguerre_spark.operators.text import q_text_stats

    rep = q_corpus_curation(spark, SF).toPandas()
    assert (rep["n_kept"] <= rep["n_docs"]).all()
    assert ((rep["kept_ratio"] >= 0) & (rep["kept_ratio"] <= 1)).all()

    stats = q_text_stats(spark, SF).toPandas().set_index("doc_id")
    dup = q_dedup_exact(spark, SF).toPandas().set_index("doc_id")
    keep = ((dup["is_duplicate"] == 0)
            & (stats["token_count"] >= MIN_TOKENS)
            & (stats["quality_score"] >= MIN_QUALITY))
    assert int(rep["n_kept"].sum()) == int(keep.sum())
    assert int(rep["n_docs"].sum()) == len(stats)


def test_ivf_topk_vs_exact(spark):
    """IVF structural invariants + recall vs the exact brute-force
    baseline.  The synthetic embeddings are near-random (no cluster
    structure), so the floor is modest — but it must beat the
    nprobe/cells = 0.3 random-probe expectation (measured 0.48)."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, q_ann_ivf_topk, q_ann_topk_cosine,
    )

    ivf = q_ann_ivf_topk(spark, SF).toPandas()
    assert set(ivf["rank"]) == {1, 2, 3, 4, 5}
    for _, grp in ivf.groupby("query_id"):
        sims = grp.sort_values("rank")["cos_sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all()

    ex = q_ann_topk_cosine(spark, SF).toPandas()
    ex = ex[ex["query_id"] < IVF_N_QUERIES]
    hits = tot = 0
    for q in range(IVF_N_QUERIES):
        ei = set(ex.loc[ex["query_id"] == q, "cand_id"])
        ii = set(ivf.loc[ivf["query_id"] == q, "cand_id"])
        hits += len(ei & ii)
        tot += len(ei)
        # IVF sims can never beat the exact best (it searches a subset)
        assert (ivf.loc[ivf["query_id"] == q, "cos_sim"].max()
                <= ex.loc[ex["query_id"] == q, "cos_sim"].max() + 1e-12)
    assert hits / tot > 0.35, hits / tot


def test_ivfpq_rerank_exhaustive_equals_brute_force(spark):
    """With every cell probed and a shortlist at least as large as the
    corpus, the rerank's candidate set is ALL non-self vectors scored
    by exact cosine — so its top-5 must be IDENTICAL (ids, ranks, and
    r6 sims) to the brute-force `ann_topk_cosine` answer.  Pins that
    the ADC shortlist stage only ever FILTERS candidates and that the
    rerank's tie-breaking matches the exact path."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, KMEANS_K, q_ann_ivfpq_rerank, q_ann_topk_cosine,
    )

    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    rr = (q_ann_ivfpq_rerank(spark, SF, nprobe=KMEANS_K, r_cand=n_vecs)
          .toPandas())
    ex = q_ann_topk_cosine(spark, SF).toPandas()
    ex = ex[ex["query_id"] < IVF_N_QUERIES]
    merged = ex.merge(rr, on=["query_id", "rank"], suffixes=("_ex", "_rr"))
    assert len(merged) == len(ex) == IVF_N_QUERIES * 5
    assert (merged["cand_id_ex"] == merged["cand_id_rr"]).all()
    assert (merged["cos_sim_ex"] == merged["cos_sim_rr"]).all()


def test_kmeans_codebook_trains_and_quantizes(spark):
    """The IVF codebook is genuinely TRAINED (Lloyd updates move the
    cells away from their seed vectors) and every centroid component
    lies on the 1e-6 grid (the ADVICE r2 cross-engine invariant: raw
    avg residue must never feed an assignment cosine)."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.similarity import (
        _kmeans_codebook, _norm,
    )

    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    emb = emb.withColumn("nrm", _norm(F.col("v")))
    cent = _kmeans_codebook(emb).toPandas()
    seeds = {r["vec_id"]: np.asarray(r["v"])
             for r in emb.filter(F.col("vec_id") < 10).collect()}
    moved = 0
    for _, row in cent.iterrows():
        cv = np.asarray(row["cv"])
        q = np.floor(cv * 1e6 + 0.5) / 1e6
        np.testing.assert_array_equal(cv, q)       # on the 1e-6 grid
        if row["cell"] in seeds and not np.array_equal(cv, seeds[row["cell"]]):
            moved += 1
    assert moved >= len(cent) - 1   # training moved (nearly) every cell


def test_ivf_recall_on_clustered_corpus(spark):
    """On a corpus with REAL cluster structure (vectors = centroid +
    small noise, labels = cluster ids), IVF recall@5 must be near-exact:
    true neighbors share the query's cell, which is always probed
    first."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_ann_ivf_topk, q_ann_topk_cosine,
    )

    rng = np.random.default_rng(7)
    cents = rng.normal(size=(5, 16))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    for i in range(100):
        lab = i % 5
        v = cents[lab] + 0.05 * rng.normal(size=16)
        rows.append((i, [float(x) for x in v], lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    path = "/tmp/ivf_clustered"
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    ivf = q_ann_ivf_topk(spark, path).toPandas()
    ex = q_ann_topk_cosine(spark, path).toPandas()
    ex = ex[ex["query_id"] < 10]
    hits = tot = 0
    for q in range(10):
        ei = set(ex.loc[ex["query_id"] == q, "cand_id"])
        ii = set(ivf.loc[ivf["query_id"] == q, "cand_id"])
        hits += len(ei & ii)
        tot += len(ei)
    assert hits / tot >= 0.95, hits / tot


def test_embedding_dup_candidates_recall(spark):
    """Planted near-duplicate vectors (cos ~0.99) must be recovered by
    the banded hyperplane LSH: per-pair band-match probability at
    theta~8 deg is ~0.97 with 2 bands of 4 planes; with fixed md5 planes
    the outcome is deterministic — assert recall >= 0.8 on the planted
    set, and that every verified pair really has cos >= threshold."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        DUP_COS_THRESHOLD, _dup_candidate_pairs, q_dedup_embedding_cosine,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    planted = set()
    for i in range(30):
        rows.append((2 * i, [float(x) for x in base[i]]))
        twin = base[i] + 0.05 * rng.normal(size=32)
        rows.append((2 * i + 1, [float(x) for x in twin]))
        cos = float(base[i] @ twin / np.linalg.norm(twin))
        if cos >= 0.95:
            planted.add((2 * i, 2 * i + 1))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cands = {(a, b) for a, b in
             _dup_candidate_pairs(emb).toPandas().itertuples(index=False)}
    assert planted, "corpus must contain planted twins"
    recall = len(planted & cands) / len(planted)
    assert recall >= 0.8, (recall, planted - cands)

    # verification stage on the real table: reported pairs are exact
    dup = q_dedup_embedding_cosine(spark, SF).toPandas()
    assert (dup["vec_a"] < dup["vec_b"]).all()
    assert (dup["cos_sim"] >= DUP_COS_THRESHOLD).all()


def test_train_val_split_determinism_and_stability(spark):
    """The hash split must be (a) size-independent — a doc keeps its
    assignment when the corpus is subset — and (b) roughly proportioned
    to the threshold."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.curation import (
        TRAIN_FRACTION, q_train_val_split,
    )

    rep = q_train_val_split(spark, SF).toPandas()
    tr = rep.loc[rep["split"] == "train", "n_docs"].sum()
    tot = rep["n_docs"].sum()
    assert abs(tr / tot - TRAIN_FRACTION) < 0.08, tr / tot

    # subset stability: assignment depends only on doc_id
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frac = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                   16, 10).cast("double") / F.lit(float(16 ** 8)))
    full = {r["doc_id"]: r["s"] for r in docs.select(
        "doc_id", F.when(frac < TRAIN_FRACTION, "train").otherwise("val")
        .alias("s")).collect()}
    sub = {r["doc_id"]: r["s"] for r in docs.limit(100).select(
        "doc_id", F.when(frac < TRAIN_FRACTION, "train").otherwise("val")
        .alias("s")).collect()}
    assert all(full[d] == s for d, s in sub.items())


def test_curation_quantile_threshold_is_live(spark):
    """The quantile cut must be data-driven: a higher quantile keeps
    fewer docs, the reported threshold equals the corpus quality at the
    requested rank, and the threshold column is constant across the
    report."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        curation_report_quantile,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lo = curation_report_quantile(docs, quality_quantile=0.2).toPandas()
    hi = curation_report_quantile(docs, quality_quantile=0.9).toPandas()
    assert lo["quality_thr"].nunique() == 1
    assert hi["quality_thr"].nunique() == 1
    assert hi["quality_thr"].iloc[0] > lo["quality_thr"].iloc[0]
    assert hi["n_kept"].sum() < lo["n_kept"].sum()

    # rank-defined threshold: the value at ascending rank ceil(q*n) of
    # the r6-quantized scores
    import math

    from atr_adaptive_laguerre_spark.operators.text import (
        quality_cols, words_col,
    )
    from pyspark.sql import functions as F

    q6 = (docs.select(
        (F.floor(quality_cols(words_col())[2] * 1000000.0 + 0.5)
         / 1000000.0).alias("q6"), "doc_id")
        .toPandas().sort_values(["q6", "doc_id"])["q6"].tolist())
    for rep, qq in ((lo, 0.2), (hi, 0.9)):
        k = math.ceil(qq * len(q6))
        assert rep["quality_thr"].iloc[0] == q6[k - 1]


def test_sample_stratified_and_contamination_invariants(spark):
    """Stratified sampling: per-source rates stay inside the documented
    band, realized sampling never exceeds the stratum size, and the
    assignment is deterministic across invocations.  Contamination:
    the benchmark source itself never appears, counts are bounded by
    stratum sizes, and a doc sharing an 8-gram with the benchmark set
    is flagged (template cliques guarantee at least one hit at sf0.001)."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        BENCHMARK_SOURCE, q_contamination_check,
        q_corpus_sample_stratified,
    )

    s1 = q_corpus_sample_stratified(spark, SF).toPandas()
    s2 = q_corpus_sample_stratified(spark, SF).toPandas()
    assert s1.equals(s2)
    assert ((s1["sample_rate"] >= 0.25) & (s1["sample_rate"] <= 0.75)).all()
    assert (s1["n_sampled"] <= s1["n_docs"]).all()
    assert s1["source"].is_unique

    c = q_contamination_check(spark, SF).toPandas()
    assert BENCHMARK_SOURCE not in set(c["source"])
    assert (c["n_contaminated"] <= c["n_docs"]).all()
    assert (c["contamination_ratio"] <= 1.0).all()
    # the synthetic corpus's template cliques span sources, so a broken
    # shingle join (zero hits everywhere) must FAIL here
    assert c["n_contaminated"].sum() > 0


def test_text_repetition_invariants(spark):
    """Gopher repetition metrics: fractions live in (0, 1], n_tokens
    agrees with the whitespace tokenization, and the top-unigram
    fraction is bounded below by 1/n (some word must reach the mean)."""
    from atr_adaptive_laguerre_spark.operators.text import (
        q_text_repetition, q_token_counts,
    )

    rep = q_text_repetition(spark, SF).toPandas().set_index("doc_id")
    tc = q_token_counts(spark, SF).toPandas().set_index("doc_id")
    assert rep.index.equals(tc.index.sort_values())
    assert (rep["n_tokens"] == tc.loc[rep.index, "ws_tokens"]).all()
    for c in ("top_unigram_frac", "top_bigram_frac", "dup_trigram_frac"):
        assert ((rep[c] >= 0) & (rep[c] <= 1)).all(), c
    assert (rep["top_unigram_frac"] >= 1.0 / rep["n_tokens"] - 1e-6).all()
    # bigrams repeat at most as sharply as unigrams: the top bigram's
    # count <= the top unigram's count while totals differ by one
    n = rep["n_tokens"].astype(float)
    top_uni = rep["top_unigram_frac"] * n
    top_bi = rep["top_bigram_frac"] * (n - 1)
    assert (top_bi <= top_uni + 1e-3).all()


def test_chunk_crossdoc_invariants(spark):
    """Sub-document chunk dedup: chunk counts match floor(words/W),
    distinct <= total, shared <= distinct, and the shared flag is
    symmetric (a chunk hash shared by doc A is shared by >= 2 docs)."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        CHUNK_W, chunks_col, q_dedup_chunk_crossdoc,
    )
    from atr_adaptive_laguerre_spark.operators.io import read_table
    from pyspark.sql import functions as F

    rep = q_dedup_chunk_crossdoc(spark, SF).toPandas().set_index("doc_id")
    assert (rep["n_distinct_chunks"] <= rep["n_chunks"]).all()
    assert (rep["n_shared_chunks"] <= rep["n_distinct_chunks"]).all()
    assert ((rep["shared_chunk_frac"] >= 0)
            & (rep["shared_chunk_frac"] <= 1)).all()

    docs = read_table(spark, SF, "documents")
    words = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("nw"),
        F.size(chunks_col()).alias("nc")).toPandas().set_index("doc_id")
    expect = (words["nw"] // CHUNK_W).astype("int64")
    assert (words["nc"] == expect).all()
    assert (rep["n_chunks"] == expect.loc[rep.index]).all()

    # symmetry: recompute the per-doc shared-chunk count from the raw
    # explode (a chunk is shared iff >= 2 distinct docs hold its hash)
    # and compare exactly
    ch = (docs.select("doc_id", F.explode(chunks_col()).alias("h"))
          .distinct())
    nd = ch.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    expect_shared = (
        ch.join(nd, "h")
        .groupBy("doc_id")
        .agg(F.sum((F.col("nd") >= 2).cast("long")).alias("ns"))
        .toPandas().set_index("doc_id")["ns"])
    got = rep["n_shared_chunks"]
    assert (got.loc[expect_shared.index] == expect_shared).all()
    assert got.drop(expect_shared.index, errors="ignore").eq(0).all()
    # the synthetic corpus's template cliques guarantee cross-doc hits
    assert got.sum() > 0


def test_domain_mix_weights(spark):
    """Temperature-scaled mixture weights: both weight columns sum to 1
    (up to r6 quantization), and T=2 strictly flattens — the largest
    domain's mix weight never exceeds its natural weight and the
    smallest domain's never falls below it."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        q_corpus_domain_mix,
    )

    mix = q_corpus_domain_mix(spark, SF).toPandas()
    eps = 1e-6 * len(mix) + 1e-9
    assert abs(mix["natural_weight"].sum() - 1.0) <= eps
    assert abs(mix["mix_weight_t2"].sum() - 1.0) <= eps
    big = mix.loc[mix["tokens"].idxmax()]
    small = mix.loc[mix["tokens"].idxmin()]
    assert big["mix_weight_t2"] <= big["natural_weight"] + 1e-6
    assert small["mix_weight_t2"] >= small["natural_weight"] - 1e-6
    assert (mix["n_docs"] > 0).all() and (mix["tokens"] > 0).all()


def test_sequence_packing_prefix_sum(spark):
    """The distributed two-level prefix sum must equal the exclusive
    cumulative sum in doc_id order, and sequence spans must match a
    direct recompute from (offset, n_tokens)."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        SEQ_LEN, q_sequence_packing,
    )

    p = (q_sequence_packing(spark, SF).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    expect_off = p["n_tokens"].cumsum().shift(1, fill_value=0)
    assert (p["tok_offset"] == expect_off).all()
    nz = p["n_tokens"] > 0
    first = p["tok_offset"] // SEQ_LEN
    last = (p["tok_offset"] + p["n_tokens"] - 1) // SEQ_LEN
    assert (p.loc[nz, "first_seq"] == first[nz]).all()
    assert (p.loc[nz, "last_seq"] == last[nz]).all()
    assert (p.loc[nz, "n_seqs_spanned"] == (last - first + 1)[nz]).all()
    assert (p.loc[~nz, "n_seqs_spanned"] == 0).all()
    # packing is tight: total sequences == ceil(total tokens / L)
    total = int(p["n_tokens"].sum())
    assert int(p["last_seq"].max()) == (total - 1) // SEQ_LEN


def test_tfidf_topk_invariants(spark):
    """Top-k keyword extraction: contiguous ranks, non-increasing
    scores within a doc, distinct terms per doc, and score == tf*idf
    with idf recomputed from first principles."""
    import math

    from atr_adaptive_laguerre_spark.operators.text import (
        TFIDF_K, q_tfidf_topk,
    )

    p = q_tfidf_topk(spark, SF).toPandas()
    assert p.groupby("doc_id")["rnk"].apply(
        lambda r: (sorted(r) == list(range(1, len(r) + 1)))).all()
    assert (p.groupby("doc_id")["rnk"].size() <= TFIDF_K).all()
    assert p.groupby("doc_id")["term"].nunique().equals(
        p.groupby("doc_id")["term"].size())
    for _, g in p.groupby("doc_id"):
        s = g.sort_values("rnk")["score"].to_numpy()
        assert (s[:-1] >= s[1:] - 1e-12).all()
    # recompute idf for one (doc, term) pair from the raw corpus
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    words = docs["text"].str.strip().str.lower().str.split(r"\s+")
    n_docs = len(docs)
    row = p.iloc[0]
    df_term = sum(row["term"] in ws for ws in words)
    idf = math.floor(math.log(n_docs / df_term) * 1e6 + 0.5) / 1e6
    expect = math.floor(row["tf"] * idf * 1e6 + 0.5) / 1e6
    assert abs(row["score"] - expect) < 1e-9


def test_lm_bigram_surprisal_invariants(spark):
    """Bigram-LM scoring: one row per doc, n_bigrams == n_tokens-1,
    surprisal positive where defined, and the doc-level max bounds the
    mean."""
    from atr_adaptive_laguerre_spark.operators.text import (
        q_lm_bigram_surprisal,
    )

    p = (q_lm_bigram_surprisal(spark, SF).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    docs = (spark.read.parquet(f"{SF}/documents.parquet").toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(p) == len(docs)
    n_tok = docs["text"].str.strip().str.lower().str.split(r"\s+") \
        .map(len)
    assert (p["n_bigrams"] == (n_tok - 1).clip(lower=0)).all()
    nz = p["n_bigrams"] > 0
    assert (p.loc[nz, "mean_surprisal"] > 0).all()
    assert (p.loc[nz, "max_surprisal"]
            >= p.loc[nz, "mean_surprisal"] - 1e-9).all()
    assert (p.loc[~nz, "mean_surprisal"] == 0).all()


def test_corpus_mix_sample_budget(spark):
    """Mixture sampling must (a) cap rates at 1e6 ppm, (b) keep
    realized token mass statistically near each source's target at
    uncapped rates, and (c) hand up-weighted small sources a higher
    sampling rate than down-weighted big ones (the T=2 mixture
    property)."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        MIX_BUDGET_DEN, q_corpus_mix_sample,
    )

    p = (q_corpus_mix_sample(spark, SF).toPandas()
         .sort_values("tokens").reset_index(drop=True))
    assert (p["rate_ppm"] <= 1_000_000).all()
    assert (p["n_kept"] <= p["n_docs"]).all()
    assert (p["tokens_kept"] <= p["tokens"]).all()
    # targets sum to ~ the global budget
    budget = int(p["tokens"].sum()) // MIX_BUDGET_DEN
    assert abs(int(p["target_tokens"].sum()) - budget) <= len(p)
    # rates are monotone non-increasing in source size (sqrt weighting)
    r = p["rate_ppm"].to_numpy()
    assert (r[:-1] >= r[1:]).all()


def test_perplexity_buckets_terciles(spark):
    """Head/middle/tail bucketing must partition the corpus (doc and
    token mass both conserved), cut at non-decreasing score boundaries
    (every head score <= every middle score <= every tail score), and
    put ~1/3 of docs at or below each threshold by the rank
    definition."""
    import duckdb

    from atr_adaptive_laguerre_spark.operators.curation import (
        q_corpus_perplexity_buckets,
    )

    p = q_corpus_perplexity_buckets(spark, SF).toPandas()
    assert set(p["bucket"]) <= {"head", "middle", "tail"}
    docs = duckdb.sql(
        f"SELECT COUNT(*) n, SUM(length(regexp_split_to_array("
        f"trim(lower(text)), '\\s+'))) t"
        f" FROM '{SF}/documents.parquet'").fetchone()
    assert int(p["n_docs"].sum()) == docs[0]
    assert int(p["tokens"].sum()) == docs[1]
    hi = {b: p.loc[p["bucket"] == b, "max_score_milli"].max()
          for b in ("head", "middle", "tail") if (p["bucket"] == b).any()}
    lo = {b: p.loc[p["bucket"] == b, "min_score_milli"].min()
          for b in ("head", "middle", "tail") if (p["bucket"] == b).any()}
    if "head" in hi and "middle" in lo:
        assert hi["head"] < lo["middle"]
    if "middle" in hi and "tail" in lo:
        assert hi["middle"] < lo["tail"]
    # rank-tercile sizing: head holds >= ceil(n/3) docs minus ties slack
    n = int(p["n_docs"].sum())
    n_head = int(p.loc[p["bucket"] == "head", "n_docs"].sum())
    assert n_head >= (n + 2) // 3 - 0  # threshold includes the tercile rank
    assert n_head <= n  # and never exceeds the corpus


def test_pii_scrub_planted(spark):
    """The catalog corpus contains no PII, so the cross-engine regex
    semantics (Java regex vs RE2) are pinned here on a planted frame
    run through BOTH engines: per-doc counts AND the redacted text
    must agree exactly."""
    import duckdb
    import pandas as pd

    from atr_adaptive_laguerre_spark.operators.text import (
        _pii_oracle_exprs, pii_scrub_cols,
    )

    rows = [
        (0, "contact bob.smith+spam@mail.example.org today"),
        (1, "call 555-867-5309 or 555.867.5309 x2"),
        (2, "server at 10.0.255.3 and 192.168.1.1."),
        (3, "a@b.co nested e.mail@sub.domain.io twice a@b.co"),
        (4, "no pii here at all"),
        (5, "edge 1234.5.6.7 not-an-ip 999.999.999.999 is counted"),
        (6, ""),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (pii_scrub_cols(spark.createDataFrame(pdf))
           .select("doc_id", "n_email", "n_phone", "n_ip", "redacted",
                   "chars_delta")
           .toPandas().sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("docs", pdf)
    e, p, i, r = _pii_oracle_exprs()
    want = con.sql(
        f"SELECT doc_id, {e} AS n_email, {p} AS n_phone, {i} AS n_ip, "
        f"{r} AS redacted, "
        f"(length(text) - length({r}))::BIGINT AS chars_delta "
        f"FROM docs ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(
        got.astype({"n_email": "int64", "n_phone": "int64",
                    "n_ip": "int64", "chars_delta": "int64"}),
        want.astype({"n_email": "int64", "n_phone": "int64",
                     "n_ip": "int64", "chars_delta": "int64"}))
    # sanity on the planted values themselves
    assert got["n_email"].tolist() == [1, 0, 0, 3, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 2, 0, 0, 0, 0, 0]
    assert "<EMAIL>" in got.loc[0, "redacted"]
    assert "<PHONE>" in got.loc[1, "redacted"]
    assert "<IP>" in got.loc[2, "redacted"]


def test_quality_classifier_separates_sources(spark):
    """NB classifier invariants: scores exist for every doc, empty
    docs score 0, and the positive-source mean score exceeds the
    negative mean (the model must at least separate its own training
    classes in-sample)."""
    from atr_adaptive_laguerre_spark.operators.text import (
        q_quality_classifier,
    )

    p = q_quality_classifier(spark, SF).toPandas()
    assert p["doc_id"].is_unique
    assert (p.loc[p["n_tokens"] == 0, "score_milli"] == 0).all()
    pos = p.loc[p["label_pos"] == 1, "score_milli"]
    neg = p.loc[p["label_pos"] == 0, "score_milli"]
    if len(pos) and len(neg):
        assert pos.mean() > neg.mean()


def test_corpus_shuffle_is_permutation(spark):
    """Shuffle positions must be a bijection onto [0, n), shards must
    round-robin, and the permutation must actually deviate from id
    order (it's a shuffle, not a sort)."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        SHUFFLE_SHARDS, q_corpus_shuffle,
    )

    p = (q_corpus_shuffle(spark, SF).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    n = len(p)
    assert sorted(p["shuffle_pos"]) == list(range(n))
    assert (p["shard"] == p["shuffle_pos"] % SHUFFLE_SHARDS).all()
    # not the identity (or reverse) permutation
    assert (p["shuffle_pos"] != p.index).any()
    assert (p["shuffle_pos"] != n - 1 - p.index).any()


def test_principal_axis_matches_numpy():
    """Power iteration on a synthetic covariance must match
    numpy.linalg.eigh's top eigenpair (driver-side d x d step of the
    PCA-whitening pipeline)."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        principal_axis,
    )

    rng = np.random.RandomState(7)
    b = rng.randn(40, 6)
    cov = np.cov(b, rowvar=False)
    v, lam = principal_axis(cov.tolist())
    w, vecs = np.linalg.eigh(cov)
    assert abs(lam - w[-1]) < 1e-9
    top = vecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert np.abs(v - top).max() < 1e-9


def test_embedding_covariance_invariants(spark):
    """The covariance query must emit exactly the d(d+1)/2 upper
    triangle with constant n, non-negative diagonal, and values close
    to numpy's biased covariance on the same vectors (within the
    micro-quantization error bound)."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_embedding_covariance,
    )

    p = (q_embedding_covariance(spark, SF).toPandas()
         .sort_values(["i", "j"]).reset_index(drop=True))
    d = int(p["j"].max()) + 1
    assert len(p) == d * (d + 1) // 2
    assert p["n"].nunique() == 1
    diag = p.loc[p["i"] == p["j"], "cov"]
    assert (diag >= -1e-6).all()

    import duckdb
    vecs = duckdb.sql(
        "SELECT embedding FROM "
        f"'{SF}/embeddings.parquet' ORDER BY vec_id").fetchnumpy()
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in vecs["embedding"]])
    ref = np.cov(m, rowvar=False, bias=True)
    got = np.zeros((d, d))
    got[p["i"], p["j"]] = p["cov"]
    iu = np.triu_indices(d)
    assert np.abs(got[iu] - ref[iu]).max() < 2e-6


def test_bpe_train_matches_reference_python(spark):
    """The distributed BPE trainer must learn the same merges, in the
    same order, as a pure-Python reference implementation of Sennrich
    et al.'s algorithm (count adjacent symbol pairs over the word
    vocabulary, merge the most frequent, leftmost-first rewrite, ties
    by pair string)."""
    from collections import Counter

    from atr_adaptive_laguerre_spark.operators.text import bpe_train

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = bpe_train(docs, n_merges=6)

    pdf = docs.toPandas()
    vocab = Counter()
    for t in pdf["text"]:
        for w in t.strip().lower().split():
            if w:
                vocab[tuple(w)] += 1

    def ref_merges(vocab, n):
        # split-AWARE pairs (the q_bpe_train_merges contract): two
        # splits concatenating to the same text are distinct; ties by
        # the wrapped pair string <a><b>
        merges = []
        vocab = dict(vocab)
        for _ in range(n):
            pc = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            if not pc:
                break
            best = min(pc.items(),
                       key=lambda kv: (-kv[1],
                                       f"<{kv[0][0]}><{kv[0][1]}>"))[0]
            merges.append(best)
            new = {}
            for syms, c in vocab.items():
                out, pend = [], None
                for x in syms:
                    if pend is not None and (pend, x) == best:
                        out.append(pend + x)
                        pend = None
                    elif pend is None:
                        pend = x
                    else:
                        out.append(pend)
                        pend = x
                if pend is not None:
                    out.append(pend)
                new[tuple(out)] = new.get(tuple(out), 0) + c
            vocab = new
        return merges

    want = ref_merges(vocab, 6)
    assert got == want, (got, want)


def test_train_val_kl_invariants(spark):
    """Smoothed KL between proper distributions is non-negative, and
    the per-source token totals must equal the corpus's own split
    token mass."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        q_train_val_kl,
    )

    p = q_train_val_kl(spark, SF).toPandas()
    assert (p["kl_nats"] >= -1e-9).all()
    assert (p["vocab"] > 0).all()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    total_tokens = sum(
        len(t.strip().lower().split()) if t.strip() else 1
        for t in docs["text"])
    assert int(p["n_train_tokens"].sum() + p["n_val_tokens"].sum()) \
        == total_tokens


def test_dedup_incremental_invariants(spark):
    """One row per new-batch doc; dup counts bounded by candidate
    counts; best match present iff there is a dup, always from the
    index side, always at or above the threshold."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        INCR_MOD, JACCARD_THRESHOLD, q_dedup_incremental,
    )

    rep = q_dedup_incremental(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    n_new = int((docs["doc_id"] % INCR_MOD == 0).sum())
    assert len(rep) == n_new
    assert (rep["n_dups"] <= rep["n_candidates"]).all()
    has_dup = rep["n_dups"] > 0
    assert (rep.loc[has_dup, "best_match_id"] % INCR_MOD != 0).all()
    assert rep.loc[~has_dup, "best_match_id"].isna().all()
    assert (rep.loc[has_dup, "best_jaccard"]
            >= JACCARD_THRESHOLD - 1e-9).all()


def test_dedup_incremental_matches_full_lsh_cross_pairs(spark):
    """The incremental report's verified dups must be EXACTLY the
    full-corpus verified pair list restricted to new-vs-index pairs —
    the increment path may not gain or lose pairs relative to
    re-deduplicating everything."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        INCR_MOD, _docs, q_dedup_incremental, verified_jaccard_pairs,
    )

    full = verified_jaccard_pairs(_docs(spark, SF)).toPandas()
    cross = full[(full["doc_a"] % INCR_MOD == 0)
                 != (full["doc_b"] % INCR_MOD == 0)]
    rep = q_dedup_incremental(spark, SF).toPandas()
    assert int(rep["n_dups"].sum()) == len(cross)
    # per new doc too, not just in aggregate
    import pandas as pd

    new_side = cross.apply(
        lambda r: r["doc_a"] if r["doc_a"] % INCR_MOD == 0 else r["doc_b"],
        axis=1)
    want = (new_side.value_counts() if len(cross) else pd.Series(dtype=int))
    got = rep.set_index("doc_id")["n_dups"]
    for doc, n in want.items():
        assert got[doc] == n


def test_incremental_dedup_planted_neardup(spark):
    """A planted near-copy of an indexed doc must surface with the
    indexed doc as its best match; an unrelated new doc must not."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        band_signatures, incremental_dedup_report, shingles_col,
    )
    from pyspark.sql import functions as F

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the indexing pipeline watches every word")
    idx_docs = spark.createDataFrame(
        [(1, base),
         (2, "completely different content about spark shuffles and "
             "partition pruning at terabyte scale for training data")],
        "doc_id long, text string")
    new_docs = spark.createDataFrame(
        [(100, base + " with a tiny suffix edit"),
         (101, "nothing in common with either indexed document at all "
               "pure fresh crawl text tokens")],
        "doc_id long, text string")
    rep = incremental_dedup_report(
        new_docs, band_signatures(idx_docs),
        idx_docs.select("doc_id", shingles_col().alias("sh"))
    ).orderBy("doc_id").toPandas()
    assert rep.loc[rep["doc_id"] == 100, "best_match_id"].iloc[0] == 1
    assert rep.loc[rep["doc_id"] == 100, "n_dups"].iloc[0] >= 1
    assert rep.loc[rep["doc_id"] == 101, "n_dups"].iloc[0] == 0


def test_chunk_clean_keep_first_semantics(spark):
    """Planted corpus: doc 1 and doc 2 share an identical 16-word
    chunk; doc 1 (lower id) keeps it, doc 2 loses it; tails always
    survive; a doc below chunk width is passed through untouched."""
    import hashlib

    from atr_adaptive_laguerre_spark.operators.dedup import chunk_clean

    shared = " ".join(f"w{i}" for i in range(16))
    uniq2 = " ".join(f"x{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, shared + " tail one"),
         (2, uniq2 + " " + shared + " tail two"),
         (3, "short doc only")],
        "doc_id long, text string")
    rep = chunk_clean(docs).toPandas().set_index("doc_id")

    assert rep.loc[1, "n_chunks"] == 1 and rep.loc[1, "n_kept"] == 1
    assert rep.loc[2, "n_chunks"] == 2 and rep.loc[2, "n_kept"] == 1
    assert rep.loc[3, "n_chunks"] == 0 and rep.loc[3, "n_kept"] == 0

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert rep.loc[1, "clean_md5"] == md5(shared + " tail one")
    assert rep.loc[2, "clean_md5"] == md5(uniq2 + " tail two")
    assert rep.loc[3, "clean_md5"] == md5("short doc only")
    assert rep.loc[2, "n_clean_words"] == 18


def test_chunk_clean_within_doc_repeat(spark):
    """A chunk repeated INSIDE one doc keeps only its first position."""
    from atr_adaptive_laguerre_spark.operators.dedup import chunk_clean

    c = " ".join(f"r{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(7, c + " " + c)], "doc_id long, text string")
    rep = chunk_clean(docs).toPandas()
    assert rep.loc[0, "n_chunks"] == 2
    assert rep.loc[0, "n_kept"] == 1
    assert rep.loc[0, "n_clean_words"] == 16


def _bpe_encode_py(text, merges):
    """Independent reference: per-word symbol lists, each merge applied
    in order, scanning left-to-right and fusing non-overlapping
    adjacent (a, b) occurrences — classic Sennrich apply."""
    out_words = []
    for w in text.strip().lower().split():
        syms = list(w)
        for a, b in merges:
            i, new = 0, []
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out_words.append(syms)
    return out_words


def test_bpe_encode_matches_python_reference(spark):
    """The wrap-and-replace encode must produce exactly the tokens of a
    classic per-word left-to-right BPE apply — including overlap cases
    (aaa with merge (a,a) -> [aa, a]) and chained merges."""
    from atr_adaptive_laguerre_spark.operators.text import (
        BPE_MERGES, bpe_encode_col,
    )
    from pyspark.sql import functions as F

    texts = [
        "table value tables valueless",
        "aaa abab le le tab",
        "vvv uuu ee ll",
        "the quick brown fox leaps over a table of values",
    ]
    merges = BPE_MERGES + [("a", "a")]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = (docs.select("doc_id",
                       bpe_encode_col(F.col("text"), merges).alias("e"))
           .orderBy("doc_id").toPandas())
    for i, t in enumerate(texts):
        want = " ".join(
            "".join(f"<{s}>" for s in syms)
            for syms in _bpe_encode_py(t, merges))
        assert got.loc[i, "e"] == want, (t, got.loc[i, "e"], want)


def test_bpe_encode_roundtrip_with_trained_merges(spark):
    """End-to-end trainer -> encoder: encoding with bpe_train's learned
    merges must never split across words, must preserve the character
    stream exactly (decode = strip boundaries), and must strictly
    compress the symbol count."""
    from atr_adaptive_laguerre_spark.operators.text import (
        bpe_encode_col, bpe_train,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    # the trainer returns (a, b) splits directly — train once, encode
    # everywhere (the composed tokenizer pipeline)
    pairs = bpe_train(docs, n_merges=6)
    assert all(isinstance(p, tuple) and len(p) == 2 for p in pairs)
    enc = (docs.select("doc_id", F.col("text"),
                       bpe_encode_col(F.col("text"), pairs).alias("e"))
           .toPandas())
    for _, r in enc.iterrows():
        stripped = r["e"].replace("<", "").replace(">", "")
        assert stripped == " ".join(r["text"].strip().lower().split())
        n_tok = r["e"].count("<")
        n_chars = len(stripped.replace(" ", ""))
        assert n_tok < n_chars

def test_pq_codes_dense_and_duplicate_attains_min(spark):
    """PQ structural invariants on a planted corpus: every vector gets
    exactly PQ_M codes, all inside [0, PQ_KS); and an exact duplicate
    of a query vector attains the GLOBAL minimum ADC distance (its
    codes are the query's per-subspace argmin centroids, so its LUT sum
    is the lower bound over all code combinations) -> rank 1 modulo
    distance ties."""
    import numpy as np
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.similarity import (
        PQ_KS, PQ_M, _pq_codebook, _pq_subvectors, pq_topk,
    )

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=64).tolist()) for i in range(40)]
    rows.append((100, rows[3][1]))          # exact duplicate of query 3
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    sub = _pq_subvectors(emb)
    cb = _pq_codebook(sub)
    cbp = cb.toPandas()
    assert sorted(cbp["m"].unique()) == list(range(PQ_M))
    # empty-cell carry keeps every (m, code) slot alive
    assert len(cbp) == PQ_M * PQ_KS
    assert set(cbp["code"]) == set(range(PQ_KS))

    top = pq_topk(emb, n_queries=5, top_k=3).toPandas()
    assert set(top["query_id"]) == set(range(5))
    g3 = top[top["query_id"] == 3].sort_values("rank")
    best = g3.iloc[0]
    dup_rows = g3[g3["cand_id"] == 100]
    assert not dup_rows.empty, "planted duplicate missing from top-3"
    assert dup_rows.iloc[0]["pq_dist"] == best["pq_dist"]


def test_bpe_encode_randomized_vs_reference(spark):
    """Seeded fuzz: 150 random texts over a 4-letter alphabet (high
    merge-collision density) x a random chained merge list — the
    Catalyst replace-chain must match the per-word left-to-right apply
    on every row."""
    import random

    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.text import bpe_encode_col

    rng = random.Random(1234)
    sym = "abcd"
    merges = [("a", "a"), ("b", "c"), ("a", "bc"), ("abc", "d"),
              ("d", "a"), ("aa", "aa")]
    texts = [
        " ".join("".join(rng.choice(sym)
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(rng.randint(1, 8)))
        for _ in range(150)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = (docs.select("doc_id",
                       bpe_encode_col(F.col("text"), merges).alias("e"))
           .orderBy("doc_id").toPandas())
    for i, t in enumerate(texts):
        want = " ".join(
            "".join(f"<{s}>" for s in syms)
            for syms in _bpe_encode_py(t, merges))
        assert got.loc[i, "e"] == want, (t, got.loc[i, "e"], want)


def test_pq_index_build_query_matches_inline(spark, tmp_path):
    """The persisted IVF+PQ index must serve EXACTLY what the inline
    retrain-per-call query computes on the same corpus (training is
    deterministic), and the inverted-list scan must prune to the
    probed cells' partition directories."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, build_pq_index, q_ann_ivfpq_topk, query_pq_index,
    )

    sf = "/root/testdata/sf0.001"
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    idx = str(tmp_path / "pq_index")
    build_pq_index(emb, idx)

    queries = emb.filter(F.col("vec_id") < IVF_N_QUERIES)
    served = query_pq_index(spark, idx, queries)
    inline = q_ann_ivfpq_topk(spark, sf)
    sp = served.toPandas().reset_index(drop=True)
    ip = inline.toPandas().reset_index(drop=True)
    assert sp.equals(ip), (sp.head(), ip.head())

    # partition pruning: the cell predicate reaches the inv scan as a
    # PARTITION filter (directory-level pruning), not a data filter
    plan = served._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*IN", plan, re.S)
    assert m is not None, plan[:3000]


def test_dedup_semantic_brute_force_and_planted(spark):
    """SemDeDup stage-2/3 exactness: given the engine's own cell
    assignment, recompute within-cell pairs / n_similar / keep flags
    with a sequential-fold numpy oracle (the same IEEE op order as the
    JVM's ``aggregate`` fold) and compare exactly; planted
    near-identical twins must lose their higher id wherever both twins
    land in the same cell.  (Full cross-engine value check runs in the
    DuckDB gate; this pins the pair/keep semantics independently.)"""
    import math

    from atr_adaptive_laguerre_spark.operators.similarity import (
        SEM_TAU, q_dedup_semantic,
    )

    rng = np.random.default_rng(17)
    rows = []
    twins = []
    vid = 0
    for i in range(20):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        twin = base + 0.03 * rng.normal(size=64)
        lone = rng.normal(size=64)
        rows.append((vid, [float(x) for x in base], i))
        rows.append((vid + 1, [float(x) for x in twin], i))
        rows.append((vid + 2, [float(x) for x in lone], i))
        twins.append((vid, vid + 1))
        vid += 3
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    path = "/tmp/semdedup_corpus"
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    out = (q_dedup_semantic(spark, path).toPandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(out) == vid

    f32 = {v: np.asarray(vec, dtype=np.float32).astype(np.float64)
           for v, vec, _ in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    nrm = {v: math.sqrt(fold_dot(f32[v], f32[v])) for v in f32}
    cell = dict(zip(out["vec_id"], out["cell"]))
    ids = sorted(f32)
    n_similar = {v: 0 for v in ids}
    dropped = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if cell[a] != cell[b]:
                continue
            cos = r6(fold_dot(f32[a], f32[b]) / (nrm[a] * nrm[b]))
            if cos >= SEM_TAU:
                n_similar[a] += 1
                n_similar[b] += 1
                dropped.add(b)
    assert out["n_similar"].tolist() == [n_similar[v] for v in ids]
    assert out["is_kept"].tolist() == [
        0 if v in dropped else 1 for v in ids]

    # planted twins: wherever both share a cell, the higher id drops
    co_celled = [(a, b) for a, b in twins if cell[a] == cell[b]]
    assert len(co_celled) >= 16, co_celled
    assert all(b in dropped for _, b in co_celled)


def test_knn_graph_matches_brute_force(spark):
    """k-NN graph exactness given the engine's own cell assignment:
    recompute every vector's within-cell top-K by the same
    sequential-fold cosine and compare (vec_id, rank, neighbor_id)
    exactly; each planted twin's rank-1 neighbor must be its twin."""
    import math

    from atr_adaptive_laguerre_spark.operators.similarity import (
        KNN_K, q_knn_graph,
    )

    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    twins = []
    for i in range(15):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        twin = base + 0.03 * rng.normal(size=64)
        lone = rng.normal(size=64)
        rows.append((vid, [float(x) for x in base], i))
        rows.append((vid + 1, [float(x) for x in twin], i))
        rows.append((vid + 2, [float(x) for x in lone], i))
        twins.append((vid, vid + 1))
        vid += 3
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    path = "/tmp/knn_graph_corpus"
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    out = (q_knn_graph(spark, path).toPandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))

    f32 = {v: np.asarray(vec, dtype=np.float32).astype(np.float64)
           for v, vec, _ in rows}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = {v: math.sqrt(fold_dot(f32[v], f32[v])) for v in f32}
    cell = {}
    for v, c in zip(out["vec_id"], out["cell"]):
        cell[v] = c
    # vectors alone in their cell emit no edges; everything else must
    expected = []
    for a in sorted(cell):
        cands = []
        for b in sorted(cell):
            if b == a or cell[b] != cell[a]:
                continue
            cos = math.floor(
                fold_dot(f32[a], f32[b]) / (nrm[a] * nrm[b])
                * 1e6 + 0.5) / 1e6
            cands.append((-cos, b))
        for rank, (_, b) in enumerate(sorted(cands)[:KNN_K], start=1):
            expected.append((a, rank, b))
    got = list(zip(out["vec_id"], out["rank"], out["neighbor_id"]))
    assert got == expected

    # planted twins: rank-1 edge is the twin wherever co-celled
    r1 = {v: n for v, r, n in got if r == 1}
    co = [(a, b) for a, b in twins if cell.get(a) == cell.get(b)
          and a in cell and b in cell]
    assert len(co) >= 12, co
    for a, b in co:
        assert r1[a] == b and r1[b] == a, (a, b, r1.get(a), r1.get(b))


def test_bm25_search_matches_python_reference(spark):
    """BM25 top-N vs an independent pandas/python recomputation with the
    same quantization pipeline (r6 avgdl/idf, u6 per-term contribution
    before the per-doc sum): the returned doc set and every score match
    exactly, and the rank column is a valid total order under
    (score DESC, doc_id ASC)."""
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.text import (
        BM25_B, BM25_K1, BM25_QUERY, BM25_TOPN, q_bm25_search,
    )

    out = q_bm25_search(spark, SF).toPandas()
    assert list(out.columns) == ["rank", "doc_id", "score"]
    assert out["rank"].tolist() == list(range(1, len(out) + 1))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    words = {r.doc_id: r.text.strip().lower().split()
             for r in docs.itertuples()}
    n_docs = len(words)
    avgdl = r6(sum(len(w) for w in words.values()) / n_docs)
    dfreq = {t: sum(1 for w in words.values() if t in w)
             for t in BM25_QUERY}
    idf = {t: r6(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
           for t, df in dfreq.items()}
    scores = {}
    for d, w in words.items():
        acc, matched = 0, False
        for t in BM25_QUERY:
            tf = w.count(t)
            if tf == 0:
                continue
            matched = True
            c = idf[t] * ((tf * (BM25_K1 + 1.0))
                          / (tf + BM25_K1 * (1.0 - BM25_B
                                             + BM25_B * (len(w) / avgdl))))
            acc += math.floor(c * 1e6 + 0.5)
        if matched:
            scores[d] = acc / 1e6
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = expect[:BM25_TOPN]
    assert out["doc_id"].tolist() == [d for d, _ in expect]
    assert out["score"].tolist() == [s for _, s in expect]


def test_hard_negative_mining_matches_brute_force(spark):
    """Hard-negative exactness: recompute each anchor's top-K
    different-label neighbors with the sequential-fold cosine and
    compare (query_id, rank, cand_id) exactly; every returned negative
    must carry a label different from its anchor's."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.similarity import (
        HN_K, HN_N_QUERIES, q_hard_negative_mining,
    )

    out = q_hard_negative_mining(spark, SF).toPandas()
    assert (out["query_label"] != out["cand_label"]).all()
    assert set(out["query_id"]) == set(range(HN_N_QUERIES))

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = {r.vec_id: np.asarray(r.embedding,
                                 dtype=np.float32).astype(np.float64)
            for r in t.itertuples()}
    labels = dict(zip(t["vec_id"], t["label"]))

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    nrm = {v: math.sqrt(fold_dot(vecs[v], vecs[v])) for v in vecs}
    for qid in range(HN_N_QUERIES):
        sims = []
        for cid, cv in vecs.items():
            if labels[cid] == labels[qid]:
                continue
            cos = math.floor(fold_dot(vecs[qid], cv)
                             / (nrm[qid] * nrm[cid]) * 1e6 + 0.5) / 1e6
            sims.append((-cos, cid))
        sims.sort()
        expect = [cid for _, cid in sims[:HN_K]]
        got = (out[out["query_id"] == qid]
               .sort_values("rank")["cand_id"].tolist())
        assert got == expect, (qid, got, expect)


def test_dsir_planted_target_domain(spark):
    """DSIR semantics on a planted two-domain corpus: with a target
    sample drawn from domain A, every HELD-OUT domain-A doc must
    out-score every domain-B doc (the importance weight generalizes to
    lookalike docs, not just the sample itself — the paper's point)."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.curation import dsir_scores

    rows = []
    for i in range(10):
        rows.append((i, " ".join(f"alpha{j % 5}" for j in range(i, i + 30))))
    for i in range(10, 20):
        rows.append((i, " ".join(f"zulu{j % 5}" for j in range(i, i + 30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sc = dsir_scores(docs, F.col("doc_id") < 3).toPandas()
    sc = sc.set_index("doc_id")["s_micro"]
    held_a = [sc[i] for i in range(3, 10)]
    dom_b = [sc[i] for i in range(10, 20)]
    assert min(held_a) > max(dom_b), (held_a, dom_b)


def test_dsir_select_matches_python_reference(spark):
    """dsir_select top-N vs an independent python recomputation of the
    hashed-ngram importance pipeline (md5 buckets, add-one smoothing,
    micro-nat quantization before the exact-integer per-doc sum)."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.curation import (
        DSIR_BUCKETS, DSIR_TARGET_SOURCES, DSIR_TOP_N, q_dsir_select,
    )

    out = q_dsir_select(spark, SF).toPandas()
    assert list(out.columns) == ["rank", "doc_id", "source", "n_grams",
                                 "logw", "avg_logw"]
    assert out["rank"].tolist() == list(range(1, len(out) + 1))

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"]).to_pandas()

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    cdoc: dict = {}
    tgt_docs = set()
    for r in docs.itertuples():
        w = r.text.strip().lower().split()
        grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
        if r.source in DSIR_TARGET_SOURCES:
            tgt_docs.add(r.doc_id)
        for g in grams:
            key = (r.doc_id, bucket(g))
            cdoc[key] = cdoc.get(key, 0) + 1
    cr: dict = {}
    ct: dict = {}
    for (d, b), c in cdoc.items():
        cr[b] = cr.get(b, 0) + c
        if d in tgt_docs:
            ct[b] = ct.get(b, 0) + c
    tr, tt = sum(cr.values()), sum(ct.values())

    def lmicro(c, t):
        return math.floor(math.log((c + 1.0) / (t + DSIR_BUCKETS))
                          * 1e6 + 0.5)

    lpq = {b: lmicro(ct.get(b, 0), tt) - lmicro(cr[b], tr) for b in cr}
    s: dict = {}
    for (d, b), c in cdoc.items():
        s[d] = s.get(d, 0) + c * lpq[b]
    expect = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:DSIR_TOP_N]
    assert out["doc_id"].tolist() == [d for d, _ in expect]
    assert out["logw"].tolist() == [
        math.floor((sm / 1e6) * 1e6 + 0.5) / 1e6 for _, sm in expect]


def test_dsir_persisted_model_matches_inline(spark, tmp_path):
    """score_dsir_batch against a persisted build_dsir_model store is
    bit-identical to the inline dsir_scores on the training corpus, and
    a batch whose grams hash into buckets the training corpus never
    touched still scores (the dense model carries the smoothed default
    for zero-count buckets)."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.curation import (
        DSIR_TARGET_SOURCES, build_dsir_model, dsir_scores,
        score_dsir_batch,
    )
    from atr_adaptive_laguerre_spark.operators.io import read_table

    docs = read_table(spark, SF, "documents")
    is_tgt = F.col("source").isin(*DSIR_TARGET_SOURCES)
    inline = (dsir_scores(docs, is_tgt).toPandas()
              .sort_values("doc_id").reset_index(drop=True))
    model_dir = str(tmp_path / "dsir_model")
    build_dsir_model(docs, is_tgt, model_dir)
    served = (score_dsir_batch(spark, docs, model_dir).toPandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert inline["doc_id"].tolist() == served["doc_id"].tolist()
    assert inline["s_micro"].tolist() == served["s_micro"].tolist()
    assert inline["n_grams"].tolist() == served["n_grams"].tolist()

    novel = spark.createDataFrame(
        [(10_000_000, "zzqx9a zzqx9b zzqx9c zzqx9d zzqx9e")],
        "doc_id long, text string")
    out = score_dsir_batch(spark, novel, model_dir).toPandas()
    assert len(out) == 1
    assert out["n_grams"].iloc[0] == 9  # 5 unigrams + 4 bigrams
    assert out["s_micro"].iloc[0] != 0  # smoothed default applied


def test_embedding_standardize_zero_mean_unit_std(spark):
    """z-scored components must come out ~N(0,1) per dimension (mean 0,
    std 1 up to the r6 grid), and each z must reproduce (x - mu)/sig
    from the raw vectors."""
    import numpy as np
    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_embedding_standardize,
    )

    out = q_embedding_standardize(spark, SF).toPandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    n_vecs = len(emb)
    dim = len(emb["embedding"].iloc[0])
    assert len(out) == n_vecs * dim
    g = out.groupby("d")["z"]
    assert np.abs(g.mean()).max() < 1e-4
    assert np.abs(g.std(ddof=0) - 1.0).max() < 1e-3

    mat = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy())
    byvec = out.sort_values(["vec_id", "d"])
    x = mat.astype(np.float64).reshape(-1)
    expect = (x - byvec["mu"].to_numpy()) / byvec["sig"].to_numpy()
    # mu/sig in the output are r6-quantized (±5e-7); dividing by sig
    # amplifies that into the reconstruction by ~|z|/sig, so the bound
    # is ~1e-4 even though z itself is exact to the r6 grid
    assert np.abs(byvec["z"].to_numpy() - expect).max() < 1e-4


def test_pq_index_rerank_matches_inline(spark, tmp_path):
    """Serving-side rerank against the persisted index must be
    bit-identical to the inline retrain-per-call q_ann_ivfpq_rerank
    (training is deterministic; the refine only touches shortlisted
    rows' vectors)."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, build_pq_index, q_ann_ivfpq_rerank,
        query_pq_index_rerank,
    )

    sf = "/root/testdata/sf0.001"
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    idx = str(tmp_path / "pq_index")
    build_pq_index(emb, idx)

    queries = emb.filter(F.col("vec_id") < IVF_N_QUERIES)
    served = query_pq_index_rerank(spark, idx, queries, emb)
    inline = q_ann_ivfpq_rerank(spark, sf)
    sp = served.toPandas().reset_index(drop=True)
    ip = inline.toPandas().reset_index(drop=True)
    assert sp.equals(ip), (sp.head(), ip.head())


def test_dsir_second_bucket_config(spark):
    """dsir_scores at a NON-default bucket count (64) vs the python
    reference recomputed at the same count — no bucket constant can
    hide baked into the Spark pipeline (the second-config discipline
    the kernel oracles follow)."""
    import hashlib
    import math

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.curation import (
        DSIR_TARGET_SOURCES, dsir_scores,
    )
    from atr_adaptive_laguerre_spark.operators.io import read_table

    nb = 64
    docs = read_table(spark, SF, "documents")
    got = (dsir_scores(docs, F.col("source").isin(*DSIR_TARGET_SOURCES),
                       n_buckets=nb).toPandas()
           .set_index("doc_id")["s_micro"].to_dict())

    raw = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "source", "text"]).to_pandas()
    cdoc: dict = {}
    tgt = set()
    for r in raw.itertuples():
        w = r.text.strip().lower().split()
        grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
        if r.source in DSIR_TARGET_SOURCES:
            tgt.add(r.doc_id)
        for g in grams:
            b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % nb
            cdoc[(r.doc_id, b)] = cdoc.get((r.doc_id, b), 0) + 1
    cr: dict = {}
    ct: dict = {}
    for (d, b), c in cdoc.items():
        cr[b] = cr.get(b, 0) + c
        if d in tgt:
            ct[b] = ct.get(b, 0) + c
    tr, tt = sum(cr.values()), sum(ct.values())
    lm = lambda c, t: math.floor(  # noqa: E731
        math.log((c + 1.0) / (t + nb)) * 1e6 + 0.5)
    lpq = {b: lm(ct.get(b, 0), tt) - lm(cr[b], tr) for b in cr}
    want: dict = {}
    for (d, b), c in cdoc.items():
        want[d] = want.get(d, 0) + c * lpq[b]
    assert got == want


def test_decontaminate_consistent_with_audit(spark):
    """The removal op and the audit must agree: per source, the number
    of docs with n_hits > 0 equals the audit's n_contaminated, and
    kept == (n_hits < CONTAM_DROP_MIN) row-by-row."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        CONTAM_DROP_MIN, q_contamination_check, q_decontaminate,
    )

    dec = q_decontaminate(spark, SF).toPandas()
    audit = (q_contamination_check(spark, SF).toPandas()
             .set_index("source"))
    per_src = dec[dec["n_hits"] > 0].groupby("source").size()
    for src, row in audit.iterrows():
        assert per_src.get(src, 0) == row["n_contaminated"], src
    assert ((dec["kept"] == 1) ==
            (dec["n_hits"] < CONTAM_DROP_MIN)).all()
    assert (dec["n_hits"] > 0).any()      # the gate is non-degenerate
    assert (dec["kept"] == 1).any()


def test_doc_chunk_overlap_covers_every_token(spark):
    """Chunking invariants: chunk 0 starts at 0; consecutive chunks
    advance by exactly CHUNK_S; every chunk except possibly the last is
    CHUNK_W tokens; the last chunk reaches the document end (full
    coverage, nothing lost at boundaries); short docs yield exactly one
    whole-doc chunk; and the chunk hash matches a python recompute."""
    import hashlib

    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.text import (
        CHUNK_S, CHUNK_W, q_doc_chunk_overlap,
    )

    out = q_doc_chunk_overlap(spark, SF).toPandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    words = {r.doc_id: r.text.strip().lower().split()
             for r in docs.itertuples()}
    for d, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        n = len(words[d])
        assert grp["chunk_id"].tolist() == list(range(len(grp)))
        assert (grp["start_tok"] == grp["chunk_id"] * CHUNK_S).all()
        if n <= CHUNK_W:
            assert len(grp) == 1 and grp["n_tok_chunk"].iloc[0] == n
        else:
            assert (grp["n_tok_chunk"].iloc[:-1] == CHUNK_W).all()
            last = grp.iloc[-1]
            assert last["start_tok"] + last["n_tok_chunk"] == n
            # one more stride would start past the end
            assert (last["start_tok"] + CHUNK_S >= n - CHUNK_W + CHUNK_S
                    and last["start_tok"] < n)
    # hash parity on one multi-chunk doc
    big = out.groupby("doc_id").size()
    d = big.idxmax()
    assert big[d] >= 2          # the corpus has at least one 2-chunk doc
    row = out[(out["doc_id"] == d) & (out["chunk_id"] == 1)].iloc[0]
    chunk = words[d][CHUNK_S:CHUNK_S + CHUNK_W]
    assert row["chunk_hash"] == hashlib.md5(
        " ".join(chunk).encode()).hexdigest()


def test_edit_distance_matches_python_dp(spark):
    """dedup_edit_distance vs an independent O(len^2) python DP on the
    shortest few candidate pairs: same integer distance, and the
    similarity/dup columns reproduce from it exactly."""
    import math

    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.dedup import (
        EDIT_SIM_TAU, q_dedup_edit_distance,
    )

    out = q_dedup_edit_distance(spark, SF).toPandas()
    assert len(out) > 0
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    norm = {r.doc_id: " ".join(r.text.strip().lower().split())
            for r in docs.itertuples()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out["tot_len"] = (out["doc_a"].map(lambda d: len(norm[d]))
                      + out["doc_b"].map(lambda d: len(norm[d])))
    for _, r in out.nsmallest(3, "tot_len").iterrows():
        a, b = norm[r["doc_a"]], norm[r["doc_b"]]
        d = lev(a, b)
        assert r["edit_dist"] == d, (r["doc_a"], r["doc_b"])
        sim = math.floor((1.0 - d / max(len(a), len(b))) * 1e6 + 0.5) / 1e6
        assert r["edit_sim"] == sim
        assert r["is_dup"] == int(sim >= EDIT_SIM_TAU)


def test_semantic_index_serving_matches_inline(spark, tmp_path):
    """The persisted coarse-quantizer index (build_semantic_index) must
    serve EXACTLY what each inline retrain-per-call query computes on
    the same corpus — training is deterministic — for all four
    consumers, and the IVF probe must prune the asgn scan to the probed
    cells' partition directories."""
    import re

    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, ann_ivf_from_index, build_semantic_index,
        dedup_semantic_from_index, kmeans_from_index, knn_graph_from_index,
        q_ann_ivf_topk, q_dedup_semantic, q_embedding_kmeans, q_knn_graph,
    )

    sf = "/root/testdata/sf0.001"
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    idx = str(tmp_path / "semantic_index")
    build_semantic_index(emb, idx)

    for served, inline in [
        (dedup_semantic_from_index(spark, idx), q_dedup_semantic(spark, sf)),
        (knn_graph_from_index(spark, idx), q_knn_graph(spark, sf)),
        (kmeans_from_index(spark, idx), q_embedding_kmeans(spark, sf)),
        (ann_ivf_from_index(
            spark, idx, emb.filter(F.col("vec_id") < IVF_N_QUERIES)),
         q_ann_ivf_topk(spark, sf)),
    ]:
        sp = served.toPandas().reset_index(drop=True)
        ip = inline.toPandas().reset_index(drop=True)
        assert sp.equals(ip), (list(sp.columns), sp.head(), ip.head())

    # partition pruning: the probed-cell predicate reaches the asgn scan
    # as a PARTITION filter (directory-level pruning), not a data filter
    served = ann_ivf_from_index(
        spark, idx, emb.filter(F.col("vec_id") < IVF_N_QUERIES))
    plan = served._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*cell[^\]]*IN", plan, re.S)
    assert m is not None, plan[:3000]


def test_bpe_train_merges_query_matches_python(spark):
    """The oracle-gated trainer query must learn the exact (pair,
    merged, count) sequence of a pure-python Sennrich trainer using the
    same wrapped-string tie-break and the same leftmost-nonoverlapping
    merge application."""
    from collections import Counter

    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.text import (
        BPE_TRAIN_ROUNDS, q_bpe_train_merges,
    )

    sf = "/root/testdata/sf0.001"
    out = q_bpe_train_merges(spark, sf).toPandas()
    assert list(out["rank"]) == list(range(1, BPE_TRAIN_ROUNDS + 1))

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["text"]).to_pandas()
    vocab: dict = {}
    for t in docs["text"]:
        for w in t.strip().lower().split():
            if w:
                k = tuple(w)
                vocab[k] = vocab.get(k, 0) + 1
    expected = []
    for _ in range(BPE_TRAIN_ROUNDS):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], f"<{kv[0][0]}><{kv[0][1]}>"))
        expected.append((f"<{a}><{b}>", f"<{a}{b}>", cnt))
        new: dict = {}
        for syms, c in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            k = tuple(merged)
            new[k] = new.get(k, 0) + c
        vocab = new
    got = [(r["pair"], r["merged"], int(r["cnt"]))
           for _, r in out.sort_values("rank").iterrows()]
    assert got == expected, (got, expected)


def test_knn_multiprobe_recall_dominates_same_cell(spark):
    """Multiprobe candidates strictly contain the same-cell variant's
    (probe rank 1 IS the assigned cell), so for every vector the rank-1
    multiprobe neighbor similarity must be >= the same-cell rank-1
    similarity — and at nprobe = k (all cells probed) the graph must
    equal brute-force exact top-K."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        KMEANS_K, q_knn_graph, q_knn_graph_multiprobe,
    )

    sf = "/root/testdata/sf0.001"
    same = (q_knn_graph(spark, sf).filter("rank = 1")
            .toPandas().set_index("vec_id")["cos_sim"])
    multi = (q_knn_graph_multiprobe(spark, sf).filter("rank = 1")
             .toPandas().set_index("vec_id")["cos_sim"])
    joined = same.to_frame("s").join(multi.to_frame("m"), how="inner")
    assert len(joined) > 0
    assert (joined["m"] >= joined["s"]).all()

    # nprobe = k probes every cell -> exact corpus-wide top-K
    full = q_knn_graph_multiprobe(spark, sf, nprobe=KMEANS_K).toPandas()
    by_vec = full[full["rank"] == 1].set_index("vec_id")
    assert (by_vec["cos_sim"] >= joined["m"].reindex(by_vec.index)
            .fillna(-2.0)).all()


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The point of content-defined chunking: inserting ONE word at the
    front of a long document shifts every fixed-width chunk (zero grid
    alignment), but CDC boundaries move with the content, so almost all
    CDC chunks of the shifted copy are still recognized as duplicates."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        cdc_chunk_report, chunks_col,
    )
    from pyspark.sql import functions as F

    body = " ".join(f"tok{i * 37 % 211}x{i}" for i in range(400))
    docs = spark.createDataFrame(
        [(1, body), (2, "inserted " + body)], "doc_id long, text string")

    rep = cdc_chunk_report(docs).toPandas().set_index("doc_id")
    assert rep.loc[2, "n_chunks"] > 10
    # the shifted copy re-synchronizes: the vast majority of its chunks
    # are caught as duplicates of doc 1's
    assert rep.loc[2, "dup_frac"] >= 0.9, rep

    # the fixed grid catches none of them (every chunk shifted by one)
    fixed = (docs.select("doc_id", F.explode(chunks_col()).alias("chash"))
             .groupBy("chash").count().filter("count > 1").count())
    assert fixed == 0


def test_substring_spans_cover_exactly_planted_passage(spark):
    """Plant one shared 20-word passage inside two otherwise-unique
    docs: with span width 12, the duplicated grams are exactly the 9
    starts inside the passage, the covered positions are exactly the 20
    passage words, and the unrelated doc reports zero."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        SPAN_N, substring_span_report,
    )

    assert SPAN_N == 12
    run = " ".join(f"shared{i}" for i in range(20))
    d1 = " ".join(f"a{i}" for i in range(30)) + " " + run + " " + \
        " ".join(f"b{i}" for i in range(30))
    d2 = " ".join(f"c{i}" for i in range(25)) + " " + run + " " + \
        " ".join(f"d{i}" for i in range(25))
    d3 = " ".join(f"e{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string")

    rep = substring_span_report(docs).toPandas().set_index("doc_id")
    assert rep.loc[1, "n_words"] == 80
    assert rep.loc[2, "n_words"] == 70
    # 20-word run, width-12 grams fully inside it: 20 - 12 + 1 = 9
    assert rep.loc[1, "n_dup_grams"] == 9
    assert rep.loc[2, "n_dup_grams"] == 9
    assert rep.loc[1, "covered_words"] == 20
    assert rep.loc[2, "covered_words"] == 20
    assert rep.loc[3, "n_dup_grams"] == 0
    assert rep.loc[3, "covered_words"] == 0
    assert abs(rep.loc[1, "dup_frac"] - 20 / 80) < 1e-9

    # intra-doc repetition counts too (corpus-total occurrences > 1)
    phrase = " ".join(f"p{i}" for i in range(12))
    d4 = phrase + " xgap0 xgap1 xgap2 " + phrase
    solo = spark.createDataFrame([(9, d4)], "doc_id long, text string")
    rep4 = substring_span_report(solo).toPandas().set_index("doc_id")
    assert rep4.loc[9, "n_dup_grams"] == 2
    assert rep4.loc[9, "covered_words"] == 24


def test_sq_topk_recall_near_exact(spark):
    """8-bit scalar quantization of 64-dim vectors is nearly lossless
    (per-dim error <= (max-min)/510), so SQ top-5 should recover most of
    the exact top-5 — and every ADC similarity must sit within a small
    bound of the exact similarity for the same pair."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_ann_sq_topk, q_ann_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    sq = q_ann_sq_topk(spark, sf).toPandas()
    exact = q_ann_topk_cosine(spark, sf).toPandas()
    exact = exact[exact["query_id"].isin(sq["query_id"].unique())]

    hits = 0
    total = 0
    for qid, grp in exact.groupby("query_id"):
        want = set(grp["cand_id"])
        got = set(sq[sq["query_id"] == qid]["cand_id"])
        hits += len(want & got)
        total += len(want)
    assert total > 0
    assert hits / total >= 0.8, (hits, total)

    # ADC sim vs exact sim on overlapping pairs: tight agreement
    merged = sq.merge(exact, on=["query_id", "cand_id"])
    assert (abs(merged["sq_sim"] - merged["cos_sim"]) < 0.01).all()


def test_ivfpq_residual_encoding_beats_raw(spark):
    """The point of residual encoding (Jegou et al. 2011): PQ trained
    on v - centroid(cell) only spans the within-cell spread, so on the
    SAME (unit-normalized) corpus and at the same code budget its mean
    reconstruction error must be strictly below raw PQ's — and, with
    every cell probed (so no recall is lost to the two variants'
    different cell structures), its cosine recall must be at least the
    raw variant's, because unit-norm L2 ADC ranking IS cosine
    ranking."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, KMEANS_K, _emb, _kmeans_codebook, _l2, _norm,
        _pq_codebook, _pq_subvectors, _r6, q_ann_ivfpq_residual_topk,
        q_ann_ivfpq_topk, q_ann_topk_cosine,
    )

    sf = "/root/testdata/sf0.001"
    raw = _emb(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("rv0"))
    raw = raw.withColumn("n0", _norm(F.col("rv0")))
    emb = raw.select(
        "vec_id", F.transform("rv0", lambda x: x / F.col("n0")).alias("v"))
    emb = emb.withColumn("nrm", _norm(F.col("v"))).cache()
    cent = _kmeans_codebook(emb)
    # L2 assignment, mirroring the operator (the cell must MINIMIZE
    # the residual norm for residual PQ to make sense)
    ldist = (emb.select("vec_id", "v")
             .crossJoin(F.broadcast(cent.select("cell", "cv")))
             .select("vec_id", "v", "cell",
                     _r6(_l2(F.col("v"), F.col("cv"))).alias("ldist")))
    wl = Window.partitionBy("vec_id").orderBy(F.col("ldist").asc(),
                                              F.col("cell").asc())
    asgn = (ldist.withColumn("lrank", F.row_number().over(wl))
            .filter(F.col("lrank") == 1).select("vec_id", "v", "cell"))

    def mean_recon_err(sub_src):
        cb = _pq_codebook(_pq_subvectors(sub_src))
        cbmap = {(r["m"], r["code"]): np.array(r["cv"])
                 for r in cb.collect()}
        errs = []
        for vid, base in sub_src.select("vec_id", "v").collect():
            x = np.array(base)
            rec = np.concatenate([
                min(((np.sum((x[m * 16:(m + 1) * 16]
                              - cbmap[(m, c)]) ** 2), cbmap[(m, c)])
                     for (mm, c) in cbmap if mm == m),
                    key=lambda t: t[0])[1]
                for m in range(4)])
            errs.append(float(np.sum((x - rec) ** 2)))
        return float(np.mean(errs))

    resid = (asgn.join(F.broadcast(cent.select("cell", "cv")), "cell")
             .select("vec_id",
                     F.zip_with("v", "cv", lambda x, c: x - c).alias("v")))
    err_raw = mean_recon_err(emb.select("vec_id", "v"))
    err_res = mean_recon_err(resid)
    # residual reconstruction adds the centroid back exactly, so the
    # residual PQ error IS the full-vector error for that variant
    assert err_res < err_raw, (err_res, err_raw)

    # recall vs the exact COSINE top-5 (scale-invariant, so the raw
    # corpus's cosine truth is the normalized corpus's too), probing
    # every cell: isolates ADC encoding quality from cell misses
    exact = q_ann_topk_cosine(spark, sf).toPandas()
    exact = exact[exact["query_id"] < IVF_N_QUERIES]

    def recall(df):
        hits = total = 0
        for qid, grp in exact.groupby("query_id"):
            want = set(grp["cand_id"])
            got = set(df[df["query_id"] == qid]["cand_id"])
            hits += len(want & got)
            total += len(want)
        return hits / total

    r_raw = recall(q_ann_ivfpq_topk(spark, sf, nprobe=KMEANS_K).toPandas())
    r_res = recall(q_ann_ivfpq_residual_topk(
        spark, sf, nprobe=KMEANS_K).toPandas())
    assert r_res >= r_raw, (r_res, r_raw)


def test_substring_clean_cuts_exactly_nonfirst_instances(spark):
    """Keep-first substring removal: the earlier doc keeps every word,
    the later doc loses exactly the planted 20-word passage (re-joined
    text verified by md5), the unrelated doc is untouched, and an
    intra-doc repeat loses only its second instance."""
    import hashlib
    from atr_adaptive_laguerre_spark.operators.dedup import (
        substring_clean,
    )

    run = " ".join(f"shared{i}" for i in range(20))
    pre2 = " ".join(f"c{i}" for i in range(25))
    post2 = " ".join(f"d{i}" for i in range(25))
    d1 = " ".join(f"a{i}" for i in range(30)) + " " + run + " " + \
        " ".join(f"b{i}" for i in range(30))
    d2 = pre2 + " " + run + " " + post2
    d3 = " ".join(f"e{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string")

    rep = substring_clean(docs).toPandas().set_index("doc_id")
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert rep.loc[1, "n_kept"] == 80                    # first instance
    assert rep.loc[1, "clean_hash"] == md5(d1)
    assert rep.loc[2, "n_kept"] == 50                    # passage cut
    assert rep.loc[2, "clean_hash"] == md5(pre2 + " " + post2)
    assert rep.loc[3, "n_kept"] == 40
    assert rep.loc[3, "clean_hash"] == md5(d3)

    phrase = " ".join(f"p{i}" for i in range(12))
    d4 = phrase + " xg0 xg1 xg2 " + phrase
    solo = spark.createDataFrame([(9, d4)], "doc_id long, text string")
    rep4 = substring_clean(solo).toPandas().set_index("doc_id")
    assert rep4.loc[9, "n_kept"] == 15
    assert rep4.loc[9, "clean_hash"] == md5(phrase + " xg0 xg1 xg2")


def test_hybrid_rrf_fuses_planted_lists_exactly(spark):
    """Planted corpus where every rank is hand-computable: doc 0 is the
    BM25 winner, doc 1 is the dense winner AND sparse runner-up — RRF
    puts doc 1 first (two strong list positions beat one win + one
    mid position); docs 3/4 are retrieved dense-only (no query terms),
    and rrf_micro is the exact integer 1000000//(60+r_s) + 1000000//
    (60+r_d) everywhere."""
    from atr_adaptive_laguerre_spark.operators.hybrid import (
        hybrid_search_rrf,
    )

    docs = spark.createDataFrame(
        [(0, "scan hash window scan hash window filler0"),
         (1, "scan window w1 w2 w3"),
         (2, "scan x0 x1 x2 x3 x4"),
         (3, "y0 y1 y2"),
         (4, "z0 z1 z2")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0),
         (1, [0.9, 0.1, 0.0, 0.0], 0),
         (2, [0.0, 1.0, 0.0, 0.0], 0),
         (3, [-1.0, 0.0, 0.0, 0.0], 0),
         (4, [1.0, 0.05, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int")

    out = hybrid_search_rrf(docs, emb).toPandas()
    # PRF seeds = sparse top-3 (docs 0,1,2) -> q = u6-sums
    # [1.9e6, 1.1e6, 0, 0]; dense order e1 > e4 > e0 > e2 > e3.
    assert list(out.doc_id) == [1, 0, 2, 4, 3]
    assert list(out.rank_sparse) == [2, 1, 3, 0, 0]
    assert list(out.rank_dense) == [1, 3, 4, 2, 5]
    expected = [sum(1000000 // (60 + r) for r in rr if r > 0)
                for rr in [(2, 1), (1, 3), (3, 4), (0, 2), (0, 5)]]
    assert list(out.rrf_micro) == expected
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_random_projection_preserves_distances(spark):
    """Johnson-Lindenstrauss contract of the sparse projection: the
    64->16 map must preserve (a) norms in expectation (E||y||^2 =
    ||x||^2 under the density-1/3 +-1 matrix with the sqrt(3/k) scale)
    and (b) the GEOMETRY of the corpus — pairwise squared distances in
    the projected space track the originals.  Also pins the matrix
    derivation: Spark's hash-derived signs must equal the numpy
    re-derivation entry for entry."""
    import numpy as np
    import pyarrow.parquet as pq

    from atr_adaptive_laguerre_spark.operators.similarity import (
        RP_A, RP_B, RP_C, RP_K, RP_P, q_embedding_random_projection,
    )

    out = q_embedding_random_projection(spark, SF).toPandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    x = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()
                 ).astype(np.float64)
    n, d = x.shape
    assert len(out) == n * RP_K

    # re-derive the matrix and the projection in numpy
    t = np.arange(RP_K * d, dtype=np.int64)
    h = ((RP_A * t * t + RP_B * t + RP_C) % RP_P) % 6
    r = np.where(h == 0, 1.0, np.where(h == 1, -1.0, 0.0)).reshape(RP_K, d)
    xq = np.floor(x * 1e6 + 0.5)            # the engines' micro grid
    want = (xq @ r.T) / 1e6 * np.sqrt(3.0 / RP_K)
    got = (out.sort_values(["vec_id", "k"])["y"]
           .to_numpy().reshape(n, RP_K))
    assert np.abs(got - want).max() < 1e-5

    # norm preservation in expectation (ratio ~1 corpus-wide)
    ratio = (got * got).sum(axis=1) / (x * x).sum(axis=1)
    assert 0.85 < np.median(ratio) < 1.15

    # pairwise distance geometry survives (JL): every distance lands
    # within 1+-eps of the original.  At k=16 eps is ~sqrt(log n / k)
    # ~ 0.5, and this corpus's true distances spread only ~13% around
    # their mean, so a CORRELATION test would be meaningless (the JL
    # noise dwarfs the signal by design at this k) — the lemma's
    # actual guarantee is the bounded per-pair ratio, so that is what
    # gets pinned: median ~1, 98% of pairs inside [1/3, 2.5].
    sub = np.arange(0, n, max(1, n // 120))
    def pdist2(m):
        g = (m * m).sum(axis=1)
        return (g[:, None] + g[None, :] - 2 * m @ m.T)[
            np.triu_indices(len(m), 1)]
    d_orig, d_proj = pdist2(x[sub]), pdist2(got[sub])
    ratio = d_proj / d_orig
    assert 0.9 < np.median(ratio) < 1.1, np.median(ratio)
    lo, hi = np.quantile(ratio, [0.01, 0.99])
    assert lo > 1.0 / 3.0 and hi < 2.5, (lo, hi)


def test_ann_rp_topk_recall_vs_exact(spark):
    """The projected-space shortlist must actually find neighbors:
    recall@5 vs the exact scan at the chosen (k=32, R=100) operating
    point.  Deterministic corpus + deterministic hash matrix ->
    deterministic recall; the floor sits under the measured 0.67
    (sf0.001) / 0.70 (sf0.01) with head-room for nothing — a matrix or
    shortlist regression drops this to ~0.3 (measured at k=16)."""
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_ann_rp_topk, q_ann_topk_cosine,
    )

    rp = q_ann_rp_topk(spark, SF).toPandas()
    ex = q_ann_topk_cosine(spark, SF).toPandas()
    recalls = []
    for qid, g in ex.groupby("query_id"):
        e = set(g["cand_id"])
        r = set(rp[rp.query_id == qid]["cand_id"])
        recalls.append(len(e & r) / len(e))
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_jaccard_groundtruth_superset_of_verified(spark):
    """The exhaustive pair list is the ground truth the LSH pipeline
    approximates: every LSH-verified pair must appear in it with the
    IDENTICAL exact-Jaccard value (same shingle sets, same quantizer),
    and the exhaustive list may only ADD pairs (LSH misses)."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        _docs, exact_jaccard_pairs, verified_jaccard_pairs,
    )

    docs = _docs(spark, SF)
    truth = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
             for r in exact_jaccard_pairs(docs).collect()}
    verified = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard"])
                for r in verified_jaccard_pairs(docs).collect()}
    assert verified, "corpus should contain near-dup pairs"
    for pair, vals in verified.items():
        assert truth.get(pair) == vals, (pair, vals, truth.get(pair))
    assert len(truth) >= len(verified)


def test_lsh_band_tradeoff_monotone(spark):
    """More bands of fewer rows = a more permissive candidate filter:
    with K=12 minhashes, recall against the exhaustive ground truth
    must be non-decreasing in the band count, and the candidate count
    non-decreasing too (the verify-load price of that recall).  The
    catalog's pinned (12, 4) point must sit at the recall the measured
    curve shows (BENCH/lsh_tuning.json)."""
    from atr_adaptive_laguerre_spark.operators.dedup import (
        _docs, _lsh_candidate_pairs, exact_jaccard_pairs,
    )

    docs = _docs(spark, SF)
    truth = {(r["doc_a"], r["doc_b"])
             for r in exact_jaccard_pairs(docs).collect()}
    assert truth
    stats = {}
    for n_bands in (1, 4, 12):
        cand = {(r["doc_a"], r["doc_b"])
                for r in _lsh_candidate_pairs(
                    docs, n_hashes=12, n_bands=n_bands).collect()}
        stats[n_bands] = (len(truth & cand) / len(truth), len(cand))
    assert stats[1][0] <= stats[4][0] <= stats[12][0], stats
    assert stats[1][1] <= stats[4][1] <= stats[12][1], stats


def test_jsonl_roundtrip_and_corrupt_routing(spark, tmp_path):
    """JSONL source/sink: documents round-trip value-exactly through
    the schema-required reader (no inference pass), and a planted
    malformed line routes WHOLE into the corrupt-record column while
    every good row survives — the dead-letter contract a 1000-executor
    ingest relies on instead of FAILFAST."""
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.io import (
        read_jsonl, read_table, write_jsonl,
    )

    docs = read_table(spark, SF, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    # Spark disallows queries touching ONLY the corrupt column on a raw
    # scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    # documented pattern is to cache the parsed frame first.
    back = read_jsonl(spark, out, docs.schema).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    a = docs.orderBy("doc_id").toPandas()
    b = (back.select(*docs.columns).orderBy("doc_id").toPandas())
    assert a.equals(b), (a.head(), b.head())

    # plant one malformed line among good ones
    bad_dir = tmp_path / "bad_jsonl"
    bad_dir.mkdir()
    good = '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}'
    (bad_dir / "part-0.json").write_text(
        good + "\n" + '{"doc_id": 2, "text": BROKEN' + "\n"
        + good.replace('"doc_id": 1', '"doc_id": 3') + "\n")
    got = read_jsonl(spark, str(bad_dir), docs.schema).cache()
    dead = got.filter(F.col("_corrupt_record").isNotNull())
    assert dead.count() == 1
    assert "BROKEN" in dead.collect()[0]["_corrupt_record"]
    clean = got.filter(F.col("_corrupt_record").isNull())
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]


def test_weighted_sample_favors_long_docs(spark):
    """Priority sampling with w = n_chars must actually weight: the
    sampled docs' mean length exceeds the corpus mean (deterministic
    corpus + deterministic hash-uniforms -> a fixed, checkable
    sample), ranks are contiguous from 1, and keys are non-increasing
    with id tie-breaks."""
    from atr_adaptive_laguerre_spark.operators.curation import (
        q_corpus_sample_weighted,
    )

    p = q_corpus_sample_weighted(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    assert list(p["rank"]) == list(range(1, len(p) + 1))
    assert (p["key_q"].diff().dropna() <= 0).all()
    assert p["n_chars"].mean() > docs["n_chars"].mean(), (
        p["n_chars"].mean(), docs["n_chars"].mean())


def test_containment_catches_what_jaccard_misses(spark):
    """The asymmetric signal must actually be asymmetric somewhere:
    planted pair — a short doc quoted whole inside a much longer one —
    scores containment ~1 on the short side while its Jaccard sits
    under the near-dup threshold; the symmetric ground-truth query
    never reports it, the containment query must."""
    import pandas as pd

    from atr_adaptive_laguerre_spark.operators.dedup import (
        ORACLE_DEDUP_CONTAINMENT_PAIRS, q_dedup_containment_pairs,
    )

    base = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = (" ".join(f"w{i} x{i} y{i}" for i in range(60))
                + " " + short + " "
                + " ".join(f"p{i} q{i} r{i}" for i in range(60)))
    planted = pd.DataFrame({
        "doc_id": [900001, 900002],
        "text": [short, long_doc],
        "lang": ["en", "en"], "source": ["t", "t"],
        "n_chars": [len(short), len(long_doc)]})
    docs = pd.concat([base, planted], ignore_index=True)
    sdf = spark.createDataFrame(docs)
    sdf.createOrReplaceTempView("documents_planted")

    from atr_adaptive_laguerre_spark.operators import dedup as D
    pairs = None
    try:
        orig = D._docs
        D._docs = lambda sp, sf: sdf
        pairs = q_dedup_containment_pairs(spark, SF).toPandas()
    finally:
        D._docs = orig
    hit = pairs[(pairs.doc_a == 900001) & (pairs.doc_b == 900002)]
    assert len(hit) == 1, pairs.tail()
    assert hit.iloc[0]["cont_a"] >= 0.99
    assert hit.iloc[0]["jaccard"] < 0.2

    # oracle twin agrees on the planted corpus
    import duckdb
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(ORACLE_DEDUP_CONTAINMENT_PAIRS).fetchdf()
    w = want[(want.doc_a == 900001) & (want.doc_b == 900002)]
    assert len(w) == 1
    assert abs(w.iloc[0]["cont_a"] - hit.iloc[0]["cont_a"]) < 1e-9


def test_containment_lsh_recall_vs_exhaustive(spark):
    """The bottom-k sketch path must reproduce the exhaustive
    containment query exactly on the test corpus (a true pair misses
    all k sketch hashes with probability <= 2^-8; deterministic hashes
    -> a fixed, checkable outcome), including the planted
    short-doc-inside-long-doc pair."""
    import pandas as pd

    from atr_adaptive_laguerre_spark.operators import dedup as D
    from atr_adaptive_laguerre_spark.operators.dedup import (
        q_dedup_containment_lsh, q_dedup_containment_pairs,
    )

    base = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = (" ".join(f"w{i} x{i} y{i}" for i in range(60))
                + " " + short + " "
                + " ".join(f"p{i} q{i} r{i}" for i in range(60)))
    docs = pd.concat([base, pd.DataFrame({
        "doc_id": [900001, 900002], "text": [short, long_doc],
        "lang": ["en", "en"], "source": ["t", "t"],
        "n_chars": [len(short), len(long_doc)]})], ignore_index=True)
    sdf = spark.createDataFrame(docs)
    try:
        orig = D._docs
        D._docs = lambda sp, sf: sdf
        lsh = q_dedup_containment_lsh(spark, SF).toPandas()
        full = q_dedup_containment_pairs(spark, SF).toPandas()
    finally:
        D._docs = orig
    assert ((900001, 900002) in
            set(zip(lsh["doc_a"], lsh["doc_b"])))
    assert lsh[["doc_a", "doc_b", "n_inter", "cont_a", "cont_b",
                "jaccard"]].equals(
        full[["doc_a", "doc_b", "n_inter", "cont_a", "cont_b",
              "jaccard"]]), (len(lsh), len(full))


def test_hot_shingle_cap_collapses_boilerplate_pairs(spark):
    """The frequency-cap mitigation on a planted worst case: 300 docs
    all sharing one boilerplate sentence (every boilerplate shingle has
    df=300, so uncapped candidate generation produces ~300²/2 pairs of
    pure boilerplate overlap) plus 3 true duplicate pairs by unique
    content.  With hot_cap=10 the candidate mass collapses to the true
    pairs, every true pair survives with EXACT values, and no
    boilerplate-only pair is reported at the threshold."""
    import pandas as pd

    from atr_adaptive_laguerre_spark.operators import dedup as D
    from atr_adaptive_laguerre_spark.operators.dedup import (
        capped_jaccard_pairs, exact_jaccard_pairs,
    )

    boiler = ("this document is provided as is without warranty of "
              "any kind either express or implied")
    rows = []
    for i in range(300):
        body = " ".join(f"u{i}w{j} v{i}w{j}" for j in range(12))
        rows.append((i, boiler + " " + body))
    # three true dup pairs: same unique body, tiny edit
    for k, base in enumerate([3, 77, 150]):
        rows.append((1000 + k, rows[base][1] + " extrawordz"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))

    capped = capped_jaccard_pairs(docs, hot_cap=10).toPandas()
    got_pairs = set(zip(capped["doc_a"], capped["doc_b"]))
    want_true = {(3, 1000), (77, 1001), (150, 1002)}
    assert want_true <= got_pairs, (want_true, got_pairs)
    # boilerplate-only pairs share ~14 of ~40 shingles -> J ~ 0.2 is
    # possible at the floor; everything reported must involve a true
    # dup doc or clear the threshold legitimately -- and the candidate
    # mass must be FAR below the ~45k boilerplate pairs
    assert len(capped) < 100, len(capped)

    # exactness: the true pairs' values equal the exhaustive query's
    full = exact_jaccard_pairs(docs).toPandas()
    fm = {(r.doc_a, r.doc_b): (r.n_inter, r.jaccard)
          for r in full.itertuples()}
    cm = {(r.doc_a, r.doc_b): (r.n_inter, r.jaccard)
          for r in capped.itertuples()}
    for p in want_true:
        assert cm[p] == fm[p], (p, cm[p], fm[p])


def test_bpe_train_encode_uses_learned_merges(spark):
    """The composed train->encode query must encode with merges the
    corpus chose, not the fixed demo list: its token counts differ
    from bpe_encode's on this corpus (the demo list reassembles only
    'table'/'value'), every doc compresses at least as well as raw
    characters, and the learned merges match bpe_train's."""
    from atr_adaptive_laguerre_spark.operators.text import (
        bpe_train, q_bpe_encode, q_bpe_train_encode,
        q_bpe_train_merges,
    )

    learned = q_bpe_train_encode(spark, SF).toPandas()
    fixed = q_bpe_encode(spark, SF).toPandas()
    assert (learned["n_tokens"] <= learned["n_chars"]).all()
    assert (learned["n_tokens"] < fixed["n_tokens"]).any(), \
        "learned merges should compress somewhere the demo list doesn't"
    rows = q_bpe_train_merges(spark, SF).collect()
    got = [tuple(r["pair"][1:-1].split("><")) for r in rows]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert got == bpe_train(docs, n_merges=len(got))


def test_events_funnel_monotone(spark):
    """Funnel counts must be non-increasing through the ordered stages
    (stage k+1 requires a strictly-later event than stage k's first
    completion), and every stage row carries a real median."""
    from atr_adaptive_laguerre_spark.queries import q_events_funnel

    p = q_events_funnel(spark, SF).toPandas().sort_values("stage")
    assert list(p["step"]) == ["view", "click", "purchase"]
    assert (p["n_users"].diff().dropna() <= 0).all(), p
    assert p["median_entry_us"].notna().all()


def test_containment_hot_cap_collapses_boilerplate_pairs(spark):
    """r6: the containment catalog query now routes candidate
    generation through the hot-shingle cap (VERDICT r5 item 2).  Same
    planted worst case as the jaccard cap test: 300 docs sharing one
    boilerplate sentence (df=300 on every boilerplate shingle) + 3 true
    containment pairs.  With a low cap the candidate mass collapses,
    every true pair survives with values EXACTLY equal to the uncapped
    run, and the default cap (1024) reproduces the uncapped output
    row-for-row on this corpus."""
    import pandas as pd

    from atr_adaptive_laguerre_spark.operators.dedup import (
        containment_pairs,
    )

    boiler = ("this document is provided as is without warranty of "
              "any kind either express or implied")
    rows = []
    for i in range(300):
        body = " ".join(f"u{i}w{j} v{i}w{j}" for j in range(12))
        rows.append((i, boiler + " " + body))
    for k, base in enumerate([3, 77, 150]):
        rows.append((1000 + k, rows[base][1] + " extrawordz"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))

    capped = containment_pairs(docs, hot_cap=10).toPandas()
    got_pairs = set(zip(capped["doc_a"], capped["doc_b"]))
    want_true = {(3, 1000), (77, 1001), (150, 1002)}
    assert want_true <= got_pairs, (want_true, got_pairs)
    assert len(capped) < 100, len(capped)

    # exactness of surviving values + default-cap equivalence: the
    # uncapped run is the ground truth (cap above any df disables it)
    full = (containment_pairs(docs, hot_cap=10**9).toPandas()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    fm = {(r.doc_a, r.doc_b): (r.n_inter, r.cont_a, r.cont_b, r.jaccard)
          for r in full.itertuples()}
    cm = {(r.doc_a, r.doc_b): (r.n_inter, r.cont_a, r.cont_b, r.jaccard)
          for r in capped.itertuples()}
    for p in want_true:
        assert cm[p] == fm[p], (p, cm[p], fm[p])
