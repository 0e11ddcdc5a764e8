"""Reference-shaped top-level API (api.py): the entry points a user of
the reference calls, re-expressed over Spark DataFrames."""

import numpy as np
import pytest

from atr_adaptive_laguerre_spark import ATRAdaptiveLaguerreRSI, FeatureConfig
from atr_adaptive_laguerre_spark.data.corpus import make_tokens, tokens_to_ohlcv
from atr_adaptive_laguerre_spark.kernel.reference_impl import core_loop


def test_updater_matches_reference_loop():
    """RSIUpdater (the reference's update/update_full) is bit-identical
    to the batch loop oracle at every step."""
    eng = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))
    toks = make_tokens(7, 120)
    h, l, c = tokens_to_ohlcv(toks)
    want = core_loop(h, l, c, 14, 0.75)
    up = eng.updater()
    for i in range(len(c)):
        full = up.update_full(h[i], l[i], c[i])
        assert full["rsi"] == want["rsi"][i], i
        assert full["atr"] == want["atr"][i], i
        assert full["L3"] == want["L3"][i], i


def test_fit_transform_doc_grain(spark, corpus_parquet):
    """fit_transform on the input_hint token table returns per-row RSI
    equal to the kernel path."""
    eng = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))
    doc = spark.read.parquet(corpus_parquet)
    out = (eng.fit_transform(doc).toPandas()
           .sort_values(["doc_id", "offset"]).reset_index(drop=True))
    assert list(out.columns) == ["source", "doc_id", "offset", "token",
                                 "rsi"]
    assert ((out["rsi"] >= 0) & (out["rsi"] <= 1)).all()
    one = out[out["doc_id"] == out["doc_id"].iloc[0]]
    toks = one["token"].to_numpy(dtype=np.int64)
    h, l, c = tokens_to_ohlcv(toks)
    want = core_loop(h, l, c, 14, 0.75)
    np.testing.assert_array_equal(one["rsi"].to_numpy(), want["rsi"])


def test_fit_transform_ohlcv_long_form(spark):
    """fit_transform on a long-form OHLCV bar table appends rsi per
    entity, matching the loop oracle."""
    eng = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))
    rows = []
    series = {}
    for d in range(3):
        toks = make_tokens(d, 80)
        h, l, c = tokens_to_ohlcv(toks)
        series[f"d{d}"] = (h, l, c)
        for i in range(80):
            rows.append(("s0", f"d{d}", i, float(h[i]), float(l[i]),
                         float(c[i])))
    bars = spark.createDataFrame(
        rows, "source string, doc_id string, offset int, "
              "high double, low double, close double")
    out = (eng.fit_transform(bars).toPandas()
           .sort_values(["doc_id", "offset"]).reset_index(drop=True))
    for d, (h, l, c) in series.items():
        want = core_loop(h, l, c, 14, 0.75)
        got = out.loc[out["doc_id"] == d, "rsi"].to_numpy()
        np.testing.assert_array_equal(got, want["rsi"], err_msg=d)


def test_fit_transform_features_and_projection(spark, corpus_parquet):
    eng = ATRAdaptiveLaguerreRSI(
        FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                     atr_period=14))
    doc = spark.read.parquet(corpus_parquet)
    sub = eng.fit_transform_features(
        doc, columns=["rsi_change_1_base"]).toPandas()
    assert list(sub.columns) == ["source", "doc_id", "offset", "token",
                                 "rsi_change_1_base"]
    assert len(sub) > 0


def test_lookback_matches_reference_rule():
    """lookback == the reference's min_lookback (atr_adaptive_rsi.py:
    456-488): (max(atr_period, smoothing_period, 20) + 10), multiplied
    by max(multiplier) for multi-interval — 30 / 360 at defaults."""
    assert ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14)).lookback() == 30
    assert ATRAdaptiveLaguerreRSI(
        FeatureConfig(atr_period=32)).lookback() == 42
    cfg = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                       atr_period=14)
    assert ATRAdaptiveLaguerreRSI(cfg).lookback() == 360


def test_lookback_validation(spark, corpus_parquet):
    """validate_lookback raises naming short entities (doc-grain n_tok
    fast path) and passes when every entity is long enough."""
    doc = spark.read.parquet(corpus_parquet)
    short_cfg = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))
    short_cfg.validate_lookback(doc)   # corpus min len 40 >= 14+10+... ok

    huge = ATRAdaptiveLaguerreRSI(
        FeatureConfig(atr_period=14, stats_window=2000))
    with pytest.raises(ValueError, match="shorter than lookback"):
        huge.validate_lookback(doc)

    # long-form path
    long_df = doc.selectExpr("source", "doc_id",
                             "posexplode(tokens) as (offset, token)")
    huge_lf = ATRAdaptiveLaguerreRSI(
        FeatureConfig(atr_period=14, stats_window=2000))
    with pytest.raises(ValueError, match="shorter than lookback"):
        huge_lf.validate_lookback(long_df)


def test_validate_non_anticipative_passes_engine(spark, corpus_parquet):
    """The engine's own feature pipeline must pass the distributed
    progressive-prefix validator (reference methodology: allclose on
    every overlap when future bars are appended)."""
    from atr_adaptive_laguerre_spark.operators.validation import (
        validate_non_anticipative,
    )

    eng = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))
    doc = spark.read.parquet(corpus_parquet).limit(20)
    assert validate_non_anticipative(eng.fit_transform_features, doc,
                                     n_tests=4) is True


def test_validate_non_anticipative_catches_lookahead(spark, corpus_parquet):
    """A deliberately anticipative feature (lead-1 RSI) must be caught
    and named."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.operators.validation import (
        validate_non_anticipative,
    )

    eng = ATRAdaptiveLaguerreRSI(FeatureConfig(atr_period=14))

    def leaky_fn(doc_df):
        out = eng.fit_transform(doc_df)
        w = Window.partitionBy("source", "doc_id").orderBy("offset")
        return out.withColumn(
            "rsi_lead", F.lead("rsi", 1).over(w)).drop("rsi")

    doc = spark.read.parquet(corpus_parquet).limit(12)
    with pytest.raises(ValueError, match="rsi_lead"):
        validate_non_anticipative(leaky_fn, doc, n_tests=3)


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(1, 200),
       atr_period=st.integers(2, 40),
       offset=st.floats(0.0, 2.0, allow_nan=False))
def test_updater_property_bit_exact(seed, n, atr_period, offset):
    """Property: across random series lengths and configs, the O(1)
    updater replays the batch loop oracle bit-for-bit at every step —
    including n < atr_period warm-up and degenerate flat stretches."""
    toks = make_tokens(seed, n)
    h, l, c = tokens_to_ohlcv(toks)
    want = core_loop(h, l, c, atr_period, offset)
    up = ATRAdaptiveLaguerreRSI(
        FeatureConfig(atr_period=atr_period,
                      adaptive_offset=offset)).updater()
    for i in range(n):
        full = up.update_full(h[i], l[i], c[i])
        assert full["rsi"] == want["rsi"][i], (seed, i)
        assert full["atr"] == want["atr"][i], (seed, i)
        assert full["gamma"] == want["gamma"][i], (seed, i)
