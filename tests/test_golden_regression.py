"""Golden-snapshot regression: current kernel output must equal the
pinned fixtures bit-for-bit (NaN-aware) — the engine's strongest
self-oracle, mirroring the reference's regression methodology
(tests/test_features/test_memory_refactor_regression.py:37-101)."""

import os

import numpy as np
import pytest

from tests.generate_golden import (
    FIXTURES, compute_multi, compute_single_43, golden_ohlcv,
)
from atr_adaptive_laguerre_spark.config import FeatureConfig


def _assert_bitwise(got, want, cols):
    assert got.shape == want.shape
    for j, col in enumerate(cols):
        g, w = got[:, j], want[:, j]
        both_nan = np.isnan(g) & np.isnan(w)
        eq = (g == w) | both_nan
        assert eq.all(), (
            f"{col}: {int((~eq).sum())} mismatches, first at row "
            f"{int(np.argmax(~eq))}: {g[np.argmax(~eq)]} vs {w[np.argmax(~eq)]}")


@pytest.fixture(scope="module")
def ohlcv():
    return golden_ohlcv()


def test_golden_single_43(ohlcv):
    h, l, c, *_ = ohlcv
    cfg = FeatureConfig.single_interval(atr_period=14)
    got = compute_single_43(h, l, c, cfg)
    want = np.load(os.path.join(FIXTURES, "golden_single_43.npy"))
    cols = np.load(os.path.join(FIXTURES, "golden_columns_43.npy"))
    _assert_bitwise(got, want, cols)


def test_golden_multi_169(ohlcv):
    h, l, c, *_ = ohlcv
    cfg = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                       atr_period=14,
                                       filter_redundancy=False)
    got, cols = compute_multi(h, l, c, cfg)
    want = np.load(os.path.join(FIXTURES, "golden_multi_169.npy"))
    assert list(cols) == list(
        np.load(os.path.join(FIXTURES, "golden_columns_169.npy")))
    _assert_bitwise(got, want, cols)


def test_golden_multi_121(ohlcv):
    h, l, c, *_ = ohlcv
    cfg = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                       atr_period=14, filter_redundancy=True)
    got, cols = compute_multi(h, l, c, cfg)
    want = np.load(os.path.join(FIXTURES, "golden_multi_121.npy"))
    assert list(cols) == list(
        np.load(os.path.join(FIXTURES, "golden_columns_121.npy")))
    _assert_bitwise(got, want, cols)
