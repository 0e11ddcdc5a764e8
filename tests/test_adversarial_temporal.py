"""Adversarial temporal tests, mirroring the reference's signature suite
(tests/test_temporal/test_adversarial_regression.py and
test_availability_stress.py): every resample-boundary tie, delay
stress, and determinism.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.data.corpus import make_tokens, tokens_to_ohlcv
from atr_adaptive_laguerre_spark.kernel.batched import pad_sequences
from atr_adaptive_laguerre_spark.kernel.multi_interval_batched import (
    multi_interval_long,
)
from atr_adaptive_laguerre_spark.kernel.multi_interval_ref import _resample
from atr_adaptive_laguerre_spark.kernel.reference_impl import core_loop

CFG = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                   atr_period=14, filter_redundancy=False)


def _run(h, l, c, avail):
    hi, lens = pad_sequences([h])
    lo, _ = pad_sequences([l])
    cl, _ = pad_sequences([c])
    av, _ = pad_sequences([avail])
    return multi_interval_long(hi, lo, cl, lens, CFG, avail=av)


def _grain_rsi(h, l, c, m):
    res = _resample(np.asarray(h, float), np.asarray(l, float),
                    np.asarray(c, float), m)
    return core_loop(*res, CFG.atr_period, CFG.adaptive_offset)["rsi"]


def test_every_boundary_tie_mult1_and_mult2():
    """Zero-delay availability: at EVERY window-completion instant the
    strict rule must still be on the previous bar (the v1.0.4 regression
    class: off-by-one at each of the n/m boundaries)."""
    n = 240
    toks = make_tokens(11, n)
    h, l, c = tokens_to_ohlcv(toks)
    avail = np.arange(n, dtype=np.float64)
    got = _run(h, l, c, avail)
    for m, col in ((3, "rsi_mult1"), (12, "rsi_mult2")):
        rsi_m = _grain_rsi(h, l, c, m)
        for j in range(1, n // m):
            boundary = (j + 1) * m - 1
            if boundary >= n:
                break
            assert got[col][boundary] == rsi_m[j - 1], (m, j)
            if boundary + 1 < n:
                assert got[col][boundary + 1] == rsi_m[j], (m, j)


@pytest.mark.parametrize("delay", [0.0, 0.25, 1.0, 5.0, 24.0])
def test_constant_delay_shifts_alignment(delay):
    """Constant arrival delay d: bar i becomes available at i+d; the
    as-of match must lag accordingly and never anticipate (stress-matrix
    analogue of test_availability_stress.py delays 0-24h)."""
    n = 200
    toks = make_tokens(13, n)
    h, l, c = tokens_to_ohlcv(toks)
    avail = np.arange(n, dtype=np.float64) + delay
    got = _run(h, l, c, avail)
    m = 3
    rsi_m = _grain_rsi(h, l, c, m)
    # resampled bar j available at (j+1)*m-1+d; base row i (avail i+d)
    # matches last j with (j+1)*m-1+d < i+d  <=>  j < (i-m+1)/m
    for i in range(0, n, 7):
        j = int(np.ceil((i - m + 1) / m)) - 1
        j = min(max(j, 0), n // m - 1)
        assert got["rsi_mult1"][i] == rsi_m[j], i


def test_jittered_delays_no_leakage():
    """Per-bar jittered delays (monotonic availability): subset
    recomputation equals full computation at every position."""
    n = 180
    toks = make_tokens(17, n)
    h, l, c = tokens_to_ohlcv(toks)
    rng = np.random.default_rng(5)
    # monotone availability with jittered gaps in (0, 2)
    avail = np.cumsum(0.1 + 1.8 * rng.random(n))
    full = _run(h, l, c, avail)
    cut = 97
    pre = _run(h[:cut], l[:cut], c[:cut], avail[:cut])
    for col in ("rsi_mult1", "rsi_mult2", "regime_majority",
                "bars_since_alignment", "divergence_strength"):
        np.testing.assert_array_equal(full[col][:cut], pre[col],
                                      err_msg=col)


def test_determinism_two_fresh_runs():
    """Two independent evaluations are bit-identical (reference
    test_properties.py determinism at 1e-15 — here exact)."""
    toks = make_tokens(23, 300)
    h, l, c = tokens_to_ohlcv(toks)
    avail = np.arange(300, dtype=np.float64)
    a = {k: v.copy() for k, v in _run(h, l, c, avail).items()}
    b = _run(h, l, c, avail)
    for k in a:
        both_nan = np.isnan(a[k]) & np.isnan(b[k])
        assert (np.array_equal(a[k], b[k]) or
                ((a[k] == b[k]) | both_nan).all()), k


def test_short_docs_do_not_crash():
    """Docs below the reference's lookback gate produce finite core
    features and NaN mult features (documented deviation from the
    reference's hard ValueError)."""
    for n in (1, 2, 5, 11, 19):
        toks = make_tokens(29, n)
        h, l, c = tokens_to_ohlcv(toks)
        got = _run(h, l, c, np.arange(n, dtype=np.float64))
        assert np.isfinite(got["rsi_base"]).all(), n
        if n < CFG.multiplier_2:
            assert np.isnan(got["rsi_mult2"]).all(), n


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 5000), n=st.integers(40, 250),
       scale=st.floats(0.1, 10.0))
def test_availability_monotone_invariance(seed, n, scale):
    """Scaling availability timestamps by a positive constant never
    changes the alignment (only the order of availabilities matters)."""
    toks = make_tokens(seed, n)
    h, l, c = tokens_to_ohlcv(toks)
    rng = np.random.default_rng(seed)
    avail = np.cumsum(0.1 + rng.random(n))
    a = {k: v.copy() for k, v in _run(h, l, c, avail).items()}
    b = _run(h, l, c, avail * scale)
    for k in ("rsi_mult1", "rsi_mult2"):
        both_nan = np.isnan(a[k]) & np.isnan(b[k])
        assert ((a[k] == b[k]) | both_nan).all(), k
