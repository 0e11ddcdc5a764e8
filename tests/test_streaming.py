"""Streaming incremental updates == batch kernel, across micro-batch and
checkpoint-restart boundaries (reference S1/S2 surface)."""

import os

import numpy as np
import pandas as pd
import pytest

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.data.corpus import make_tokens, tokens_to_ohlcv
from atr_adaptive_laguerre_spark.kernel.reference_impl import (
    CORE_OUTPUTS, core_loop,
)
from atr_adaptive_laguerre_spark.streaming.stateful import step, stream_rsi

CFG = FeatureConfig(atr_period=14)


def test_step_matches_batch_kernel():
    toks = make_tokens(3, 150)
    h, l, c = tokens_to_ohlcv(toks)
    want = core_loop(h, l, c, CFG.atr_period, CFG.adaptive_offset)
    st = {"prev_close": 0.0, "seen": 0, "tr_buf": [0.0] * CFG.atr_period,
          "buf_head": 0, "buf_len": 0, "tr_sum": 0.0,
          "l0": 0.0, "l1": 0.0, "l2": 0.0, "l3": 0.0}
    for i in range(len(c)):
        out = step(st, h[i], l[i], c[i], CFG.atr_period,
                   CFG.adaptive_offset)
        for j, k in enumerate(CORE_OUTPUTS):
            assert out[j] == want[k][i], (k, i)


@pytest.mark.slow
def test_stream_matches_batch_with_checkpoint_restart(spark, tmp_path):
    """Feed bars in 3 file drops across 2 stream restarts; the streaming
    output must equal the batch kernel bit-for-bit, with state restored
    from the checkpoint between passes, and replayed rows deduped."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    docs = {f"d{i}": tokens_to_ohlcv(make_tokens(i, 90)) for i in range(4)}

    def drop(name, lo, hi):
        rows = []
        for did, (h, l, c) in docs.items():
            for i in range(lo, min(hi, len(c))):
                rows.append(("s0", did, i, h[i], l[i], c[i]))
        pdf = pd.DataFrame(rows, columns=["source", "doc_id", "offset",
                                          "high", "low", "close"])
        (spark.createDataFrame(pdf)
         .coalesce(1).write.mode("append").parquet(in_dir))

    drop("a", 0, 30)
    stream_rsi(spark, in_dir, out_dir, ckpt, CFG)
    drop("b", 30, 60)
    # overlap 50-60 replays already-seen offsets -> must be ignored
    drop("c", 50, 90)
    stream_rsi(spark, in_dir, out_dir, ckpt, CFG)

    got = (spark.read.parquet(out_dir).toPandas()
           .sort_values(["doc_id", "offset"]).reset_index(drop=True))
    assert len(got) == 4 * 90
    assert got.groupby(["doc_id", "offset"]).size().max() == 1

    for did, (h, l, c) in docs.items():
        want = core_loop(h, l, c, CFG.atr_period, CFG.adaptive_offset)
        sub = got[got["doc_id"] == did].sort_values("offset")
        for k in CORE_OUTPUTS:
            np.testing.assert_array_equal(
                sub[k if k != "rsi" else "rsi"].to_numpy(), want[k],
                err_msg=f"{did}.{k}")
