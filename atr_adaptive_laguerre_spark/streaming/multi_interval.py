"""Streaming 121-column multi-interval pipeline — AVAILABILITY mode.

Why availability mode and not the default: the reference's positional
alignment maps base row i to resampled row min(i, n//m - 1)
(`kernel/multi_interval_batched._align_gather_idx`), so emitting row i
with batch parity would require m*(i+1) bars — a lag growing m-fold
with stream length.  The strict point-in-time variant
(`_align_gather_idx_avail`, reference
``_fit_transform_features_with_availability``) is non-anticipative:
a base row's aligned grain features depend only on windows whose
availability is strictly below the row's, so a row becomes IMMUTABLE as
soon as each grain has one completed window with availability >= the
row's — an emission lag bounded by ``multiplier_2`` bars, constant in
stream length.

Design: bounded-entity recompute.  Entities here are pre-tokenized
training sequences with bounded length (the input_hint domain), so the
state carries the entity's full (high, low, close, avail) history —
O(n_tok) doubles, ~20 KB for a typical 600-bar sequence — and each
micro-batch reruns the fused batch kernel on the (1, n) slab, emitting
exactly the rows that have become final.  Recompute keeps bit-parity
trivially (same kernel, same full prefix) at O(n) work per micro-batch;
the incremental-state design for unbounded entities (per-grain partial
windows + resumed grain kernels + two-pointer as-of) is sketched in the
project notes and deliberately out of scope.

Emission rule (strict-tie safe): with lm_g complete windows of grain g,
row i is final iff every grain has lm_g >= 1 and
avail[lm_g * m_g - 1] >= avail[i] — a later window's availability can
never drop below an existing one (availability is monotone), and a tie
is excluded by the strict rule on BOTH sides, so >= settles it.  The
trailing < multiplier_2 bars of a finished stream remain unemitted
(they are not yet final); batch parity over emitted rows is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.engine.features_job import feature_columns_for

AVAIL_INPUT_SCHEMA = ("source string, doc_id string, offset long, "
                      "high double, low double, close double, avail double")

STATE121_SCHEMA = ("last_offset long, emitted_upto long, "
                   "h array<double>, l array<double>, c array<double>, "
                   "av array<double>")


def make_update121_fn(cfg: FeatureConfig):
    from atr_adaptive_laguerre_spark.kernel.multi_interval_batched import (
        multi_interval_long,
    )

    assert cfg.is_multi_interval and cfg.availability
    m1, m2 = cfg.multiplier_1, cfg.multiplier_2
    feat_cols = feature_columns_for(cfg)

    def fn(key, pdf_iter, state):
        source, doc_id = key
        if state.exists:
            (last_offset, emitted_upto, h_l, l_l, c_l, av_l) = state.get
            h = np.asarray(h_l, dtype=np.float64)
            lo = np.asarray(l_l, dtype=np.float64)
            c = np.asarray(c_l, dtype=np.float64)
            av = np.asarray(av_l, dtype=np.float64)
        else:
            last_offset, emitted_upto = -1, 0
            h = lo = c = av = np.empty(0)

        from atr_adaptive_laguerre_spark.streaming.stateful import (
            filter_new_bars, gather_group_chunks,
        )

        for pdf in gather_group_chunks(pdf_iter):
            pdf = filter_new_bars(pdf, last_offset)
            if len(pdf) == 0:
                continue
            offs = pdf["offset"].to_numpy(dtype=np.int64)
            # the positional resample makes gapless offsets load-bearing
            # (history position == offset); fail loud on a gap rather
            # than emit silently misaligned windows
            if offs[0] != last_offset + 1 or \
                    (len(offs) > 1 and (np.diff(offs) != 1).any()):
                raise ValueError(
                    f"offset gap for entity {doc_id!r}: got "
                    f"{offs[0]}..{offs[-1]} after {last_offset}")
            h = np.concatenate([h, pdf["high"].to_numpy(dtype=np.float64)])
            lo = np.concatenate([lo, pdf["low"].to_numpy(dtype=np.float64)])
            c = np.concatenate([c, pdf["close"].to_numpy(dtype=np.float64)])
            av = np.concatenate([av, pdf["avail"].to_numpy(dtype=np.float64)])
            last_offset = int(pdf["offset"].to_numpy()[-1])
            n = len(c)

            lm1, lm2 = n // m1, n // m2
            if lm1 == 0 or lm2 == 0:
                continue                     # no row final yet (bfill open)
            av_cap = min(av[lm1 * m1 - 1], av[lm2 * m2 - 1])
            emit_hi = int(np.searchsorted(av, av_cap, side="right"))
            if emit_hi <= emitted_upto:
                continue

            cols = multi_interval_long(
                h[None, :], lo[None, :], c[None, :],
                np.array([n], dtype=np.int64), cfg, avail=av[None, :])
            sl = slice(emitted_upto, emit_hi)
            yield pd.DataFrame({
                "source": source, "doc_id": doc_id,
                "offset": np.arange(emitted_upto, emit_hi, dtype=np.int64),
                **{col: cols[col][sl] for col in feat_cols}})
            emitted_upto = emit_hi

        state.update((int(last_offset), int(emitted_upto),
                      h.tolist(), lo.tolist(), c.tolist(), av.tolist()))

    return fn


def output121_schema(cfg: FeatureConfig) -> str:
    return ("source string, doc_id string, offset long, "
            + ", ".join(f"{c} double" for c in feature_columns_for(cfg)))


def stream_features121_availability(spark, input_dir: str, output_dir: str,
                                    checkpoint_dir: str,
                                    cfg: FeatureConfig) -> None:
    """availableNow micro-batch pass emitting the full 121-column
    availability-mode expansion for every row that has become final,
    resuming from checkpointed state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out = (spark.readStream.schema(AVAIL_INPUT_SCHEMA).parquet(input_dir)
           .groupBy("source", "doc_id")
           .applyInPandasWithState(
               make_update121_fn(cfg), output121_schema(cfg),
               STATE121_SCHEMA, "append", GroupStateTimeout.NoTimeout))
    q = (out.writeStream.format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
