"""Stateful streaming: O(1)-per-bar incremental ATR-Adaptive Laguerre RSI.

Streaming re-expression of the reference's ``update()`` path
(``/root/reference/src/atr_adaptive_laguerre/features/atr_adaptive_rsi.py:
542-672``): per-entity state = {prev_close, first_bar, TR ring buffer,
tr_sum, L0..L3}, advanced one bar at a time, emitting rsi (+ the
intermediates, the ``update_full`` variant).

Spark mapping: ``applyInPandasWithState`` keyed by (source, doc_id);
state lives in the streaming state store, so a restart from checkpoint
resumes mid-entity with bit-identical results (tested).  Rows within and
across micro-batches are applied in ``offset`` order; already-seen
offsets are dropped (idempotent replay guard — the streaming analogue of
the reference's monotonic-input invariant).

The per-bar math is the same operation sequence as the batch kernel
(``kernel.reference_impl.core_loop``), so streaming output ==
batch output exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atr_adaptive_laguerre_spark.config import FeatureConfig

OUTPUT_SCHEMA = ("source string, doc_id string, offset long, "
                 "rsi double, adaptive_coeff double, gamma double, "
                 "L0 double, L1 double, L2 double, L3 double, "
                 "min_atr double, max_atr double, atr double")

STATE_SCHEMA = ("prev_close double, seen int, tr_buf array<double>, "
                "buf_head int, buf_len int, tr_sum double, "
                "l0 double, l1 double, l2 double, l3 double, "
                "last_offset long")


def step(state: dict, h: float, lo: float, c: float,
         atr_period: int, adaptive_offset: float) -> tuple:
    """Advance per-entity state by one bar; returns the output tuple.
    Same float64 operation order as the batch kernel."""
    if not state["seen"]:
        tr = h - lo
        state["seen"] = 1
    else:
        pc = state["prev_close"]
        hv = h if h > pc else pc
        lv = lo if lo < pc else pc
        tr = hv - lv
    state["prev_close"] = c

    buf = state["tr_buf"]
    p = atr_period
    if state["buf_len"] == p:
        old = buf[state["buf_head"]]
        state["tr_sum"] = state["tr_sum"] + tr - old
    else:
        state["tr_sum"] += tr
        state["buf_len"] += 1
    buf[state["buf_head"]] = tr
    state["buf_head"] = (state["buf_head"] + 1) % p
    atr = state["tr_sum"] / state["buf_len"]

    n = state["buf_len"]
    if n < 2:
        min_atr = max_atr = atr
    else:
        running = 0.0
        min_atr, max_atr = np.inf, -np.inf
        for k in range(1, n + 1):
            idx = (state["buf_head"] - k) % p
            running += buf[idx]
            atr_k = running / k
            if atr_k < min_atr:
                min_atr = atr_k
            if atr_k > max_atr:
                max_atr = atr_k

    _max = max_atr if max_atr > atr else atr
    _min = min_atr if min_atr < atr else atr
    coeff = 0.5 if _min == _max else 1.0 - (atr - _min) / (_max - _min)
    period = float(p) * (coeff + adaptive_offset)
    gamma = 1.0 - 10.0 / (period + 9.0)

    p0, p1, p2 = state["l0"], state["l1"], state["l2"]
    state["l0"] = c + gamma * (state["l0"] - c)
    state["l1"] = p0 + gamma * (state["l1"] - state["l0"])
    state["l2"] = p1 + gamma * (state["l2"] - state["l1"])
    state["l3"] = p2 + gamma * (state["l3"] - state["l2"])
    l0, l1, l2, l3 = state["l0"], state["l1"], state["l2"], state["l3"]

    cu = cd = 0.0
    if l0 >= l1:
        cu += l0 - l1
    else:
        cd += l1 - l0
    if l1 >= l2:
        cu += l1 - l2
    else:
        cd += l2 - l1
    if l2 >= l3:
        cu += l2 - l3
    else:
        cd += l3 - l2
    tot = cu + cd
    rsi = 0.0 if tot == 0.0 else cu / tot
    return (rsi, coeff, gamma, l0, l1, l2, l3, min_atr, max_atr, atr)


def make_update_fn(cfg: FeatureConfig):
    """Build the applyInPandasWithState function."""
    p = cfg.atr_period
    off = cfg.adaptive_offset

    def fn(key, pdf_iter, state):
        source, doc_id = key
        if state.exists:
            (prev_close, seen, tr_buf, buf_head, buf_len, tr_sum,
             l0, l1, l2, l3, last_offset) = state.get
            st = {"prev_close": prev_close, "seen": seen,
                  "tr_buf": list(tr_buf), "buf_head": buf_head,
                  "buf_len": buf_len, "tr_sum": tr_sum,
                  "l0": l0, "l1": l1, "l2": l2, "l3": l3}
        else:
            st = {"prev_close": 0.0, "seen": 0, "tr_buf": [0.0] * p,
                  "buf_head": 0, "buf_len": 0, "tr_sum": 0.0,
                  "l0": 0.0, "l1": 0.0, "l2": 0.0, "l3": 0.0}
            last_offset = -1

        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("offset", kind="stable")
            for r in pdf.itertuples(index=False):
                if r.offset <= last_offset:
                    continue  # idempotent replay guard
                outs = step(st, float(r.high), float(r.low),
                            float(r.close), p, off)
                last_offset = int(r.offset)
                rows.append((source, doc_id, last_offset, *outs))

        state.update((st["prev_close"], st["seen"], st["tr_buf"],
                      st["buf_head"], st["buf_len"], st["tr_sum"],
                      st["l0"], st["l1"], st["l2"], st["l3"],
                      int(last_offset)))
        cols = ["source", "doc_id", "offset", "rsi", "adaptive_coeff",
                "gamma", "L0", "L1", "L2", "L3", "min_atr", "max_atr",
                "atr"]
        yield pd.DataFrame(rows, columns=cols)

    return fn


INPUT_SCHEMA = ("source string, doc_id string, offset long, "
                "high double, low double, close double")


def stream_rsi(spark, input_dir: str, output_dir: str,
               checkpoint_dir: str, cfg: FeatureConfig | None = None,
               ) -> None:
    """One availableNow micro-batch pass over the file stream: reads new
    files from ``input_dir``, advances per-entity state (restored from
    ``checkpoint_dir``), appends results to ``output_dir``.  Call again
    after new files arrive — state carries over."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    cfg = cfg or FeatureConfig()
    sdf = (spark.readStream.schema(INPUT_SCHEMA).parquet(input_dir))
    out = (sdf.groupBy("source", "doc_id")
           .applyInPandasWithState(
               make_update_fn(cfg), OUTPUT_SCHEMA, STATE_SCHEMA,
               "append", GroupStateTimeout.NoTimeout))
    q = (out.writeStream.format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
