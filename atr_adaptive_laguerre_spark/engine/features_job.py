"""Feature-extraction jobs: doc-grain token table -> per-step features.

Two physical strategies, one logical result:

* :func:`core_features_long` — **zero-shuffle scan path** for doc-grain
  input (the ``input_hint`` shape: one row per entity holding the whole
  ``tokens`` array).  Each entity already arrives complete in one row, so
  ``mapInPandas`` computes the sequential recurrence without any exchange;
  parallelism and load balance come from Parquet file splits
  (bytes ∝ tokens ∝ kernel work).  At 100 TB this is the plan you want:
  scan -> Python/Arrow kernel -> write, no wide dependency at all.

* :func:`core_features_from_long` — **salted applyInPandas path** for
  long-form input (one row per token: entity spread over rows).  Rows are
  hash/range-partitioned by the salted entity key, grouped, sorted by
  ``offset`` *inside* the kernel (Spark does not guarantee group order),
  and run through the same batched kernel.  One intended shuffle.

Both paths call the identical lockstep kernel
(:mod:`atr_adaptive_laguerre_spark.kernel.batched`), so their outputs are
bit-identical to each other and to the local oracle.

Reference lifecycle being re-expressed: ``fit_transform`` ->
``_compute_core_loop`` (``/root/reference/src/atr_adaptive_laguerre/features/
atr_adaptive_rsi.py:300-453``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.data.corpus import tokens_to_ohlcv_batched
from atr_adaptive_laguerre_spark.engine.partitioning import repartition_by_entity
from atr_adaptive_laguerre_spark.kernel.batched import (
    core_loop_batched, pad_sequences,
)
from atr_adaptive_laguerre_spark.kernel.reference_impl import CORE_OUTPUTS

#: cap on padded cells (docs x max_len) per kernel invocation; bounds the
#: Python worker's peak memory independent of Arrow batch sizing.
CELL_BUDGET = 2_000_000

CORE_LONG_SCHEMA = (
    "source string, doc_id string, offset int, token int, "
    + ", ".join(f"{c} double" for c in CORE_OUTPUTS)
)

CORE_DOC_SCHEMA = (
    "source string, doc_id string, n_tok int, tokens array<int>, "
    "rsi array<double>"
)


def _length_chunks(lengths: np.ndarray, cell_budget: int) -> Iterator[np.ndarray]:
    """Yield index chunks, sorted by length (padding-efficient), where each
    chunk's padded size len(chunk) * max_len stays under the budget and the
    in-chunk length spread stays tight (padding efficiency >= ~0.75)."""
    order = np.argsort(lengths, kind="stable")
    start = 0
    while start < len(order):
        max_len = 0
        first_len = max(1, int(lengths[order[start]]))
        end = start
        while end < len(order):
            cand = max(max_len, int(lengths[order[end]]))
            too_big = (end - start + 1) * cand > cell_budget
            too_ragged = cand > first_len * 4 / 3 and end - start >= 32
            if (too_big or too_ragged) and end > start:
                break
            max_len = cand
            end += 1
        yield order[start:end]
        start = end


def _kernel_on_docs(pdf: pd.DataFrame, cfg: FeatureConfig,
                    long_form: bool, cell_budget: int = CELL_BUDGET,
                    ) -> Iterator[pd.DataFrame]:
    """Run the batched kernel over a pandas batch of doc rows."""
    if len(pdf) == 0:
        return
    toks = [np.asarray(t, dtype=np.int32) for t in pdf["tokens"]]
    lengths = np.fromiter((len(t) for t in toks), dtype=np.int64,
                          count=len(toks))
    for idx in _length_chunks(lengths, cell_budget):
        chunk_toks = [toks[i] for i in idx]
        mat, lens = pad_sequences(chunk_toks, dtype=np.int64)
        high, low, close = tokens_to_ohlcv_batched(mat)
        out = core_loop_batched(high, low, close,
                                cfg.atr_period, cfg.adaptive_offset)
        src = pdf["source"].to_numpy()[idx]
        did = pdf["doc_id"].to_numpy()[idx]
        if long_form:
            # explode: one output row per (entity, offset)
            reps = lens
            flat_mask_cols = {}
            for k in CORE_OUTPUTS:
                m = out[k]
                flat_mask_cols[k] = np.concatenate(
                    [m[b, : reps[b]] for b in range(len(idx))])
            offsets = np.concatenate(
                [np.arange(n, dtype=np.int32) for n in reps])
            yield pd.DataFrame({
                "source": np.repeat(src, reps),
                "doc_id": np.repeat(did, reps),
                "offset": offsets,
                # token pass-through straight from the input arrays
                "token": np.concatenate(chunk_toks),
                **flat_mask_cols,
            })
        else:
            yield pd.DataFrame({
                "source": src,
                "doc_id": did,
                "n_tok": lens.astype(np.int32),
                # pass the original arrays through untouched
                "tokens": pd.Series(chunk_toks, dtype=object),
                "rsi": pd.Series(
                    [out["rsi"][b, : lens[b]] for b in range(len(idx))],
                    dtype=object),
            })


def core_features_long(doc_df: DataFrame,
                       cfg: FeatureConfig | None = None,
                       num_partitions: int | None = None) -> DataFrame:
    """Doc-grain input -> long-form (entity x offset) core features.

    Zero-shuffle by default: mapInPandas over the scan output, with
    parallelism from Parquet file splits (bytes ∝ tokens ∝ work).  Pass
    ``num_partitions`` to force a round-robin repartition first — useful
    when the input is a few small files (e.g. local benches) whose splits
    underuse the cluster; at real scale leave it unset.
    """
    cfg = cfg or FeatureConfig()
    if num_partitions:
        doc_df = doc_df.repartition(num_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from _kernel_on_docs(pdf, cfg, long_form=True)

    return doc_df.mapInPandas(run, schema=CORE_LONG_SCHEMA)


def core_features_doc(doc_df: DataFrame,
                      cfg: FeatureConfig | None = None) -> DataFrame:
    """Doc-grain input -> doc-grain output with the original ``tokens``
    array passed through bit-exactly plus a per-step ``rsi`` array."""
    cfg = cfg or FeatureConfig()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from _kernel_on_docs(pdf, cfg, long_form=False)

    return doc_df.mapInPandas(run, schema=CORE_DOC_SCHEMA)


def core_features_from_long(long_df: DataFrame,
                            cfg: FeatureConfig | None = None,
                            num_partitions: int | None = None) -> DataFrame:
    """Long-form input (source, doc_id, offset, token) -> same long-form
    output as :func:`core_features_long`.

    One shuffle: salted repartition by entity, then grouped-map kernel.
    The kernel sorts each group by ``offset`` (Spark gives no group-order
    guarantee — SURVEY §4).
    """
    cfg = cfg or FeatureConfig()
    if num_partitions:
        long_df = repartition_by_entity(long_df, num_partitions)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("offset", kind="stable")
        tokens = pdf["token"].to_numpy(dtype=np.int64)[None, :]
        high, low, close = tokens_to_ohlcv_batched(tokens)
        out = core_loop_batched(high, low, close,
                                cfg.atr_period, cfg.adaptive_offset)
        res = pd.DataFrame({
            "source": pdf["source"].to_numpy(),
            "doc_id": pdf["doc_id"].to_numpy(),
            "offset": pdf["offset"].to_numpy(dtype=np.int32),
            "token": pdf["token"].to_numpy(dtype=np.int32),
        })
        for k in CORE_OUTPUTS:
            res[k] = out[k][0]
        return res

    return (long_df.groupBy("source", "doc_id")
            .applyInPandas(run, schema=CORE_LONG_SCHEMA))


def explode_tokens(doc_df: DataFrame) -> DataFrame:
    """Doc-grain -> long-form via posexplode (Spark-native, no Python)."""
    from pyspark.sql import functions as F

    return doc_df.select(
        "source", "doc_id",
        F.posexplode("tokens").alias("offset", "token"))
