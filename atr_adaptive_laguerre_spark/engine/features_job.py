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
CELL_BUDGET = 262_144

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
    in-chunk length spread stays tight (padding efficiency >= ~0.75).

    Zero-length sequences are skipped entirely — an empty doc has no
    feature rows in long form by definition, and letting one into a
    chunk can produce a (B, 0) matrix that the kernel cannot index
    (tested: empty docs crash without this filter).  Every kernel entry
    point chunks through here, so this is the single choke point."""
    order = np.argsort(lengths, kind="stable")
    order = order[lengths[order] > 0]
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


def _chunk_feature_cols(mat, lens, cfg: FeatureConfig, pool=None):
    """OHLCV derivation + kernel dispatch for one padded chunk — the ONE
    definition every chunked path (pandas, mapInArrow long/doc/checksum)
    shares, so availability gating and kernel dispatch cannot drift
    between them."""
    from atr_adaptive_laguerre_spark.data.corpus import (
        tokens_to_availability_batched,
    )
    from atr_adaptive_laguerre_spark.kernel.multi_interval_batched import (
        multi_interval_long, single_interval_long,
    )

    high, low, close = tokens_to_ohlcv_batched(mat)
    if cfg.is_multi_interval:
        avail = (tokens_to_availability_batched(mat)
                 if cfg.availability else None)
        return multi_interval_long(high, low, close, lens, cfg,
                                   avail=avail, pool=pool)
    return single_interval_long(high, low, close, lens, cfg, pool=pool)


def _require_no_null_tokens_pandas(pdf: pd.DataFrame) -> None:
    """A NULL tokens array is a contract violation (empty docs must be
    [], not NULL) — fail loud with the doc named instead of letting
    numpy throw an opaque conversion error deep in the kernel."""
    null_mask = pdf["tokens"].isna()
    if null_mask.any():
        bad = pdf["doc_id"][null_mask].iloc[0]
        raise ValueError(
            f"null tokens array for doc_id {bad!r} "
            f"({int(null_mask.sum())} such rows in this batch); "
            f"empty documents must carry [] not NULL")


def _kernel_on_docs(pdf: pd.DataFrame, cfg: FeatureConfig,
                    long_form: bool, cell_budget: int = CELL_BUDGET,
                    ) -> Iterator[pd.DataFrame]:
    """Run the batched kernel over a pandas batch of doc rows."""
    if len(pdf) == 0:
        return
    _require_no_null_tokens_pandas(pdf)
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
    if not long_form:
        # the chunker skips n_tok==0 entities (no feature rows in long
        # form by definition), but the doc grain contracts ONE row per
        # entity — emit empty docs with empty arrays so they don't
        # silently vanish from the output
        empty = np.flatnonzero(lengths == 0)
        if len(empty):
            yield pd.DataFrame({
                "source": pdf["source"].to_numpy()[empty],
                "doc_id": pdf["doc_id"].to_numpy()[empty],
                "n_tok": np.zeros(len(empty), dtype=np.int32),
                "tokens": pd.Series(
                    [np.empty(0, dtype=np.int32)] * len(empty),
                    dtype=object),
                "rsi": pd.Series(
                    [np.empty(0, dtype=np.float64)] * len(empty),
                    dtype=object),
            })


def core_features_long(doc_df: DataFrame,
                       cfg: FeatureConfig | None = None,
                       num_partitions: int | None = None) -> DataFrame:
    """Doc-grain input -> long-form (entity x offset) core features.

    Zero-shuffle by default: ``mapInArrow`` over the scan output, with
    parallelism from Parquet file splits (bytes ∝ tokens ∝ work).  Pass
    ``num_partitions`` to force a round-robin repartition first — useful
    when the input is a few small files (e.g. local benches) whose splits
    underuse the cluster; at real scale leave it unset.

    Physical path mirrors :func:`features_long` (r6): tokens are read
    straight from the Arrow list buffers, the kernel outputs are gathered
    into pooled buffers and wrapped zero-copy — no pandas block
    consolidation on either side of the boundary.  Values are the same
    ``core_loop_batched`` outputs the previous mapInPandas path emitted
    (identical chunking, identical kernel calls).
    """
    import pyarrow as pa

    cfg = cfg or FeatureConfig()
    if num_partitions:
        doc_df = doc_df.repartition(num_partitions)

    def run(batches):
        def produce(emit, acquire_pool):
            import pyarrow.compute as pc

            j = 0
            for rb in batches:
                src_col = rb.column(rb.schema.get_field_index("source"))
                did_col = rb.column(rb.schema.get_field_index("doc_id"))
                for idx, chunk_flat, lens, mat, fe in _arrow_doc_chunks(rb):
                    pool = acquire_pool(j)
                    high, low, close = tokens_to_ohlcv_batched(mat)
                    out = core_loop_batched(high, low, close,
                                            cfg.atr_period,
                                            cfg.adaptive_offset,
                                            copy_out=False)
                    rep = pa.array(np.repeat(idx.astype(np.int64), lens))
                    offsets = np.concatenate(
                        [np.arange(n, dtype=np.int32) for n in lens])
                    arrays = [
                        pc.take(src_col, rep),
                        pc.take(did_col, rep),
                        pa.array(offsets),
                        pa.array(chunk_flat.astype(np.int32, copy=False)),
                    ]
                    for k in CORE_OUTPUTS:
                        buf = pool.get(f"core_{k}", len(fe))
                        np.take(out[k].ravel(), fe, out=buf)
                        arrays.append(pa.array(buf))
                    emit(pa.RecordBatch.from_arrays(
                        arrays,
                        ["source", "doc_id", "offset", "token"]
                        + list(CORE_OUTPUTS)))
                    j += 1

        yield from _overlap_chunks(produce)

    return doc_df.mapInArrow(run, schema=CORE_LONG_SCHEMA)


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


def feature_columns_for(cfg: FeatureConfig) -> list[str]:
    """Output feature columns for a config (43 / 169 / 121)."""
    from atr_adaptive_laguerre_spark.kernel.expander_ref import FEATURE_COLUMNS
    from atr_adaptive_laguerre_spark.kernel.multi_interval_ref import (
        multi_interval_columns,
    )

    if cfg.is_multi_interval:
        return multi_interval_columns(cfg.filter_redundancy)
    return list(FEATURE_COLUMNS)


def features_long_schema(cfg: FeatureConfig) -> str:
    return ("source string, doc_id string, offset int, token int, "
            + ", ".join(f"{c} double" for c in feature_columns_for(cfg)))


def _features_on_docs(pdf: pd.DataFrame, cfg: FeatureConfig,
                      cell_budget: int = CELL_BUDGET,
                      ) -> Iterator[pd.DataFrame]:
    """Full feature pipeline (43 or 169/121 cols) over a doc batch."""
    if len(pdf) == 0:
        return
    _require_no_null_tokens_pandas(pdf)
    toks = [np.asarray(t, dtype=np.int32) for t in pdf["tokens"]]
    lengths = np.fromiter((len(t) for t in toks), dtype=np.int64,
                          count=len(toks))
    for idx in _length_chunks(lengths, cell_budget):
        chunk_toks = [toks[i] for i in idx]
        mat, lens = pad_sequences(chunk_toks, dtype=np.int64)
        cols = _chunk_feature_cols(mat, lens, cfg)
        src = pdf["source"].to_numpy()[idx]
        did = pdf["doc_id"].to_numpy()[idx]
        offsets = np.concatenate(
            [np.arange(n, dtype=np.int32) for n in lens])
        yield pd.DataFrame({
            "source": np.repeat(src, lens),
            "doc_id": np.repeat(did, lens),
            "offset": offsets,
            "token": np.concatenate(chunk_toks),
            **cols,
        })


def _arrow_doc_chunks(rb, cell_budget: int = CELL_BUDGET):
    """Parse a doc-grain Arrow RecordBatch and yield padding-efficient
    chunks: (doc_row_idx, chunk_flat_tokens, lengths, padded_int64_matrix).

    Zero pandas involvement: token values come straight out of the Arrow
    list buffer; the padded matrix is one vectorized scatter.
    """
    import pyarrow.compute as pc

    tokens = rb.column(rb.schema.get_field_index("tokens"))
    if tokens.null_count:
        dids = rb.column(rb.schema.get_field_index("doc_id"))
        i = pc.index(pc.is_null(tokens), True).as_py()
        raise ValueError(
            f"null tokens array for doc_id {dids[i].as_py()!r} "
            f"({tokens.null_count} such rows in this batch); "
            f"empty documents must carry [] not NULL")
    lengths = pc.list_value_length(tokens).to_numpy().astype(np.int64)
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    for idx in _length_chunks(lengths, cell_budget):
        lens = lengths[idx]
        gidx = np.concatenate(
            [np.arange(starts[i], starts[i] + lengths[i]) for i in idx])
        chunk_flat = flat[gidx]
        t_max = int(lens.max()) if len(lens) else 0
        mat = _padded_int_buffer(len(idx), t_max)
        fe = _flat_explode_idx_local(lens, t_max)
        mat.ravel()[fe] = chunk_flat
        yield idx, chunk_flat, lens, mat, fe


_PAD_INT: dict[str, np.ndarray | None] = {"buf": None}


def _padded_int_buffer(b: int, t: int) -> np.ndarray:
    """Reusable int64 padded-token buffer (fresh big allocations are
    page-fault bound on virtualized hosts; see kernel.batched)."""
    need = b * t
    buf = _PAD_INT["buf"]
    if buf is None or buf.size < need:
        buf = _PAD_INT["buf"] = np.empty(max(need, CELL_BUDGET),
                                         dtype=np.int64)
    return buf[:need].reshape(b, t)


def _flat_explode_idx_local(lengths: np.ndarray, t: int) -> np.ndarray:
    from atr_adaptive_laguerre_spark.kernel.multi_interval_batched import (
        _flat_explode_idx,
    )

    return _flat_explode_idx(lengths, t)


_OVERLAP_DONE = object()


def _overlap_chunks(produce):
    """Overlap kernel compute with the worker's socket serialization.

    The Python worker is single-threaded: while it serializes a yielded
    RecordBatch to the JVM socket, the generator is suspended — so
    compute time and funnel time ADD.  With the r6 kernel ~2x faster,
    the 121-column job became funnel-bound (measured at sf1: checksum
    consumption 8.6 s vs full materialization 15.9 s), and the two
    phases are each GIL-releasing (NumPy slab ops / Arrow+socket C
    writes), so running compute on a helper thread overlaps them.

    ``produce(emit, acquire_pool)`` runs on the helper thread; it calls
    ``acquire_pool(j)`` before computing chunk ``j`` (returns one of the
    TWO persistent OutPools and, for j >= 2, blocks until chunk j-2 —
    same pool parity — has been fully serialized) and ``emit(batch)``
    per finished RecordBatch.  The ack protocol is what makes the
    zero-copy pooled buffers safe: the worker serializes a yielded
    batch BEFORE resuming the generator, so the consumer's post-yield
    ack certifies "this chunk's buffers may be overwritten".  Errors
    propagate; generator close (task kill) stops the thread promptly.
    """
    import queue
    import threading

    from atr_adaptive_laguerre_spark.kernel.batched import get_out_pool

    out_q: queue.Queue = queue.Queue(maxsize=2)
    ack_q: queue.Queue = queue.Queue()
    stop = threading.Event()

    class _Stopped(Exception):
        pass

    def acquire_pool(j: int):
        if j >= 2:
            while True:
                if stop.is_set():
                    raise _Stopped
                try:
                    ack_q.get(timeout=1.0)
                    break
                except queue.Empty:
                    continue
        return get_out_pool(j % 2)

    def emit(batch) -> None:
        while True:
            if stop.is_set():
                raise _Stopped
            try:
                out_q.put(batch, timeout=1.0)
                return
            except queue.Full:
                continue

    def runner():
        try:
            produce(emit, acquire_pool)
            out_q.put(_OVERLAP_DONE)
        except _Stopped:
            pass
        except BaseException as e:  # noqa: BLE001 — must cross threads
            try:
                out_q.put(e, timeout=10.0)
            except queue.Full:
                pass

    t = threading.Thread(target=runner, daemon=True,
                         name="kernel-compute-overlap")
    t.start()
    try:
        while True:
            item = out_q.get()
            if item is _OVERLAP_DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item          # worker serializes before next()
            ack_q.put(1)
    finally:
        stop.set()
        # Block until the producer actually exits: Spark reuses this
        # worker process for the NEXT task, and a producer still inside
        # a kernel chunk would race that task's use of the shared
        # Workspace/_PAD_INT buffers.  Bounded wait: the producer
        # notices `stop` at its next emit/acquire poll (<= ~1 s past
        # the current chunk's compute).
        t.join(timeout=60.0)


def features_long(doc_df: DataFrame, cfg: FeatureConfig | None = None,
                  num_partitions: int | None = None,
                  cell_budget: int = CELL_BUDGET,
                  columns: list[str] | None = None) -> DataFrame:
    """Doc-grain input -> long-form full feature matrix.

    43 columns single-interval; 169/121 multi-interval (resample, align,
    cross-interval interactions, redundancy filter — all inside the one
    Arrow kernel, mirroring the reference's in-process fusion).  Zero
    shuffle unless ``num_partitions`` forces a spread.

    Physical path: ``mapInArrow`` — token values are read straight from
    the Arrow list buffers and every output column is built zero-copy
    from the kernel's NumPy arrays (no pandas block consolidation, which
    would copy the whole 121-column matrix once more).

    ``columns`` projects the OUTPUT at the worker: Catalyst cannot push
    a projection through a Python map node, so a downstream select still
    pays Arrow transfer + row conversion for all 121 columns — the
    dominant cost of this job (BENCH/BASELINE.md: the funnel moves
    ~1-2 GB/s while the kernel computes ~3M tokens/s).  Passing the
    needed subset here keeps the kernel fused (it computes everything;
    compute is cheap) but ships only the requested features.
    """
    import pyarrow as pa

    cfg = cfg or FeatureConfig()
    if num_partitions:
        doc_df = doc_df.repartition(num_partitions)
    feat_cols = feature_columns_for(cfg)
    if columns is not None:
        unknown = sorted(set(columns) - set(feat_cols))
        if unknown:
            raise ValueError(f"unknown feature columns: {unknown}")
        feat_cols = [c for c in feat_cols if c in set(columns)]
    schema = ("source string, doc_id string, offset int, token int, "
              + ", ".join(f"{c} double" for c in feat_cols))

    def run(batches):
        def produce(emit, acquire_pool):
            import pyarrow.compute as pc

            j = 0
            for rb in batches:
                src_col = rb.column(rb.schema.get_field_index("source"))
                did_col = rb.column(rb.schema.get_field_index("doc_id"))
                for idx, chunk_flat, lens, mat, _fe in _arrow_doc_chunks(
                        rb, cell_budget):
                    pool = acquire_pool(j)
                    cols = _chunk_feature_cols(mat, lens, cfg, pool=pool)
                    rep = pa.array(np.repeat(idx.astype(np.int64), lens))
                    offsets = np.concatenate(
                        [np.arange(n, dtype=np.int32) for n in lens])
                    arrays = [
                        pc.take(src_col, rep),
                        pc.take(did_col, rep),
                        pa.array(offsets),
                        pa.array(chunk_flat.astype(np.int32, copy=False)),
                    ]
                    arrays += [pa.array(cols[c]) for c in feat_cols]
                    emit(pa.RecordBatch.from_arrays(
                        arrays,
                        ["source", "doc_id", "offset", "token"]
                        + feat_cols))
                    j += 1

        yield from _overlap_chunks(produce)

    return doc_df.mapInArrow(run, schema=schema)


def features_doc_schema(cfg: FeatureConfig) -> str:
    return ("source string, doc_id string, n_tok int, tokens array<int>, "
            + ", ".join(f"{c} array<double>" for c in feature_columns_for(cfg)))


def features_doc(doc_df: DataFrame, cfg: FeatureConfig | None = None,
                 num_partitions: int | None = None,
                 columns: list[str] | None = None) -> DataFrame:
    """Doc-grain input -> doc-grain output: one row per entity carrying
    the original ``tokens`` array (bit-exact pass-through) plus each
    feature as an ``array<double>`` aligned to the token positions.

    Same information as :func:`features_long` at ~1/500th the row count:
    the per-row JVM ingest cost (columnar->row conversion, row accounting)
    collapses, which matters when the 121-column matrix is the dominant
    byte stream.  List columns are assembled zero-copy from the kernel's
    pooled 1-D outputs (ListArray.from_arrays over the chunk offsets).

    ``columns`` worker-projects the output exactly like
    :func:`features_long` (Catalyst cannot prune through the Python map
    node; the kernel stays fused, only requested features ship).
    """
    import pyarrow as pa

    cfg = cfg or FeatureConfig()
    if num_partitions:
        doc_df = doc_df.repartition(num_partitions)
    feat_cols = feature_columns_for(cfg)
    if columns is not None:
        unknown = sorted(set(columns) - set(feat_cols))
        if unknown:
            raise ValueError(f"unknown feature columns: {unknown}")
        feat_cols = [c for c in feat_cols if c in set(columns)]
    schema = ("source string, doc_id string, n_tok int, tokens array<int>, "
              + ", ".join(f"{c} array<double>" for c in feat_cols))

    def run(batches):
        import pyarrow.compute as pc

        from atr_adaptive_laguerre_spark.kernel.batched import get_out_pool

        pool = get_out_pool()
        for rb in batches:
            src_col = rb.column(rb.schema.get_field_index("source"))
            did_col = rb.column(rb.schema.get_field_index("doc_id"))
            for idx, chunk_flat, lens, mat, _fe in _arrow_doc_chunks(rb):
                cols = _chunk_feature_cols(mat, lens, cfg, pool=pool)
                offs = np.zeros(len(lens) + 1, dtype=np.int32)
                np.cumsum(lens, out=offs[1:])
                pa_offs = pa.array(offs)
                take_idx = pa.array(idx.astype(np.int64))
                arrays = [
                    pc.take(src_col, take_idx),
                    pc.take(did_col, take_idx),
                    pa.array(lens.astype(np.int32)),
                    pa.ListArray.from_arrays(
                        pa_offs,
                        pa.array(chunk_flat.astype(np.int32, copy=False))),
                ]
                arrays += [pa.ListArray.from_arrays(pa_offs, pa.array(cols[c]))
                           for c in feat_cols]
                yield pa.RecordBatch.from_arrays(
                    arrays, ["source", "doc_id", "n_tok", "tokens"]
                    + feat_cols)
            # n_tok==0 entities are skipped by the chunker (no long-form
            # rows) but the doc grain contracts ONE row per entity —
            # emit them with empty arrays
            tok_col = rb.column(rb.schema.get_field_index("tokens"))
            all_lens = pc.list_value_length(tok_col).to_numpy()
            empty = np.flatnonzero(all_lens == 0)
            if len(empty):
                z_offs = pa.array(np.zeros(len(empty) + 1, dtype=np.int32))
                take_idx = pa.array(empty.astype(np.int64))
                arrays = [
                    pc.take(src_col, take_idx),
                    pc.take(did_col, take_idx),
                    pa.array(np.zeros(len(empty), dtype=np.int32)),
                    pa.ListArray.from_arrays(
                        z_offs, pa.array(np.empty(0, dtype=np.int32))),
                ]
                arrays += [pa.ListArray.from_arrays(
                    z_offs, pa.array(np.empty(0, dtype=np.float64)))
                    for _ in feat_cols]
                yield pa.RecordBatch.from_arrays(
                    arrays, ["source", "doc_id", "n_tok", "tokens"]
                    + feat_cols)

    return doc_df.mapInArrow(run, schema=schema)


def features_checksum(doc_df: DataFrame, cfg: FeatureConfig | None = None,
                      num_partitions: int | None = None) -> DataFrame:
    """Compute the full feature matrix and emit per-chunk integrity
    checksums (row count + per-column sums) instead of the vectors —
    the map-side-combined plan for "compute features and verify them".

    Every feature value is materialized in the worker exactly as in
    :func:`features_long`; only ~1 KB per chunk crosses to the JVM, so
    this job's throughput measures the compute fabric rather than the
    single-box byte funnel.

    Sums are ``nansum`` (multi-interval runs emit NaN mult columns for
    docs shorter than the multiplier), so ``agg(sum(...))`` over
    :func:`features_long` equals them only where Spark's NaN-propagating
    sum sees no NaN; the ``n_nan`` column carries the per-chunk NaN count
    across all feature columns so NaN corruption cannot pass unnoticed —
    ``agg(sum(n_nan))`` must equal the isnan-count over
    :func:`features_long` (tested on a corpus with short docs).
    """
    import pyarrow as pa

    cfg = cfg or FeatureConfig()
    if num_partitions:
        doc_df = doc_df.repartition(num_partitions)
    feat_cols = feature_columns_for(cfg)
    schema = ("n_rows long, n_nan long, " +
              ", ".join(f"{c}_sum double" for c in feat_cols))

    def run(batches):
        from atr_adaptive_laguerre_spark.kernel.batched import get_out_pool

        pool = get_out_pool()
        for rb in batches:
            for idx, chunk_flat, lens, mat, _fe in _arrow_doc_chunks(rb):
                cols = _chunk_feature_cols(mat, lens, cfg, pool=pool)
                n_nan = sum(int(np.isnan(cols[c]).sum())
                            for c in feat_cols)
                arrays = [pa.array([int(lens.sum())], pa.int64()),
                          pa.array([n_nan], pa.int64())]
                arrays += [pa.array([float(np.nansum(cols[c]))])
                           for c in feat_cols]
                yield pa.RecordBatch.from_arrays(
                    arrays,
                    ["n_rows", "n_nan"] + [f"{c}_sum" for c in feat_cols])

    return doc_df.mapInArrow(run, schema=schema)


def core_features_from_long_sorted(long_df: DataFrame,
                                   cfg: FeatureConfig | None = None,
                                   num_partitions: int = 32) -> DataFrame:
    """Long-form input -> long-form core features via the
    **partition-sorted batched** path: salted ``repartitionByRange`` on
    the entity key, ``sortWithinPartitions(entity, offset)``, then ONE
    ``mapInPandas`` over each whole partition that slices consecutive
    entities and runs them through the *batched* kernel together.

    Compared to ``core_features_from_long`` (grouped applyInPandas, one
    kernel call per entity), this amortizes the kernel across all
    entities of a partition — the physical plan the north rule describes
    (range-partition + salt, per-entity sequential math inside a
    vectorized Arrow kernel).  Entities are never split: the sort makes
    them contiguous, and rows of the partition's final entity are held
    back until the batch iterator is exhausted.
    """
    from atr_adaptive_laguerre_spark.engine.partitioning import (
        salted_entity_key,
    )

    cfg = cfg or FeatureConfig()
    keyed = salted_entity_key(long_df)
    part = (keyed.repartitionByRange(num_partitions, "_ekey")
            .sortWithinPartitions("_ekey", "offset"))

    def process_group(chunk: pd.DataFrame) -> Iterator[pd.DataFrame]:
        # chunk holds >=1 complete entities, sorted by (_ekey, offset)
        ek = chunk["_ekey"].to_numpy()
        bounds = np.flatnonzero(np.concatenate(([True], ek[1:] != ek[:-1])))
        bounds = np.append(bounds, len(ek))
        tok_all = chunk["token"].to_numpy(dtype=np.int32)  # ONE conversion
        toks = [tok_all[bounds[i]:bounds[i + 1]]
                for i in range(len(bounds) - 1)]
        sub = chunk.iloc[bounds[:-1]]
        pdf = pd.DataFrame({
            "tokens": pd.Series(list(toks), dtype=object),
            "source": sub["source"].to_numpy(),
            "doc_id": sub["doc_id"].to_numpy(),
        })
        yield from _kernel_on_docs(pdf, cfg, long_form=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        held: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if held is not None:
                pdf = pd.concat([held, pdf], ignore_index=True)
            ek = pdf["_ekey"].to_numpy()
            last_key = ek[-1]
            cut = np.searchsorted(ek, last_key, side="left")
            if cut > 0:
                yield from process_group(pdf.iloc[:cut])
            held = pdf.iloc[cut:]
        if held is not None and len(held):
            yield from process_group(held)

    return part.mapInPandas(run, schema=CORE_LONG_SCHEMA)


def explode_tokens(doc_df: DataFrame) -> DataFrame:
    """Doc-grain -> long-form via posexplode (Spark-native, no Python)."""
    from pyspark.sql import functions as F

    return doc_df.select(
        "source", "doc_id",
        F.posexplode("tokens").alias("offset", "token"))
