"""DuckDB oracle SQL generators for the flagship kernel queries.

The driver's correctness gate runs each ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB, then compares row counts, column
names and an exact value hash.  The flagship queries run the sequential
ATR-Adaptive Laguerre recurrence (reference semantics:
``/root/reference/src/atr_adaptive_laguerre/core/_numba_kernel.py:14-166``),
which plain window SQL cannot express — but a *recursive CTE* can, carrying
the per-entity state (prev close, TR ring buffer, Laguerre stages, EWM
accumulator) across steps.

Bit-exactness strategy: every scalar float64 operation is emitted in the
**same order** as the numpy kernels (``kernel/reference_impl.py``,
``kernel/expander_batched.py``), so both engines perform the identical
IEEE-754 op sequence.  Order-sensitive window sums are evaluated with
``list_reduce`` over explicitly reversed frame lists (the kernels
accumulate newest-to-oldest).  Both sides additionally quantize through
``floor(x*1e6+0.5)/1e6`` as belt-and-braces (a 1-ulp divergence would
otherwise flip the exact hash).

DuckDB 1.0 quirks handled here:

* bare float literals parse as DECIMAL — every literal is ``::DOUBLE``-cast
  or written through :func:`_d` (shortest round-trip repr of the Python
  float, which DuckDB parses back to the identical double);
* NaN orders *greater than* everything and ``NaN = NaN`` is true — numpy
  comparison semantics (``NaN > x`` false, ``NaN == NaN`` false,
  ``minimum(x, NaN) = NaN``) are restored with explicit ``isnan`` guards
  (:func:`_gt`, :func:`_eqnan`, :func:`_nmin`, :func:`_sgn`) on every
  NaN-able multi-interval input (docs shorter than a multiplier get NaN
  mult features — ``kernel/multi_interval_batched.py:330-344``).
"""

from __future__ import annotations

from atr_adaptive_laguerre_spark.data.corpus import VOCAB
from atr_adaptive_laguerre_spark.kernel.expander_ref import FEATURE_COLUMNS
from atr_adaptive_laguerre_spark.kernel.multi_interval_ref import (
    INTERACTION_COLUMNS, multi_interval_columns,
)

# engine constants (FeatureConfig defaults used by the flagship queries)
ATR_PERIOD = 14
ADAPTIVE_OFFSET = 0.75
UP, DOWN = 0.85, 0.15
SW = 20          # stats_window
VSPAN = 5        # velocity_span
ALPHA = 2.0 / (VSPAN + 1.0)


def _d(x: float) -> str:
    """Emit a Python float as an exact DuckDB DOUBLE literal."""
    return f"{x!r}::DOUBLE"


def _r6(expr: str) -> str:
    """The cross-engine quantizer: floor(x*1e6 + 0.5)/1e6."""
    return f"FLOOR(({expr}) * 1000000 + 0.5) / 1000000"


# --- numpy-faithful NaN helpers (DuckDB NaN sorts greatest / NaN=NaN) ---

def _gt(a: str, b: str) -> str:
    """numpy ``a > b``: False when a is NaN (DuckDB would say True)."""
    return f"((NOT isnan({a})) AND ({a}) > ({b}))"


def _lt(a: str, b: str) -> str:
    """numpy ``a < b``: False when b is NaN (DuckDB would say True)."""
    return f"((NOT isnan({b})) AND ({a}) < ({b}))"


def _eqnan(a: str, b: str) -> str:
    """numpy ``a == b``: False when either is NaN (DuckDB NaN=NaN is true)."""
    return f"((NOT isnan({a})) AND ({a}) = ({b}))"


def _nmin(a: str, b: str) -> str:
    """numpy minimum: NaN-propagating (DuckDB least() skips NaN)."""
    return (f"(CASE WHEN isnan({a}) THEN {a} WHEN isnan({b}) THEN {b} "
            f"ELSE least({a}, {b}) END)")


def _sgn(x: str) -> str:
    """numpy sign as DOUBLE: NaN-propagating (DuckDB sign(NaN) = 0)."""
    return (f"(CASE WHEN isnan({x}) THEN ({x}) WHEN ({x}) > 0.0::DOUBLE "
            f"THEN 1.0::DOUBLE WHEN ({x}) < 0.0::DOUBLE THEN (-1.0)::DOUBLE "
            f"ELSE 0.0::DOUBLE END)")


def _b(cond: str) -> str:
    """bool -> float64 (numpy .astype(float64))."""
    return f"(CASE WHEN {cond} THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)"


# ---------------------------------------------------------------------------
# tokenization + OHLCV proxy (twin of engine/tokens.tokenize_documents_portable
# + data/corpus.tokens_to_ohlcv)
# ---------------------------------------------------------------------------

def bars_cte() -> str:
    """CTE chain producing one row per (doc_id, i) with the portable md5
    token (twin of ``engine/tokens.tokenize_documents_portable``) and the
    deterministic OHLCV ingredients (``data/corpus.tokens_to_ohlcv``).
    ``close`` itself needs the sequential cumsum and is carried in the
    recursive core CTE."""
    tok = f"('0x' || substr(md5(w), 1, 15))::BIGINT % {VOCAB}"
    return rf"""
words AS (
  SELECT doc_id::VARCHAR AS doc_id, source,
         CAST(unnest(range(len(regexp_split_to_array(trim(text), '\s+')))) AS INT) AS i,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents
),
bars AS (
  SELECT doc_id, source, i,
         CAST({tok} AS INT) AS token,
         CAST(({tok}) % 997 - 498 AS DOUBLE) / 100.0::DOUBLE AS step,
         CAST(({tok}) % 31 AS DOUBLE) / 10.0::DOUBLE AS hi_off,
         CAST((({tok}) // 31) % 29 AS DOUBLE) / 10.0::DOUBLE AS lo_off,
         (CAST(i AS DOUBLE) + 1.0::DOUBLE)
           + CAST((CAST({tok} AS BIGINT) * 2654435761) % 1000 AS DOUBLE) / 1001.0::DOUBLE AS avail
  FROM words
)"""


# ---------------------------------------------------------------------------
# the sequential core recurrence as a recursive CTE
# ---------------------------------------------------------------------------

def core_cte(name: str, bars: str, idx: str = "i",
             from_tokens: bool = True) -> str:
    """Recursive CTE running the fused C1-C8 recurrence
    (``kernel/reference_impl.core_loop``) plus the EWM velocity
    accumulator (``expander_batched._ewm_mean``) over each doc.

    ``from_tokens=True`` derives close/high/low from the token cumsum
    (``data/corpus.tokens_to_ohlcv``); otherwise ``bars`` must already
    carry high/low/close columns (the resampled grains).
    """
    p = ATR_PERIOD
    alpha, om_alpha = _d(ALPHA), _d(1.0 - ALPHA)
    base_p, off = _d(float(ATR_PERIOD)), _d(ADAPTIVE_OFFSET)

    # DuckDB resolves unqualified names to *real columns in scope* before
    # lateral aliases; in the recursive branch the CTE's own columns
    # (c.tr, c.atr, ...) are in scope, so computed aliases there must use
    # non-colliding n_-prefixed names.  UNION ALL matches positionally and
    # the CTE's column names come from the anchor, so the prefix never
    # leaks into the output.
    def branch(first: bool) -> str:
        n = "" if first else "n_"
        if from_tokens:
            if first:
                price = f"""
    b.step AS {n}csum,
    100.0::DOUBLE + b.step AS {n}close,
    (100.0::DOUBLE + b.step) + b.hi_off AS {n}high,
    (100.0::DOUBLE + b.step) - b.lo_off AS {n}low,"""
            else:
                price = f"""
    c.csum + b.step AS {n}csum,
    100.0::DOUBLE + (c.csum + b.step) AS {n}close,
    (100.0::DOUBLE + (c.csum + b.step)) + b.hi_off AS {n}high,
    (100.0::DOUBLE + (c.csum + b.step)) - b.lo_off AS {n}low,"""
            extra = "b.token, b.avail,"
        else:
            price = f"""
    0.0::DOUBLE AS {n}csum,
    b.close AS {n}close, b.high AS {n}high, b.low AS {n}low,"""
            extra = ""
        if first:
            tr = f"{n}high - {n}low AS {n}tr"
            tr_list = f"[{n}tr] AS {n}tr_list"
            tr_sum = f"{n}tr AS {n}tr_sum"
            prev = {"L0": "0.0::DOUBLE", "L1": "0.0::DOUBLE",
                    "L2": "0.0::DOUBLE", "L3": "0.0::DOUBLE"}
            minmax = (f"{n}atr AS {n}min_atr", f"{n}atr AS {n}max_atr")
            vel = f"0.0::DOUBLE AS {n}vel"       # ch1[0] = rsi - rsi = 0
        else:
            tr = f"greatest({n}high, c.close) - least({n}low, c.close) AS {n}tr"
            tr_list = f"(list_append(c.tr_list, {n}tr))[-{p}:] AS {n}tr_list"
            tr_sum = (f"CASE WHEN len(c.tr_list) = {p} "
                      f"THEN (c.tr_sum + {n}tr) - c.tr_list[1] "
                      f"ELSE c.tr_sum + {n}tr END AS {n}tr_sum")
            prev = {"L0": "c.L0", "L1": "c.L1", "L2": "c.L2", "L3": "c.L3"}
            minmax = (
                f"CASE WHEN {n}buf_len < 2 THEN {n}atr ELSE list_min("
                f"list_transform(range(1, {n}buf_len + 1), k -> "
                f"list_reduce((list_reverse({n}tr_list))[1:k], (a,b) -> a + b)"
                f" / CAST(k AS DOUBLE))) END AS {n}min_atr",
                f"CASE WHEN {n}buf_len < 2 THEN {n}atr ELSE list_max("
                f"list_transform(range(1, {n}buf_len + 1), k -> "
                f"list_reduce((list_reverse({n}tr_list))[1:k], (a,b) -> a + b)"
                f" / CAST(k AS DOUBLE))) END AS {n}max_atr")
            vel = (f"(({n}rsi - c.rsi) * {alpha}) + (c.vel * {om_alpha}) "
                   f"AS {n}vel")
        return f"""
  SELECT b.doc_id, b.source, b.{idx} AS {idx}, {extra}{price}
    {tr},
    {tr_list},
    {tr_sum},
    len({n}tr_list) AS {n}buf_len,
    {n}tr_sum / CAST({n}buf_len AS DOUBLE) AS {n}atr,
    {minmax[0]},
    {minmax[1]},
    CASE WHEN {n}max_atr > {n}atr THEN {n}max_atr ELSE {n}atr END AS {n}mx,
    CASE WHEN {n}min_atr < {n}atr THEN {n}min_atr ELSE {n}atr END AS {n}mn,
    CASE WHEN {n}mn = {n}mx THEN 0.5::DOUBLE
         ELSE 1.0::DOUBLE - ({n}atr - {n}mn) / ({n}mx - {n}mn) END AS {n}adaptive_coeff,
    {base_p} * ({n}adaptive_coeff + {off}) AS {n}period,
    1.0::DOUBLE - 10.0::DOUBLE / ({n}period + 9.0::DOUBLE) AS {n}gamma,
    {n}close + {n}gamma * ({prev['L0']} - {n}close) AS {n}L0,
    {prev['L0']} + {n}gamma * ({prev['L1']} - {n}L0) AS {n}L1,
    {prev['L1']} + {n}gamma * ({prev['L2']} - {n}L1) AS {n}L2,
    {prev['L2']} + {n}gamma * ({prev['L3']} - {n}L2) AS {n}L3,
    (CASE WHEN {n}L0 >= {n}L1 THEN {n}L0 - {n}L1 ELSE 0.0::DOUBLE END)
      + (CASE WHEN {n}L1 >= {n}L2 THEN {n}L1 - {n}L2 ELSE 0.0::DOUBLE END)
      + (CASE WHEN {n}L2 >= {n}L3 THEN {n}L2 - {n}L3 ELSE 0.0::DOUBLE END) AS {n}cu,
    (CASE WHEN {n}L0 >= {n}L1 THEN 0.0::DOUBLE ELSE {n}L1 - {n}L0 END)
      + (CASE WHEN {n}L1 >= {n}L2 THEN 0.0::DOUBLE ELSE {n}L2 - {n}L1 END)
      + (CASE WHEN {n}L2 >= {n}L3 THEN 0.0::DOUBLE ELSE {n}L3 - {n}L2 END) AS {n}cd,
    CASE WHEN {n}cu + {n}cd = 0.0::DOUBLE THEN 0.0::DOUBLE
         ELSE {n}cu / ({n}cu + {n}cd) END AS {n}rsi,
    {vel}"""

    return f"""
{name} AS ({branch(True)}
  FROM {bars} b WHERE b.{idx} = 0
  UNION ALL{branch(False)}
  FROM {name} c JOIN {bars} b
    ON b.doc_id = c.doc_id AND b.{idx} = c.{idx} + 1
)"""


CORE_OUT_COLS = ("rsi", "adaptive_coeff", "gamma", "L0", "L1", "L2", "L3",
                 "min_atr", "max_atr", "atr")


# ---------------------------------------------------------------------------
# 43-column expander as layered window SQL
# ---------------------------------------------------------------------------

def _revsum(lst: str) -> str:
    """Newest-to-oldest fold — the expander's ``_rolling_sum`` adds window
    offsets j=0,1,2,... (current bar first)."""
    return f"list_reduce(list_reverse({lst}), (a, b) -> a + b)"


def expander_ctes(core: str, pre: str, idx: str = "i") -> tuple[str, str]:
    """CTE chain computing the 43 expander columns
    (``kernel/expander_batched.expand_batched``, op order mirrored) over a
    core CTE; returns (sql_fragment, final_cte_name).  All layer-local
    helper columns are prefixed to avoid collisions when several grains
    are stitched together."""
    w = f"PARTITION BY doc_id ORDER BY {idx}"
    cum = f"{w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    f19 = f"{w} ROWS BETWEEN {SW - 1} PRECEDING AND CURRENT ROW"
    f99 = f"{w} ROWS BETWEEN 99 PRECEDING AND CURRENT ROW"
    up, down = _d(UP), _d(DOWN)
    eps = _d(1e-10)
    x1, x2, x3, x4 = (f"{pre}_x1", f"{pre}_x2", f"{pre}_x3", f"{pre}_x4")

    sql = f"""
{x1} AS (
  SELECT c.*,
    lag(rsi) OVER ({w}) AS q_prev_rsi,
    lag(rsi, 5) OVER ({w}) AS q_rsi5,
    first_value(rsi) OVER ({w}) AS q_first_rsi,
    list(rsi) OVER ({f19}) AS q_lrsi,
    min(rsi) OVER ({f19}) AS q_rmin,
    max(rsi) OVER ({f19}) AS q_rmax,
    lag(adaptive_coeff) OVER ({w}) AS q_prev_coeff,
    list(gamma) OVER ({f19}) AS q_lgam,
    lag(L0) OVER ({w}) AS q_prev_L0,
    lag(close) OVER ({w}) AS q_prev_close,
    lag(close, {SW}) OVER ({w}) AS q_close20,
    first_value(close) OVER ({w}) AS q_first_close,
    CAST(least({idx} + 1, {SW}) AS DOUBLE) AS q_n20,
    CAST(least({idx} + 1, 100) AS DOUBLE) AS q_n100,
    CASE WHEN rsi < {down} THEN 0.0::DOUBLE
         WHEN rsi > {up} THEN 2.0::DOUBLE ELSE 1.0::DOUBLE END AS regime,
    rsi < {down} AS q_is_os,
    rsi > {up} AS q_is_ob,
    CASE WHEN L0 > L1 AND NOT (L2 > L3) THEN 1.0::DOUBLE
         WHEN L0 > L1 AND L2 > L3 THEN 2.0::DOUBLE
         WHEN NOT (L0 > L1) AND L2 > L3 THEN 3.0::DOUBLE
         ELSE 0.0::DOUBLE END AS cycle_phase,
    rsi - {up} AS dist_overbought,
    rsi - {down} AS dist_oversold,
    rsi - 0.5::DOUBLE AS dist_midline,
    abs(rsi - {up}) AS abs_dist_overbought,
    abs(rsi - {down}) AS abs_dist_oversold,
    COALESCE(q_prev_rsi, rsi) AS q_prev,
    {_b(f"q_prev <= {down} AND rsi > {down}")} AS cross_above_oversold,
    {_b(f"q_prev >= {up} AND rsi < {up}")} AS cross_below_overbought,
    {_b("q_prev <= 0.5::DOUBLE AND rsi > 0.5::DOUBLE")} AS cross_above_midline,
    {_b("q_prev >= 0.5::DOUBLE AND rsi < 0.5::DOUBLE")} AS cross_below_midline,
    rsi - q_prev AS rsi_change_1,
    rsi - COALESCE(q_rsi5, q_first_rsi) AS rsi_change_5,
    {_revsum('q_lrsi')} / q_n20 AS q_rmean,
    CASE WHEN {idx} = 0 THEN 0.0::DOUBLE
         WHEN q_rmin = q_rmax THEN 0.0::DOUBLE
         ELSE sqrt(list_reduce(list_transform(list_reverse(q_lrsi),
                v -> (v - q_rmean) * (v - q_rmean)), (a, b) -> a + b)
              / greatest(q_n20 - 1.0::DOUBLE, 1.0::DOUBLE))
    END AS rsi_volatility_20,
    (CAST(len(list_filter(q_lrsi[1:len(q_lrsi) - 1], v -> v < rsi)) AS DOUBLE)
       / q_n20) * 100.0::DOUBLE AS rsi_percentile_20,
    (rsi - q_rmean) / (CASE WHEN rsi_volatility_20 = 0.0::DOUBLE
                            THEN 1.0::DOUBLE
                            ELSE rsi_volatility_20 END) AS rsi_zscore_20,
    q_rmax - q_rmin AS rsi_range_20,
    {_b(f"abs(rsi_change_1) > {_d(0.3)}")} AS rsi_shock_1bar,
    adaptive_coeff - COALESCE(q_prev_coeff, adaptive_coeff) AS adaptive_coeff_roc_1,
    gamma - {_revsum('q_lgam')} / q_n20 AS gamma_spread,
    (L0 - L3) / ((abs(L0) + abs(L3)) + {eps}) AS laguerre_spread,
    abs(L1 - L2) / ((abs(L0 - L1) + abs(L2 - L3)) + {eps}) AS laguerre_mid_convergence,
    L0 - COALESCE(q_prev_L0, L0) AS q_l0d,
    (max_atr - min_atr) / (max_atr + {eps}) AS atr_range_width,
    abs(close - COALESCE(q_prev_close, close)) AS q_abs_ch,
    abs(close - COALESCE(q_close20, q_first_close)) AS q_direction,
    CASE WHEN regime = 0.0::DOUBLE THEN greatest({down} - rsi, 0.0::DOUBLE)
         WHEN regime = 2.0::DOUBLE THEN greatest(rsi - {up}, 0.0::DOUBLE)
         ELSE 0.0::DOUBLE END AS regime_strength,
    {_b("regime = 0.0::DOUBLE")} AS regime_bearish,
    {_b("regime = 1.0::DOUBLE")} AS regime_neutral,
    {_b("regime = 2.0::DOUBLE")} AS regime_bullish
  FROM {core} c
),
{x2} AS (
  SELECT c.*,
    lag(regime) OVER ({w}) AS q_prev_regime,
    lag(cycle_phase) OVER ({w}) AS q_prev_phase,
    list(rsi_volatility_20) OVER ({f99}) AS q_lstd,
    list(q_abs_ch) OVER ({f19}) AS q_labs,
    list(q_l0d) OVER ({f19}) AS q_ll0d,
    min(q_l0d) OVER ({f19}) AS q_l0dmin,
    max(q_l0d) OVER ({f19}) AS q_l0dmax,
    sum(CASE WHEN NOT q_is_os THEN 1 ELSE 0 END) OVER ({cum}) AS q_cum_not_os,
    sum(CASE WHEN NOT q_is_ob THEN 1 ELSE 0 END) OVER ({cum}) AS q_cum_not_ob
  FROM {x1} c
),
{x3} AS (
  SELECT c.*,
    {_b("regime <> COALESCE(q_prev_regime, regime)")} AS regime_changed,
    {_b("cycle_phase <> COALESCE(q_prev_phase, cycle_phase)")} AS cycle_phase_changed,
    {_revsum('q_lstd')} / q_n100 AS q_vmean,
    CASE WHEN {idx} = 0 THEN 0.0::DOUBLE
         WHEN list_min(q_lstd) = list_max(q_lstd) THEN 0.0::DOUBLE
         ELSE sqrt(list_reduce(list_transform(list_reverse(q_lstd),
                v -> (v - q_vmean) * (v - q_vmean)), (a, b) -> a + b)
              / greatest(q_n100 - 1.0::DOUBLE, 1.0::DOUBLE))
    END AS q_vstd,
    CASE WHEN {idx} + 1 >= 20
              AND rsi_volatility_20 > ((q_vstd * 2.0::DOUBLE) + q_vmean)
         THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS rsi_volatility_spike,
    {_revsum('q_labs')} AS q_vol,
    least(greatest(q_direction / (CASE WHEN q_vol = 0.0::DOUBLE
                                       THEN 1.0::DOUBLE ELSE q_vol END),
                   0.0::DOUBLE), 1.0::DOUBLE) AS efficiency_ratio,
    {_b("efficiency_ratio > 0.5::DOUBLE")} AS efficiency_trend,
    {_revsum('q_ll0d')} / q_n20 AS q_l0dmean,
    CASE WHEN {idx} = 0 THEN 0.0::DOUBLE
         WHEN q_l0dmin = q_l0dmax THEN 0.0::DOUBLE
         ELSE sqrt(list_reduce(list_transform(list_reverse(q_ll0d),
                v -> (v - q_l0dmean) * (v - q_l0dmean)), (a, b) -> a + b)
              / greatest(q_n20 - 1.0::DOUBLE, 1.0::DOUBLE))
    END AS q_l0dstd,
    q_l0d / (CASE WHEN q_l0dstd = 0.0::DOUBLE THEN 1.0::DOUBLE
                  ELSE q_l0dstd END) AS laguerre_slope
  FROM {x2} c
),
{x4} AS (
  SELECT c.*,
    max(CASE WHEN regime_changed = 1.0::DOUBLE THEN {idx} ELSE 0 END)
        OVER ({cum}) AS q_lci,
    max(CASE WHEN q_is_os THEN q_cum_not_os ELSE 0 END) OVER ({cum}) AS q_reset_os,
    max(CASE WHEN q_is_ob THEN q_cum_not_ob ELSE 0 END) OVER ({cum}) AS q_reset_ob,
    (CAST({idx} AS DOUBLE) - CAST(q_lci AS DOUBLE)) + 1.0::DOUBLE AS bars_in_regime,
    CAST(q_cum_not_os - q_reset_os AS DOUBLE) AS bars_since_oversold,
    CAST(q_cum_not_ob - q_reset_ob AS DOUBLE) AS bars_since_overbought,
    least(bars_since_oversold, bars_since_overbought) AS bars_since_extreme,
    {_b("regime <> 1.0::DOUBLE AND bars_in_regime > 10.0::DOUBLE")} AS extreme_regime_persistence,
    least(greatest(((rsi_shock_1bar * {_d(0.4)})
                    + (extreme_regime_persistence * {_d(0.3)}))
                   + (rsi_volatility_spike * {_d(0.3)}),
                   0.0::DOUBLE), 1.0::DOUBLE) AS tail_risk_score
  FROM {x3} c
)"""
    return sql, x4


def oracle_features_43() -> str:
    """Twin of ``queries.q_features_43`` (quantized to 1e-6)."""
    exp, final = expander_ctes("core", "e", "i")
    outs = []
    for c in FEATURE_COLUMNS:
        src = {"gamma_value": "gamma", "rsi_velocity": "vel"}.get(c, c)
        outs.append(f"{_r6(src)} AS {c}")
    cols = ",\n       ".join(outs)
    return f"""
WITH RECURSIVE {bars_cte()},
{core_cte('core', 'bars')},{exp}
SELECT source, doc_id, i AS "offset", token,
       {cols}
FROM {final}
ORDER BY doc_id, "offset"
"""


def oracle_core_rsi() -> str:
    """Twin of ``queries.q_core_rsi_features`` (quantized to 1e-6)."""
    cols = ",\n       ".join(f"{_r6(c)} AS {c}" for c in CORE_OUT_COLS)
    return f"""
WITH RECURSIVE {bars_cte()},
{core_cte('core', 'bars')}
SELECT source, doc_id, i AS "offset", token,
       {cols}
FROM core
ORDER BY doc_id, "offset"
"""
