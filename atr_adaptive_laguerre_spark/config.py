"""Feature-engine configuration.

Mirrors the semantics of the reference config
(``/root/reference/src/atr_adaptive_laguerre/features/atr_adaptive_rsi.py:49-130``)
as a plain frozen dataclass (no pydantic dependency):

* ``atr_period``            — ATR lookback (reference default 32; the
  ``single_interval``/``multi_interval`` constructors default to 14,
  reference ``:130-162``).
* ``adaptive_offset``       — offset in ``period = atr_period * (coeff + offset)``
  (reference default 0.75).
* ``level_up``/``level_down`` — regime thresholds (0.85 / 0.15).
* ``multiplier_1``/``multiplier_2`` — higher-interval multipliers; both set
  => multi-interval (169/121 cols), both None => single-interval (43 cols).
* ``filter_redundancy``     — drop the fixed 48-name list (169 -> 121).
* ``smoothing_period``/``smoothing_method`` exist in the reference config but
  the pipeline feeds **raw close** into the filter (reference
  ``atr_adaptive_rsi.py:412-438``); they only affect lookback sizing. We keep
  them for lookback parity only.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class FeatureConfig:
    atr_period: int = 14
    smoothing_period: int = 5
    level_up: float = 0.85
    level_down: float = 0.15
    adaptive_offset: float = 0.75
    multiplier_1: int | None = None
    multiplier_2: int | None = None
    filter_redundancy: bool = True
    stats_window: int = 20
    velocity_span: int = 5
    #: multi-interval alignment mode: when True, higher-grain features are
    #: aligned by the strict point-in-time rule on a per-row availability
    #: timestamp (reference availability_column semantics) instead of the
    #: positional reindex+ffill of the reference's default path
    availability: bool = False

    def __post_init__(self) -> None:
        if self.atr_period < 1:
            raise ValueError(f"atr_period must be >= 1, got {self.atr_period}")
        if not (0.0 < self.level_down < self.level_up < 1.0):
            raise ValueError(
                f"need 0 < level_down ({self.level_down}) < level_up "
                f"({self.level_up}) < 1"
            )
        if self.adaptive_offset < 0.0:
            raise ValueError("adaptive_offset must be >= 0")
        if (self.multiplier_1 is None) != (self.multiplier_2 is None):
            raise ValueError(
                "multiplier_1 and multiplier_2 must both be set or both None"
            )
        if self.multiplier_1 is not None and self.multiplier_2 is not None:
            for name, m in (("multiplier_1", self.multiplier_1),
                            ("multiplier_2", self.multiplier_2)):
                if not isinstance(m, int) or m < 2:
                    raise ValueError(f"{name} must be an int >= 2, got {m!r}")
            if self.multiplier_1 >= self.multiplier_2:
                raise ValueError(
                    f"multiplier_1 ({self.multiplier_1}) must be < "
                    f"multiplier_2 ({self.multiplier_2})"
                )
        if self.stats_window < 1 or self.velocity_span < 1:
            raise ValueError("stats_window and velocity_span must be >= 1")

    # -- convenience constructors matching the reference's named configs --

    @classmethod
    def single_interval(cls, atr_period: int = 14, **kw) -> "FeatureConfig":
        return cls(atr_period=atr_period,
                   multiplier_1=None, multiplier_2=None, **kw)

    @classmethod
    def multi_interval(cls, multiplier_1: int = 4, multiplier_2: int = 12,
                       atr_period: int = 14, filter_redundancy: bool = True,
                       **kw) -> "FeatureConfig":
        return cls(atr_period=atr_period, multiplier_1=multiplier_1,
                   multiplier_2=multiplier_2,
                   filter_redundancy=filter_redundancy, **kw)

    @property
    def is_multi_interval(self) -> bool:
        return self.multiplier_1 is not None

    @property
    def base_lookback(self) -> int:
        """Minimum rows for a stable single-interval run.

        Reference: ``atr_adaptive_rsi.py:341-345,477-481`` —
        ``max(atr_period, smoothing_period, 20) + 10``.  The reference
        hardcodes the 20 (its stats window is not configurable); this
        engine additionally folds in ``stats_window`` so a LARGER
        configured window still gets a full warm-up — identical to the
        reference whenever stats_window <= 20 (including the default).
        """
        return max(self.atr_period, self.smoothing_period,
                   self.stats_window, 20) + 10

    @property
    def min_lookback(self) -> int:
        if self.is_multi_interval:
            return self.base_lookback * max(self.multiplier_1, self.multiplier_2)
        return self.base_lookback

    @property
    def n_features(self) -> int:
        if not self.is_multi_interval:
            return 43
        return 121 if self.filter_redundancy else 169

    def with_(self, **kw) -> "FeatureConfig":
        return replace(self, **kw)
