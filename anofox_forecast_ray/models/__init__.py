"""Forecaster interface + registry.

Python equivalent of the reference's object-safe ``Forecaster`` trait and
``ModelSpec``/``ModelRegistry`` factory (src/models/traits.rs:10-264):
``fit(y) -> self``, ``predict(h) -> np.ndarray``,
``predict_with_intervals(h, level) -> (point, lo, hi)``,
``fitted_values() / residuals() / name()``. Models are registered by name
and instantiated per series inside actor-pool stages (state lives only for
the duration of one group fit — SURVEY.md §3.3).
"""

from __future__ import annotations

import math

from abc import ABC, abstractmethod

import numpy as np

from ..kernels import baseline as _b
from ..kernels import intermittent as _i
from ..kernels import smoothing as _s
from ..kernels import theta as _t


class Forecaster(ABC):
    """fit/predict interface; implementations wrap pure NumPy kernels."""

    @abstractmethod
    def fit(self, y: np.ndarray) -> "Forecaster": ...

    @abstractmethod
    def predict(self, horizon: int) -> np.ndarray: ...

    def predict_with_intervals(self, horizon: int, level: float = 0.95):
        p = self.predict(horizon)
        return p, np.full_like(p, np.nan), np.full_like(p, np.nan)

    def fitted_values(self):
        return getattr(self.state, "fitted", None)

    def fitted_values_with_intervals(self, level: float = 0.95):
        """(fitted, lower, upper) with constant-sigma bands — the
        reference trait's default behavior (e.g. ses.rs:246-266)."""
        from ..kernels.stats import quantile_normal

        fitted = self.fitted_values()
        if fitted is None:
            return None
        fitted = np.asarray(fitted, dtype=np.float64)
        var = getattr(self.state, "variance", 0.0) or 0.0
        if var <= 0.0:
            return fitted, fitted.copy(), fitted.copy()
        z = quantile_normal((1.0 + level) / 2.0)
        sigma = float(np.sqrt(var))
        return fitted, fitted - z * sigma, fitted + z * sigma

    def residuals(self):
        return getattr(self.state, "residuals", None)

    @abstractmethod
    def name(self) -> str: ...

    # --- exogenous regressors (src/models/traits.rs:63-137; the flow of
    # naive.rs:92-240: OLS on the regressors, base model on the adjusted
    # series, X_future @ beta added back at prediction) ----------------

    SUPPORTS_EXOG = False
    _exog_ols = None

    def supports_exog(self) -> bool:
        return self.SUPPORTS_EXOG

    def has_exog(self) -> bool:
        return self._exog_ols is not None

    def exog_names(self):
        return list(self._exog_ols.regressor_names) if self._exog_ols else None

    def fit_with_exog(self, y, regressors: dict) -> "Forecaster":
        """Fit with exogenous regressors: y is OLS-adjusted by the
        regressor contribution before the model fit."""
        if not self.supports_exog():
            raise ValueError(f"{self.name()} does not support exogenous "
                             "regressors; use ExogAdjusted")
        from ..kernels.ols import ols_fit, ols_residuals

        y = np.asarray(y, dtype=np.float64)
        for name, vals in regressors.items():
            if len(vals) != y.size:
                raise ValueError(
                    f"regressor {name!r} length {len(vals)} != {y.size}"
                )
        ols = ols_fit(y, regressors)
        adjusted = ols_residuals(y, ols, regressors)
        self.fit(adjusted)
        self._exog_ols = ols
        return self

    def _exog_contribution(self, horizon: int, future_regressors):
        from ..kernels.ols import ols_predict

        if future_regressors is None:
            raise ValueError(
                "model was fit with exogenous regressors; future regressor "
                "values are required (naive.rs:44-50)"
            )
        for name in self._exog_ols.regressor_names:
            if name not in future_regressors:
                raise ValueError(f"missing future values for regressor "
                                 f"{name!r}")
            if len(future_regressors[name]) != horizon:
                raise ValueError(
                    f"regressor {name!r}: expected {horizon} future values, "
                    f"got {len(future_regressors[name])}"
                )
        return ols_predict(self._exog_ols, future_regressors)

    def predict_with_exog(self, horizon: int, future_regressors=None):
        if not self.has_exog():
            if future_regressors:
                raise ValueError("model was not fit with exogenous "
                                 "regressors")
            return self.predict(horizon)
        contrib = self._exog_contribution(horizon, future_regressors)
        return np.asarray(self.predict(horizon), dtype=np.float64) + contrib

    def predict_with_exog_intervals(self, horizon: int,
                                    future_regressors=None,
                                    level: float = 0.95):
        if not self.has_exog():
            if future_regressors:
                raise ValueError("model was not fit with exogenous "
                                 "regressors")
            return self.predict_with_intervals(horizon, level)
        contrib = self._exog_contribution(horizon, future_regressors)
        p, lo, hi = self.predict_with_intervals(horizon, level)
        return (np.asarray(p, float) + contrib,
                np.asarray(lo, float) + contrib,
                np.asarray(hi, float) + contrib)


class _SimpleWrapper(Forecaster):
    def __init__(self, fit_fn, model_name, **kw):
        self._fit_fn = fit_fn
        self._name = model_name
        self._kw = kw
        self.state = None

    def fit(self, y):
        self.state = self._fit_fn(np.asarray(y, dtype=np.float64), **self._kw)
        return self

    def predict(self, horizon):
        return self.state.forecast_fn(horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _b.simple_intervals(self.state, horizon, level)

    def name(self):
        return self._name


class Naive(_SimpleWrapper):
    SUPPORTS_EXOG = True  # reference threads exog through this model

    def __init__(self):
        super().__init__(_b.naive_fit, "Naive")


class SeasonalNaive(_SimpleWrapper):
    def __init__(self, period: int = 12):
        super().__init__(_b.seasonal_naive_fit, "SeasonalNaive", period=period)


class RandomWalkWithDrift(_SimpleWrapper):
    def __init__(self):
        super().__init__(_b.rwd_fit, "RandomWalkWithDrift")


class SimpleMovingAverage(_SimpleWrapper):
    def __init__(self, window: int = 5):
        super().__init__(_b.sma_fit, "SimpleMovingAverage", window=window)


class HistoricAverage(_SimpleWrapper):
    def __init__(self):
        super().__init__(_b.historic_average_fit, "HistoricAverage")


class WindowAverage(_SimpleWrapper):
    def __init__(self, window: int = 5):
        super().__init__(_b.window_average_fit, "WindowAverage", window=window)


class SeasonalWindowAverage(_SimpleWrapper):
    def __init__(self, period: int = 12, window: int = 2):
        super().__init__(
            _b.seasonal_window_average_fit, "SeasonalWindowAverage",
            period=period, window=window,
        )


class SES(Forecaster):
    def __init__(self, alpha: float | None = None):
        self.alpha = alpha
        self.state = None

    def fit(self, y):
        self.state = _s.ses_fit(y, self.alpha)
        return self

    def predict(self, horizon):
        return _s.ses_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _s.ses_intervals(self.state, horizon, level)

    def name(self):
        return "SES"


class ETS(Forecaster):
    def __init__(self, spec: str = "ANN", period: int = 12, optimize: bool = True,
                 alpha=None, beta=None, gamma=None, phi=None):
        self.spec, self.period, self.optimize = spec, period, optimize
        self.params = dict(alpha=alpha, beta=beta, gamma=gamma, phi=phi)
        self.state = None

    def fit(self, y):
        self.state = _s.ets_fit(
            y, self.spec, self.period, optimize=self.optimize, **self.params
        )
        return self

    def predict(self, horizon):
        return _s.ets_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _s.ets_intervals(self.state, horizon, level)

    def name(self):
        return self.state.spec.short_name() if self.state else f"ETS({self.spec})"


class AutoETS(Forecaster):
    """Grid over the reference's candidate space (errors x trends x
    seasonals minus the unstable M-*-A combos), pick best criterion
    (src/models/exponential/auto_ets.rs:90-300; candidate generation
    :143-190)."""

    def __init__(self, period: int = 12, criterion: str = "aicc",
                 additive_only: bool = False,
                 allow_multiplicative_error: bool = True,
                 allow_multiplicative_seasonal: bool = True,
                 allow_damped: bool = True):
        self.period = period
        self.criterion = criterion
        self.additive_only = additive_only
        self.allow_me = allow_multiplicative_error and not additive_only
        self.allow_ms = allow_multiplicative_seasonal and not additive_only
        self.allow_damped = allow_damped
        self.state = None

    def _candidates(self, y):
        has_seasonal = self.period >= 2 and y.size >= 2 * self.period
        positive = bool((y > 0).all())
        errors = ["A"] + (["M"] if self.allow_me and positive else [])
        trends = ["N", "A"] + (["Ad"] if self.allow_damped else [])
        if not has_seasonal:
            seasonals = ["N"]
        elif self.allow_ms and positive:
            seasonals = ["N", "A", "M"]
        else:
            seasonals = ["N", "A"]
        out = []
        for e in errors:
            for t in trends:
                for se in seasonals:
                    if e == "M" and t in ("A", "Ad") and se == "A":
                        continue  # unstable M,A,A / M,Ad,A (reference skip)
                    out.append(e + t + se)
        return out

    def fit(self, y):
        y = np.asarray(y, dtype=np.float64)
        best = None
        for spec in self._candidates(y):
            try:
                st = _s.ets_fit(y, spec, self.period)
            except Exception:
                continue
            crit = getattr(st, self.criterion)
            if best is None or (crit == crit and crit < getattr(best, self.criterion)):
                best = st
        if best is None:
            raise ValueError("no ETS candidate could be fit")
        self.state = best
        return self

    def predict(self, horizon):
        return _s.ets_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _s.ets_intervals(self.state, horizon, level)

    def name(self):
        return "AutoETS"


class Theta(Forecaster):
    def __init__(self, period: int = 0, theta: float = 2.0,
                 alpha: float | None = 0.1):
        self.period, self.theta_param, self.alpha = period, theta, alpha
        self.state = None

    def fit(self, y):
        self.state = _t.theta_fit(
            y, period=self.period, theta=self.theta_param, alpha=self.alpha
        )
        return self

    def predict(self, horizon):
        return _t.theta_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _t.theta_intervals(self.state, horizon, level)

    def name(self):
        return "Theta"


class OptimizedTheta(Theta):
    def __init__(self, period: int = 0, theta: float = 2.0):
        super().__init__(period=period, theta=theta, alpha=None)

    def name(self):
        return "OptimizedTheta"


class Croston(Forecaster):
    def __init__(self, variant: str = "classic", alpha: float = 0.1):
        self.variant, self.alpha = variant, alpha
        self.state = None

    def fit(self, y):
        self.state = _i.croston_fit(y, self.variant, self.alpha)
        return self

    def predict(self, horizon):
        return _i.croston_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return _i.croston_intervals(self.state, horizon, level)

    def name(self):
        return {"classic": "Croston", "sba": "CrostonSBA",
                "sba_opt": "CrostonSBAOpt"}[self.variant]


class TSB(Forecaster):
    def __init__(self, alpha_d: float = 0.1, alpha_p: float = 0.1):
        self.alpha_d, self.alpha_p = alpha_d, alpha_p
        self.state = None

    def fit(self, y):
        self.state = _i.tsb_fit(y, self.alpha_d, self.alpha_p)
        return self

    def predict(self, horizon):
        return _i.tsb_predict(self.state, horizon)

    def name(self):
        return "TSB"


class ADIDA(Forecaster):
    def __init__(self, alpha: float | None = None):
        self.alpha = alpha
        self.state = None

    def fit(self, y):
        self.state = _i.adida_fit(y, alpha=self.alpha)
        return self

    def predict(self, horizon):
        return _i.adida_predict(self.state, horizon)

    def name(self):
        return "ADIDA"


class ARIMA(Forecaster):
    SUPPORTS_EXOG = True  # reference threads exog through this model

    """ARIMA(p,d,q) via conditional sum of squares
    (src/models/arima/model.rs:125-470)."""

    def __init__(self, p: int = 1, d: int = 1, q: int = 1):
        self.p, self.d, self.q = p, d, q
        self.state = None

    def fit(self, y):
        from ..kernels.arima import arima_fit

        self.state = arima_fit(y, self.p, self.d, self.q)
        return self

    def predict(self, horizon):
        from ..kernels.arima import arima_predict

        return arima_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        from ..kernels.arima import arima_intervals

        return arima_intervals(self.state, horizon, level)

    def residuals(self):
        return self.state.residuals

    def name(self):
        return f"ARIMA({self.p},{self.d},{self.q})"


class ARIMAML(Forecaster):
    """ARIMA(p,d,q) via EXACT maximum likelihood (Harvey state-space
    Kalman filter, concentrated Gaussian likelihood). Depth extension
    beyond the reference — src/models/arima/model.rs is CSS-only; this
    is the estimator users coming from statsmodels/R expect on
    short or MA-heavy series."""

    def __init__(self, p: int = 1, d: int = 1, q: int = 1):
        self.p, self.d, self.q = p, d, q
        self.state = None

    def fit(self, y):
        from ..kernels.arima import arima_fit_ml

        self.state = arima_fit_ml(y, self.p, self.d, self.q)
        return self

    def predict(self, horizon):
        from ..kernels.arima import arima_predict, arima_predict_ml

        if self.state.method == "ml":
            return arima_predict_ml(self.state, horizon)
        return arima_predict(self.state, horizon)  # CSS fallback state

    def predict_with_intervals(self, horizon, level=0.95):
        from ..kernels.arima import psi_weights
        from ..kernels.stats import quantile_normal
        import numpy as np

        point = self.predict(horizon)
        psis = psi_weights(self.state.ar, self.state.ma, self.state.d,
                           horizon)
        se = np.sqrt(self.state.variance * np.cumsum(psis * psis))
        z = quantile_normal((1.0 + level) / 2.0)
        return point, point - z * se, point + z * se

    def residuals(self):
        return self.state.residuals

    def name(self):
        return f"ARIMA-ML({self.p},{self.d},{self.q})"


class SARIMA(Forecaster):
    SUPPORTS_EXOG = True  # reference threads exog through this model

    """Seasonal ARIMA(p,d,q)(P,D,Q)[s], multiplicative formulation
    (src/models/arima/model.rs:691-1360)."""

    def __init__(self, p=1, d=0, q=1, P=1, D=0, Q=1, s=12):
        self.orders = (p, d, q, P, D, Q, s)
        self.state = None

    def fit(self, y):
        from ..kernels.arima import sarima_fit

        self.state = sarima_fit(y, *self.orders)
        return self

    def predict(self, horizon):
        from ..kernels.arima import sarima_predict

        return sarima_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        from ..kernels.arima import sarima_intervals

        return sarima_intervals(self.state, horizon, level)

    def residuals(self):
        return self.state.residuals

    def name(self):
        p, d, q, P, D, Q, s = self.orders
        return f"SARIMA({p},{d},{q})({P},{D},{Q})[{s}]"


class AutoARIMA(Forecaster):
    SUPPORTS_EXOG = True  # reference threads exog through this model

    """Grid order search with KPSS d-selection, min-AIC
    (src/models/arima/auto_arima.rs:131-600). The reference's rayon
    par_iter over candidates maps to per-series actor parallelism here."""

    def __init__(self, max_p: int = 3, max_q: int = 3, max_d: int = 2,
                 stepwise: bool = False):
        self.max_p, self.max_q, self.max_d = max_p, max_q, max_d
        self.stepwise = stepwise
        self.state = None

    def fit(self, y):
        from ..kernels.arima import auto_arima_fit

        self.state = auto_arima_fit(
            y, self.max_p, self.max_q, self.max_d, stepwise=self.stepwise
        )
        return self

    def predict(self, horizon):
        from ..kernels.arima import arima_predict

        return arima_predict(self.state, horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        from ..kernels.arima import arima_intervals

        return arima_intervals(self.state, horizon, level)

    def name(self):
        return "AutoARIMA"

    @property
    def selected_order(self):
        return (self.state.p, self.state.d, self.state.q) if self.state else None


class GARCH(Forecaster):
    """GARCH(1,1) volatility (src/models/garch.rs:48-600): flat mean
    forecast; volatility path/forecast via ``volatility_forecast``."""

    def __init__(self):
        self.state = None

    def fit(self, y):
        from ..kernels.garch import garch_fit

        self.state = garch_fit(y)
        return self

    def predict(self, horizon):
        from ..kernels.garch import garch_predict

        return garch_predict(self.state, horizon)

    def volatility_forecast(self, horizon):
        from ..kernels.garch import garch_forecast_variance

        return np.sqrt(garch_forecast_variance(self.state, horizon))

    def name(self):
        return "GARCH"


class DynamicTheta(Forecaster):
    """DSTM — per-step updated An/Bn coefficients
    (src/models/theta/dynamic.rs:25-700)."""

    def __init__(self, alpha: float = 0.1, theta: float = 2.0,
                 period: int = 0, optimize: bool = False):
        self.alpha, self.theta_param = alpha, theta
        self.period, self.optimize = period, optimize
        self.state = None

    def fit(self, y):
        from ..kernels.theta_dynamic import dynamic_theta_fit

        self.state = dynamic_theta_fit(
            y, alpha=self.alpha, theta=self.theta_param,
            period=self.period, optimize=self.optimize,
        )
        return self

    def predict(self, horizon):
        from ..kernels.theta_dynamic import dynamic_theta_predict

        return dynamic_theta_predict(self.state, horizon)

    def name(self):
        return "DynamicOptimizedTheta" if self.optimize else "DynamicTheta"


class DynamicOptimizedTheta(DynamicTheta):
    """DOTM — jointly optimized (alpha, theta)
    (src/models/theta/dynamic.rs:531-560)."""

    def __init__(self, period: int = 0):
        super().__init__(period=period, optimize=True)


class MFLES(Forecaster):
    SUPPORTS_EXOG = True  # reference threads exog through this model

    """Boosted Median+Fourier+Linear+SES decomposition (core algorithm of
    src/models/mfles.rs:29-900) with Siegel repeated-medians robust mode
    (explicit or CoV-auto-detected) and the R^2 trend penalty."""

    def __init__(self, season_length: int = 12, max_rounds: int = 20,
                 multiplicative: bool | None = None,
                 robust: bool | None = None, trend_penalty: bool = True):
        self.season_length = season_length
        self.max_rounds = max_rounds
        self.multiplicative = multiplicative
        self.robust = robust
        self.trend_penalty = trend_penalty
        self.state = None

    def fit(self, y):
        from ..kernels.mfles import mfles_fit

        self.state = mfles_fit(
            y, self.season_length, self.max_rounds,
            multiplicative=self.multiplicative,
            robust=self.robust, trend_penalty=self.trend_penalty,
        )
        return self

    def predict(self, horizon):
        from ..kernels.mfles import mfles_predict

        return mfles_predict(self.state, horizon)

    def name(self):
        return "MFLES"


class TBATS(Forecaster):
    """TBATS core: Box-Cox + (damped) trend + trigonometric seasonal
    states + optional fitted ARMA(p,q) errors, AIC on the state
    (src/models/tbats/model.rs:41-780 — see kernels/tbats.py)."""

    def __init__(self, periods=(12,), use_trend: bool = True,
                 damped: bool = False, use_box_cox: bool | None = None,
                 fourier_k=None, box_cox_lambda: float | None = None,
                 arma_p: int = 0, arma_q: int = 0):
        self.kw = dict(periods=periods, use_trend=use_trend, damped=damped,
                       use_box_cox=use_box_cox, fourier_k=fourier_k,
                       box_cox_lambda=box_cox_lambda, arma_p=arma_p,
                       arma_q=arma_q)
        self.state = None

    def fit(self, y):
        from ..kernels.tbats import tbats_fit

        self.state = tbats_fit(y, **self.kw)
        return self

    def predict(self, horizon):
        from ..kernels.tbats import tbats_predict

        return tbats_predict(self.state, horizon)

    def name(self):
        return "TBATS"


class AutoTBATS(Forecaster):
    """AIC-minimizing sweep over trend / damped-phi / Box-Cox-lambda /
    Fourier-K configurations (src/models/tbats/auto.rs:36-230) with a
    full harmonics-by-AIC K sweep and optional fitted ARMA errors."""

    def __init__(self, periods=(12,), try_box_cox: bool = True,
                 try_no_trend: bool = True, try_damped: bool = True,
                 k_sweep: bool = True, try_arma: bool = False):
        self.kw = dict(periods=periods, try_box_cox=try_box_cox,
                       try_no_trend=try_no_trend, try_damped=try_damped,
                       k_sweep=k_sweep, try_arma=try_arma)
        self.state = None

    def fit(self, y):
        from ..kernels.tbats import auto_tbats_fit

        self.state = auto_tbats_fit(np.asarray(y, dtype=np.float64),
                                    **self.kw)
        return self

    def predict(self, horizon):
        from ..kernels.tbats import tbats_predict

        return tbats_predict(self.state, horizon)

    def name(self):
        return "AutoTBATS"


class AutoTheta(Forecaster):
    """Selects among STM / OTM / DSTM / DOTM by in-sample MSE of fitted
    values (src/models/theta/auto.rs:72-250)."""

    def __init__(self, period: int = 0):
        self.period = period
        self.state = None
        self._best = None

    def fit(self, y):
        y = np.asarray(y, dtype=np.float64)
        best, best_mse = None, np.inf
        for cand in (Theta(period=self.period),
                     OptimizedTheta(period=self.period),
                     DynamicTheta(period=self.period),
                     DynamicOptimizedTheta(period=self.period)):
            try:
                cand.fit(y)
            except Exception:
                continue
            fitted = cand.fitted_values()
            ok = np.isfinite(fitted)
            mse = float(np.mean((y[ok] - fitted[ok]) ** 2)) if ok.any() else np.inf
            if mse < best_mse:
                best, best_mse = cand, mse
        if best is None:
            raise ValueError("no theta variant could be fit")
        self._best = best
        self.state = best.state
        return self

    def predict(self, horizon):
        return self._best.predict(horizon)

    def predict_with_intervals(self, horizon, level=0.95):
        return self._best.predict_with_intervals(horizon, level)

    def name(self):
        return "AutoTheta"


class ExogAdjusted(Forecaster):
    """Exogenous-regressor adjustment wrapper: OLS on the regressors, fit
    the base model on the adjusted series, add X_future @ beta back at
    prediction (the reference's exog flow, naive.rs:92-240 / ols.rs:94)."""

    def __init__(self, base: Forecaster, regressors: dict, future_regressors: dict):
        self.base = base
        self.regressors = regressors
        self.future_regressors = future_regressors
        self.state = None

    def fit(self, y):
        from ..kernels.ols import ols_fit, ols_residuals

        y = np.asarray(y, dtype=np.float64)
        self.ols = ols_fit(y, self.regressors)
        adjusted = ols_residuals(y, self.ols, self.regressors)
        self.base.fit(adjusted)
        self.state = True
        return self

    def predict(self, horizon):
        from ..kernels.ols import ols_predict

        base_pred = np.asarray(self.base.predict(horizon), dtype=np.float64)
        contrib = ols_predict(
            self.ols,
            {n: np.asarray(v)[:horizon] for n, v in self.future_regressors.items()},
        )
        return base_pred + contrib

    def name(self):
        return f"ExogAdjusted({self.base.name()})"


class Ensemble(Forecaster):
    """Mean/median combination of member forecasts
    (src/models/ensemble/model.rs:24-200)."""

    def __init__(self, members, method: str = "mean", weights=None):
        self.members = members
        self.method = method
        self.weights = weights
        self.state = None

    def fit(self, y):
        for m in self.members:
            m.fit(y)
        self.state = True
        return self

    def predict(self, horizon):
        preds = np.stack([m.predict(horizon) for m in self.members])
        if self.method == "median":
            return np.median(preds, axis=0)
        if self.method == "weighted":
            w = np.asarray(self.weights, dtype=np.float64)
            return (preds * w[:, None]).sum(axis=0) / w.sum()
        return preds.mean(axis=0)

    def name(self):
        return "Ensemble"


class _HoltState:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class Holt(Forecaster):
    """Standalone Holt linear trend (src/models/exponential/holt.rs:23-360
    — NOT the ETS(A,A,N) arm): l0 = y0, b0 = y1 - y0; SSE-optimized
    (alpha, beta[, phi]) via Nelder-Mead from (0.3, 0.1[, 0.98]); interval
    factor c(h) = 1 + sum_{j=1..h-1} (alpha + alpha*beta*S_phi(j))^2 with
    S_phi the damped sum (holt.rs:319-358)."""

    def __init__(self, damped: bool = False, alpha: float | None = None,
                 beta: float | None = None, phi: float | None = None):
        self.damped = damped
        self.alpha, self.beta = alpha, beta
        self.phi = phi if (phi is not None or not damped) else 0.98
        self.state = None

    @staticmethod
    def _damped_sum(phi: float, h: int) -> float:
        if abs(phi - 1.0) < 1e-10:
            return float(h)
        return phi * (1.0 - phi**h) / (1.0 - phi)

    @staticmethod
    def _sse(y: list, alpha: float, beta: float, phi: float) -> float:
        level, trend = y[0], y[1] - y[0]
        sse = 0.0
        for yt in y[1:]:
            f = level + phi * trend
            e = yt - f
            sse += e * e
            lp = level
            level = alpha * yt + (1.0 - alpha) * (lp + phi * trend)
            trend = beta * (level - lp) + (1.0 - beta) * phi * trend
        return sse

    def fit(self, y):
        from ..kernels.optimization import NelderMeadConfig, nelder_mead

        y = np.asarray(y, dtype=np.float64)
        if y.size < 2:
            raise ValueError("need >= 2 points")
        yl = y.tolist()
        a, b, ph = self.alpha, self.beta, self.phi
        if a is None or b is None:
            cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
            if self.damped:
                res = nelder_mead(
                    lambda p: self._sse(yl, p[0], p[1], p[2]),
                    [0.3, 0.1, 0.98],
                    [(0.0001, 0.9999), (0.0001, 0.9999), (0.8, 1.0)], cfg,
                )
                a = float(np.clip(res.optimal_point[0], 0.0001, 0.9999))
                b = float(np.clip(res.optimal_point[1], 0.0001, 0.9999))
                ph = float(np.clip(res.optimal_point[2], 0.8, 1.0))
            else:
                res = nelder_mead(
                    lambda p: self._sse(yl, p[0], p[1], 1.0),
                    [0.3, 0.1],
                    [(0.0001, 0.9999), (0.0001, 0.9999)], cfg,
                )
                a = float(np.clip(res.optimal_point[0], 0.0001, 0.9999))
                b = float(np.clip(res.optimal_point[1], 0.0001, 0.9999))
                ph = 1.0
        ph = 1.0 if ph is None else ph
        level, trend = yl[0], yl[1] - yl[0]
        n = y.size
        fitted = np.empty(n)
        residuals = np.empty(n)
        fitted[0] = level
        residuals[0] = 0.0
        for t in range(1, n):
            yt = yl[t]
            f = level + ph * trend
            fitted[t] = f
            residuals[t] = yt - f
            lp = level
            level = a * yt + (1.0 - a) * (lp + ph * trend)
            trend = b * (level - lp) + (1.0 - b) * ph * trend
        valid = residuals[1:]
        variance = float(np.dot(valid, valid) / valid.size) if valid.size else 0.0
        self.state = _HoltState(
            alpha=a, beta=b, phi=ph, level=level, trend=trend,
            fitted=fitted, residuals=residuals, variance=variance, n=n,
        )
        return self

    def predict(self, horizon):
        st = self.state
        return np.array(
            [st.level + self._damped_sum(st.phi, h) * st.trend
             for h in range(1, horizon + 1)]
        )

    def predict_with_intervals(self, horizon, level=0.95):
        from ..kernels.stats import quantile_normal

        st = self.state
        z = quantile_normal((1.0 + level) / 2.0)
        point = self.predict(horizon)
        lo = np.empty(horizon)
        hi = np.empty(horizon)
        for i, h in enumerate(range(1, horizon + 1)):
            if h == 1:
                c = 1.0
            else:
                c = 1.0
                for j in range(1, h):
                    term = st.alpha + st.alpha * st.beta * self._damped_sum(
                        st.phi, j
                    )
                    c += term * term
            se = math.sqrt(st.variance * c) if st.variance > 0 else 0.0
            lo[i] = point[i] - z * se
            hi[i] = point[i] + z * se
        return point, lo, hi

    def name(self):
        return "Holt"


class HoltWinters(ETS):
    """Triple smoothing = ETS(A,A,A) / ETS(A,A,M)
    (src/models/exponential/holt_winters.rs:36-400)."""

    def __init__(self, period: int = 12, seasonal: str = "add", **kw):
        spec = "AAA" if seasonal == "add" else "AAM"
        super().__init__(spec=spec, period=period, **kw)

    def name(self):
        return "HoltWinters"


class SeasonalES(Forecaster):
    """Independent SES per seasonal slot
    (src/models/exponential/seasonal_es.rs:51-300)."""

    def __init__(self, period: int = 12, alpha: float | None = 0.1):
        self.period = period
        self.alpha = alpha
        self.state = None

    def fit(self, y):
        y = np.asarray(y, dtype=np.float64)
        m = self.period
        if y.size < m:
            raise ValueError(f"need >= {m} points")
        levels = np.empty(m)
        for s in range(m):
            sub = y[s::m]
            levels[s] = _s.ses_fit(sub, self.alpha).level
        self.state = (levels, y.size)
        return self

    def predict(self, horizon):
        levels, n = self.state
        m = self.period
        idx = (n + np.arange(horizon)) % m
        return levels[idx]

    def name(self):
        return "SeasonalES"


class IMAPA(Forecaster):
    """Multiple-aggregation ADIDA averaged across levels
    (src/models/intermittent/imapa.rs:38-300)."""

    def __init__(self, max_levels: int = 3, alpha: float | None = None):
        self.max_levels = max_levels
        self.alpha = alpha
        self.state = None

    def fit(self, y):
        y = np.asarray(y, dtype=np.float64)
        _, intervals = _i.demands_intervals(y)
        if intervals.size == 0:
            raise ValueError("need demand occurrences")
        mean_int = max(1, int(round(float(intervals.mean()))))
        levels = sorted(set(
            min(max(1, lv), max(1, y.size // 2))
            for lv in range(1, min(self.max_levels, mean_int) + 1)
        ))
        points = []
        for bucket in levels:
            nb = y.size // bucket
            if nb < 2:
                continue
            sums = y[y.size - nb * bucket :].reshape(nb, bucket).sum(axis=1)
            st = _s.ses_fit(sums, alpha=self.alpha)
            points.append(st.level / bucket)
        if not points:
            raise ValueError("no aggregation level fit")
        self.state = float(np.mean(points))
        return self

    def predict(self, horizon):
        return np.full(horizon, self.state)

    def name(self):
        return "IMAPA"


class MSTLForecaster(Forecaster):
    """MSTL decompose -> SES on the seasonally-adjusted series + seasonal
    naive per seasonal component (src/models/mstl_forecaster.rs:68-300)."""

    def __init__(self, periods=(12,), trend_model: str = "ses"):
        self.periods = list(periods)
        self.trend_model = trend_model
        self.state = None

    def fit(self, y):
        from ..kernels.stl import mstl_decompose

        y = np.asarray(y, dtype=np.float64)
        dec = mstl_decompose(y, self.periods)
        if dec is None:
            raise ValueError("series too short for any period")
        trend, seasonals, remainder = dec
        adjusted = y - sum(seasonals.values())
        inner = make_model(self.trend_model)
        inner.fit(adjusted)
        self.state = (inner, seasonals, y.size)
        return self

    def predict(self, horizon):
        inner, seasonals, n = self.state
        base = np.asarray(inner.predict(horizon), dtype=np.float64)
        for p, comp in seasonals.items():
            last_cycle = comp[n - p :]
            base = base + last_cycle[np.arange(horizon) % p]
        return base

    def name(self):
        return "MSTLForecaster"


REGISTRY: dict[str, object] = {
    "naive": Naive,
    "seasonal_naive": SeasonalNaive,
    "rwd": RandomWalkWithDrift,
    "sma": SimpleMovingAverage,
    "historic_average": HistoricAverage,
    "window_average": WindowAverage,
    "seasonal_window_average": SeasonalWindowAverage,
    "ses": SES,
    "ets": ETS,
    "auto_ets": AutoETS,
    "theta": Theta,
    "optimized_theta": OptimizedTheta,
    "croston": Croston,
    "tsb": TSB,
    "adida": ADIDA,
    "arima": ARIMA,
    "arima_ml": ARIMAML,
    "sarima": SARIMA,
    "auto_arima": AutoARIMA,
    "garch": GARCH,
    "mfles": MFLES,
    "tbats": TBATS,
    "auto_tbats": AutoTBATS,
    "auto_theta": AutoTheta,
    "dstm": DynamicTheta,
    "dotm": DynamicOptimizedTheta,
    "holt": Holt,
    "holt_winters": HoltWinters,
    "seasonal_es": SeasonalES,
    "imapa": IMAPA,
    "mstl": MSTLForecaster,
}


def _make_ensemble(members=(), method: str = "mean", weights=None):
    """Registry adapter: build Ensemble from (name, kwargs) member
    specs so it is reachable through forecast_corpus model configs
    (src/models/ensemble/model.rs:24-200)."""
    return Ensemble(
        [make_model(n, **kw) for n, kw in members],
        method=method, weights=weights,
    )


REGISTRY["ensemble"] = _make_ensemble

#: models whose fit() runs a per-series optimizer (Nelder-Mead, CSS
#: grid, or model-selection search) — irreducible Python work that
#: amortizes actor-pool spin-up and wants fewer/bigger read blocks.
#: SINGLE SOURCE for dispatch and batch-size decisions (pipelines
#: _forecast_query and stages/multivariate both import this; keep in
#: sync with REGISTRY when adding models). "ensemble" is conservative:
#: members may be optimizer models.
OPTIMIZER_MODELS = frozenset({
    "ets", "auto_ets", "arima", "arima_ml", "sarima", "auto_arima",
    "optimized_theta", "dotm", "auto_theta", "tbats", "auto_tbats",
    "mfles", "mstl", "garch", "holt", "holt_winters", "ensemble",
})


def make_model(name: str, **kw) -> Forecaster:
    if name not in REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name](**kw)
