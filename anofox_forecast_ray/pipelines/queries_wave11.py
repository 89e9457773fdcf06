"""Eleventh query wave: the three remaining composite/optimizer models as
driver queries — MFLES, TBATS (fixed config), and the MSTL forecaster.

None are SQL-expressible (boosted lstsq rounds / Nelder-Mead state-space
fit / iterative STL inner loops), so each is verified by an independent
sequential golden oracle in ``tools/golden_oracles.py``: pipeline wiring
(query output == direct in-process fit), an independent recomputation of
the forecast from the fitted state with plain-Python math, and structural
identities (fitted + residuals == y, NaN surface for short docs).

Reference parity targets:
- MFLES  src/models/mfles.rs:29-900
- TBATS  src/models/tbats/model.rs:41-780
- MSTL   src/models/mstl_forecaster.rs:68-300
"""

from __future__ import annotations

from .queries import _forecast_query

# TBATS query config: no Box-Cox and K=1 keep every quantity in the
# original space so the golden oracle can replay the AIC / residual
# identities without transform round-off.
TBATS_KW = {"periods": (4,), "use_box_cox": False, "fourier_k": (1,)}
MFLES_KW = {"season_length": 4}
MSTL_KW = {"periods": (4,)}


def build_wave11_queries():
    queries, oracles = {}, {}
    queries["forecast_mfles_w8"] = _forecast_query(8, "mfles", MFLES_KW, 1)
    queries["forecast_tbats_w8"] = _forecast_query(8, "tbats", TBATS_KW, 1)
    queries["forecast_mstl_w8"] = _forecast_query(8, "mstl", MSTL_KW, 4)
    return queries, oracles
