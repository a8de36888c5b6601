"""Unit-conversion scalar functions with bit-parity string formatting.

Reference: /root/reference/plugins/util.hpp:165-189 (kg_to_t, cm_to_m,
inch_to_feet, lbs_to_metric_ton), golden-pinned by
/root/reference/tests/unit_test_util.cpp:71-134. The C++ versions format
through a default ``std::stringstream`` (6 significant digits) — Python's
``%.6g`` reproduces it exactly ("1.234", "1e+06", "1.23457e+06",
"0.000453592").

Exposed both as plain Python (driver/tests) and as Arrow pandas UDFs. The
numeric part (divisions) stays in Catalyst where only the number is needed;
these UDFs exist because the *string* form is fixture-pinned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

LBS_TO_TON = 0.90718474  # short-ton → metric-ton factor (util.hpp:183-189)


def _g6(x: float) -> str:
    """C++ default-stream float formatting: 6 significant digits."""
    return "%.6g" % x


def kg_to_t(kg: int) -> str:
    return _g6(kg / 1000.0)


def cm_to_m(cm: int) -> str:
    return _g6(cm / 100.0)


def inch_to_feet(inches: int) -> str:
    return f"{int(inches) // 12}'{int(inches) % 12}\""


def lbs_to_metric_ton(lbs: float) -> str:
    return _g6(lbs / 2000.0 * LBS_TO_TON)


def _series_g6(s: pd.Series, scale: float) -> pd.Series:
    vals = s.to_numpy(dtype=np.float64) * scale
    return pd.Series(["%.6g" % v for v in vals])


@F.pandas_udf(StringType())
def kg_to_t_udf(s: pd.Series) -> pd.Series:
    return _series_g6(s, 1e-3)


@F.pandas_udf(StringType())
def cm_to_m_udf(s: pd.Series) -> pd.Series:
    return _series_g6(s, 1e-2)


@F.pandas_udf(StringType())
def lbs_to_metric_ton_udf(s: pd.Series) -> pd.Series:
    return _series_g6(s, LBS_TO_TON / 2000.0)


def inch_to_feet_col(col):
    """Catalyst-native (no Python): floor-div + mod + concat."""
    c = col.cast("long")
    return F.concat(
        (c / 12).cast("long").cast("string"), F.lit("'"), (c % 12).cast("string"), F.lit('"')
    )
