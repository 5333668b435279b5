"""Function queries / value sources (SURVEY.md §3.11) — Solr's scalar
function registry (ValueSourceParser.java ≈L80) as Column factories.

Notable semantics pinned from the reference:
  * `log(x)` is BASE-10 in Solr (SimpleFloatFunction) — F.log10;
  * `recip(x,m,a,b) = a/(m*x+b)` — the classic freshness boost
    (ReciprocalFloatFunction.java ≈L40);
  * `scale(x,min,max)` needs a global min/max pass (ScaleFloatFunction.java
    ≈L50) — one tiny agg + literal fold, NOT a crossJoin;
  * `ms(a,b)` epoch-millis difference; date math NOW/DAY-7DAYS resolved to a
    literal at plan build (DateMathParser.java ≈L150, NOW fixed per request).
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linear(x: Column, m: float, c: float) -> Column:
    return F.lit(m) * x + F.lit(c)


def recip(x: Column, m: float, a: float, b: float) -> Column:
    return F.lit(a) / (F.lit(m) * x + F.lit(b))


def scale(df: DataFrame, col: str, lo: float, hi: float) -> Column:
    """Global min-max scale; the stats pass is a 2-value agg collected to the
    driver and folded as literals (no crossjoin-broadcast of a 1-row DF)."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    mn, mx = float(row["mn"]), float(row["mx"])
    span = (mx - mn) or 1.0
    return (F.col(col) - F.lit(mn)) / F.lit(span) * F.lit(hi - lo) + F.lit(lo)


def map_range(x: Column, mn: float, mx: float, target: float, default=None) -> Column:
    out = F.when((x >= mn) & (x <= mx), F.lit(target))
    return out.otherwise(x if default is None else F.lit(default))


def ms_between(a: Column, b: Column) -> Column:
    return (F.unix_millis(a) - F.unix_millis(b)).cast("long")


_DATE_MATH_RE = re.compile(r"([+-]\d+)(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)S?|/(\w+)")

_UNITS = {
    "YEAR": "years", "MONTH": "months", "DAY": "days",
    "HOUR": "hours", "MINUTE": "minutes", "SECOND": "seconds",
}


def date_math(now: _dt.datetime, expr: str) -> _dt.datetime:
    """Solr date math: 'NOW/DAY-7DAYS', 'NOW+1MONTH/MONTH' ... resolved
    driver-side against a fixed `now` (cache-consistency semantics of
    DateMathParser: NOW is pinned per request)."""
    assert expr.startswith("NOW"), expr
    t = now
    for m in _DATE_MATH_RE.finditer(expr[3:]):
        if m.group(3):  # truncation /DAY
            unit = m.group(3).upper()
            if unit == "DAY":
                t = t.replace(hour=0, minute=0, second=0, microsecond=0)
            elif unit == "HOUR":
                t = t.replace(minute=0, second=0, microsecond=0)
            elif unit == "MONTH":
                t = t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
            elif unit == "YEAR":
                t = t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
            elif unit == "MINUTE":
                t = t.replace(second=0, microsecond=0)
            elif unit == "SECOND":
                t = t.replace(microsecond=0)
        else:
            qty = int(m.group(1))
            unit = m.group(2)
            if unit == "MONTH":
                month = t.month - 1 + qty
                t = t.replace(year=t.year + month // 12, month=month % 12 + 1)
            elif unit == "YEAR":
                t = t.replace(year=t.year + qty)
            else:
                t = t + _dt.timedelta(**{_UNITS[unit]: qty})
    return t


def geodist_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """geodist() haversine km (HaversineFunction.java)."""
    r = 6371.0087714  # Solr/Lucene GeoUtils EARTH_MEAN_RADIUS meters/1000
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


def geo_box(
    lat: Column, lon: Column,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
) -> Column:
    """LatLonPoint.newBoxQuery (lucene/core/.../document/LatLonPoint.java
    ≈L180): bounding-box containment — pure range predicates, so parquet
    min-max pruning (the BKD analog) applies at the scan."""
    return (
        (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
        & (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    )


def point_in_polygon(
    lat: Column, lon: Column, polygon: list[tuple[float, float]]
) -> Column:
    """LatLonPoint.newPolygonQuery (Polygon2D ray casting ≈L120): odd
    edge-crossing parity for a literal polygon [(lat, lon), ...]. Unrolled
    into a pure Column expression (one CASE per edge — codegen'd, no UDF);
    the identical arithmetic is restated in the SQL oracle."""
    n = len(polygon)
    crossings = F.lit(0)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge can't cross a horizontal ray test
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = F.lit(x1) + (lat - F.lit(y1)) * F.lit((x2 - x1) / (y2 - y1))
        crossings = crossings + F.when(straddles & (lon < x_at), 1).otherwise(0)
    return crossings % 2 == 1


def strdist_levenshtein_sim(a: Column, b: Column) -> Column:
    """strdist(a,b,edit) — Solr returns a SIMILARITY in [0,1]:
    1 - dist/max(len) (StrDistanceFunction with LevensteinDistance)."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx == 0, 1.0).otherwise(
        1.0 - F.levenshtein(a, b) / mx
    )


def ord_rank(df: DataFrame, col: str) -> DataFrame:
    """ord(f)/rord(f): 1-based rank of a value in the sorted distinct value
    space (OrdFieldSource) — dense_rank over distinct values."""
    from pyspark.sql import Window

    vals = df.select(col).distinct()
    w = Window.orderBy(F.asc(col))
    return vals.withColumn("ord", F.dense_rank().over(w))


# ---------------------------------------------------------------------------
# FeatureField scoring functions (lucene/core/.../document/FeatureField.java
# ≈L80): static per-doc features (pagerank, quality, recency) contribute to
# the score through one of three shapes; the FeatureField query is a SHOULD
# clause whose score ADDS to the textual BM25 score. All three stay in
# whole-stage codegen.
# ---------------------------------------------------------------------------
def feature_saturation(f: Column, pivot: float, weight: float = 1.0) -> Column:
    """SaturationFunction: w * f / (f + pivot)."""
    x = f.cast("double")
    return F.lit(float(weight)) * x / (x + F.lit(float(pivot)))


def feature_log(f: Column, scaling: float, weight: float = 1.0) -> Column:
    """LogFunction: w * ln(scaling + f)."""
    return F.lit(float(weight)) * F.log(F.lit(float(scaling)) + f.cast("double"))


def feature_sigmoid(
    f: Column, pivot: float, exp: float, weight: float = 1.0
) -> Column:
    """SigmoidFunction: w * f^a / (f^a + pivot^a)."""
    x = F.pow(f.cast("double"), F.lit(float(exp)))
    return F.lit(float(weight)) * x / (x + F.lit(float(pivot) ** float(exp)))
