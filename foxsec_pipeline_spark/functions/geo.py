"""Geo functions — haversine distance and geo-velocity.

Reference: `GeoUtil.java:36-51` (haversine km),
`authstate/AuthStateModel.java:392` (geoVelocityAnalyzeLatest: km
between consecutive logins / elapsed seconds).

Pure SQL expressions (sin/cos/asin run JVM-side inside whole-stage
codegen) — no UDF, so they vectorize and survive any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (GeoUtil.java:36-51)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    a = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_velocity(
    df: DataFrame,
    key: str,
    lat: str = "lat",
    lon: str = "lon",
    ts: str = "ts",
    max_kmh: float = 800.0,
    min_km: float = 50.0,
) -> DataFrame:
    """Flag implausible travel speed between consecutive events per key.

    The reference stores the previous (lat, lon, ts) in per-identity
    state (`CustomsVelocity.java:92-280`, T5); in batch the previous
    row is just `lag` over (key ORDER BY ts) — one shuffle.
    """
    w = Window.partitionBy(key).orderBy(ts)
    prev = df.select(
        F.col(key),
        F.col(ts),
        F.col(lat),
        F.col(lon),
        F.lag(lat).over(w).alias("prev_lat"),
        F.lag(lon).over(w).alias("prev_lon"),
        F.lag(ts).over(w).alias("prev_ts"),
    ).where(F.col("prev_ts").isNotNull())
    km = haversine_km(F.col("prev_lat"), F.col("prev_lon"), F.col(lat), F.col(lon))
    # exact integer microsecond delta (a double epoch would lose µs)
    hours = (F.unix_micros(F.col(ts)) - F.unix_micros(F.col("prev_ts"))) / 3.6e9
    return prev.select(
        F.col(key),
        F.col(ts),
        F.round(km, 3).alias("km"),
        F.round(km / hours, 3).alias("kmh"),
    ).where((km >= F.lit(float(min_km))) & (km / hours > F.lit(float(max_kmh))))
