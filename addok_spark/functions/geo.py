"""Geo scalar operators (reference T14/T15) as pure column math —
whole-stage codegen, no UDF.

Not used by the transcripts engine (no geometry in the input_hint
schema) but part of the reference's operator surface
(``/root/reference/addok/helpers/__init__.py:73-98``): great-circle
distance and the gaussian distance→score decay used by
``score_by_geo_distance`` (``addok/helpers/results.py:107-118``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km between two (lat, lon) columns
    (degrees). ≙ haversine_distance, helpers/__init__.py:73-92."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def km_to_score(km, scale_km: float = 50.0, max_km: float = 100.0):
    """Gaussian decay exp(-(km/scale)²), 0 beyond max_km
    (≙ km_to_score, helpers/__init__.py:95-98)."""
    return F.when(km > max_km, F.lit(0.0)).otherwise(
        F.exp(-F.pow(km / F.lit(scale_km), F.lit(2.0)))
    )
