"""Self-contained transverse-Mercator projection for the engine CRS.

The reference reprojects pixel/map coordinates to decimal degrees through
OSR (``utils.py:913-937`` builds a CoordinateTransformation from the
raster SRS to EPSG:4326; ``utils.py:1129-1143`` the inverse). No CRS
database exists in this environment, so the engine's UTM-like working CRS
("ENGINE:UTM-LIKE", a standard northern-hemisphere UTM zone) gets a
from-scratch transverse-Mercator forward/inverse implemented from the
published series (Snyder 1987, *Map Projections — A Working Manual*,
USGS PP 1395, eqs. 8-9..8-25): WGS84 ellipsoid, k0 = 0.9996, false
easting 500 000 m, false northing 0, central meridian configurable
(default UTM zone 17N, the reference's Landsat test-scene zone).

Accuracy: the 6th-order series round-trips to < 1e-9 degrees / < 1e-4 m
within a zone (property-tested in tests/test_geo.py).
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
_FE = 500000.0
_FN = 0.0

# Default central meridian: UTM zone 17N (81°W), the reference fixtures'
# Landsat WRS-2 path/row area.
DEFAULT_LON0 = -81.0


def _meridian_arc(phi):
    """Meridian distance from the equator (Snyder eq. 3-21)."""
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi))


def dd_to_projected(lon, lat, lon0=DEFAULT_LON0):
    """(lon, lat) decimal degrees → (easting, northing) meters.
    Snyder eqs. 8-9..8-14; vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians(lon - lon0)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    N = _A / np.sqrt(1 - _E2 * sin_p ** 2)
    T = tan_p ** 2
    C = _EP2 * cos_p ** 2
    Aq = dlam * cos_p
    M = _meridian_arc(phi)
    x = _K0 * N * (
        Aq + (1 - T + C) * Aq ** 3 / 6
        + (5 - 18 * T + T ** 2 + 72 * C - 58 * _EP2) * Aq ** 5 / 120
    ) + _FE
    y = _K0 * (
        M + N * tan_p * (
            Aq ** 2 / 2
            + (5 - T + 9 * C + 4 * C ** 2) * Aq ** 4 / 24
            + (61 - 58 * T + T ** 2 + 600 * C - 330 * _EP2)
            * Aq ** 6 / 720)
    ) + _FN
    return x, y


ENGINE_CRS = "ENGINE:UTM-LIKE"
WGS84 = "EPSG:4326"


def get_coord_transform(source, target, lon0=DEFAULT_LON0):
    """Transform-factory analogue of reference ``utils.py:657-673``
    (``get_coord_transform(source_epsg, target_epsg)`` via OSR): returns
    a callable ``(x, y) -> (x', y')`` between the engine's projected CRS
    and EPSG:4326, backed by the self-contained transverse Mercator.
    Identity when source == target; unknown CRS pairs raise."""
    key = (str(source), str(target))
    if key[0] == key[1]:
        return lambda x, y: (x, y)
    if key == (ENGINE_CRS, WGS84):
        return lambda x, y: projected_to_dd(x, y, lon0=lon0)
    if key == (WGS84, ENGINE_CRS):
        return lambda lon, lat: dd_to_projected(lon, lat, lon0=lon0)
    raise ValueError(
        "no transform for %r -> %r (engine CRS database holds only the "
        "working UTM-like CRS and EPSG:4326)" % key)


def projected_to_dd(x, y, lon0=DEFAULT_LON0):
    """(easting, northing) meters → (lon, lat) decimal degrees.
    Snyder eqs. 8-17..8-25 (footpoint latitude series); vectorized."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64) - _FN
    M = y / _K0
    mu = M / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64
                    - 5 * _E2 ** 3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = mu \
        + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu) \
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu) \
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu) \
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = _EP2 * cos1 ** 2
    T1 = tan1 ** 2
    N1 = _A / np.sqrt(1 - _E2 * sin1 ** 2)
    R1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    D = x / (N1 * _K0)
    phi = phi1 - (N1 * tan1 / R1) * (
        D ** 2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 ** 2 - 9 * _EP2) * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 ** 2 - 252 * _EP2
           - 3 * C1 ** 2) * D ** 6 / 720)
    lam = (D - (1 + 2 * T1 + C1) * D ** 3 / 6
           + (5 - 2 * C1 + 28 * T1 - 3 * C1 ** 2 + 8 * _EP2
              + 24 * T1 ** 2) * D ** 5 / 120) / cos1
    return np.degrees(lam) + lon0, np.degrees(phi)
