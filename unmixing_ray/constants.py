"""Shared constants for the engine.

Parity notes: the NoData sentinel and CFMask QA value tables mirror the
reference library (``/root/reference/unmixing/utils.py:184`` and
``/root/reference/unmixing/eos.py:8-23``) so that every mask kernel has the
same defaults a reference user expects.
"""

from __future__ import annotations

# The universal NoData sentinel (reference: utils.py:184, lsma.py default args).
NODATA = -9999

# CFMask / pixel_qa values to be masked, by sensor + collection
# (reference: eos.py:8-23).
CFMASK_VALUES = {
    "pre-collection": (1, 2, 3, 4, 255),
    "collection1": {
        "landsat8": {
            "low+": (
                324, 328, 336, 352, 368, 386, 388, 392, 400, 416, 432, 480,
                832, 836, 840, 848, 864, 880, 900, 904, 912, 928, 944, 992,
                1024,
            ),
            "medium+": (
                324, 328, 386, 388, 392, 400, 416, 432, 480, 832, 836, 840,
                848, 864, 880, 900, 904, 912, 928, 944, 992, 1024,
            ),
        },
        "landsat4-7": {
            "medium+": (68, 72, 80, 112, 132, 136, 144, 160, 176, 224),
            "medium+_exclude_water": (
                72, 80, 112, 136, 144, 160, 176, 224,
            ),
        },
    },
}

# Saturation threshold for surface-reflectance data (reference: utils.py:971).
SATURATION_VALUE = 10000

# Default tile edge (pixels) for the tiling stage. A 64x64x6 float32 tile is
# ~96 KiB; O(1000) tiles fit in a default 128 MiB Ray Data block.
DEFAULT_TILE = 64

# Default quadtree level for the cell index (see cellindex.py). At 30 m
# pixels and 64 px tiles, one level-20 cell is the tile grid itself.
DEFAULT_CELL_LEVEL = 20
