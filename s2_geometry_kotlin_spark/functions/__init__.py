"""Spark Column-level surface of the engine.

Geometry kernels enter Spark in exactly two forms:
- pure Column/SQL expressions (bit math, tile arithmetic) that stay inside
  whole-stage codegen — used for everything the kernel can express without
  trig (parent/level/range/tile), and
- Arrow-batched pandas UDFs over the numpy kernel for the trig-heavy
  encode/decode (never per-row Python, per BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

_LATLON = StructType([StructField("lat", DoubleType()),
                      StructField("lon", DoubleType())])
_XYZ = StructType([StructField("x", DoubleType()),
                   StructField("y", DoubleType()),
                   StructField("z", DoubleType())])

from ..kernel import cellid as ck

MAX_LEVEL = 30


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-vectorized numpy kernels)
# ---------------------------------------------------------------------------

@pandas_udf(LongType())
def s2_cellid(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """Leaf (level-30) cell id for (lat, lon) degrees; null-safe."""
    la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
    lo = lon.to_numpy(dtype=np.float64, na_value=np.nan)
    ok = ~(np.isnan(la) | np.isnan(lo))
    out = np.zeros(len(la), dtype=np.int64)
    if ok.any():
        out[ok] = ck.to_signed(ck.from_latlng_deg(la[ok], lo[ok]))
    res = pd.Series(out)
    res[~ok] = None
    return res


@pandas_udf(StringType())
def s2_token(cell_id: pd.Series) -> pd.Series:
    ids = cell_id.to_numpy(dtype=np.int64, na_value=0)
    return pd.Series(ck.to_token(ids))


@pandas_udf(_LATLON)
def s2_cell_center(cell_id: pd.Series) -> pd.DataFrame:
    ids = cell_id.to_numpy(dtype=np.int64, na_value=0)
    lat, lon = ck.to_latlng_deg(ids)
    return pd.DataFrame({"lat": lat, "lon": lon})


@pandas_udf(_XYZ)
def s2_xyz(lat: pd.Series, lon: pd.Series) -> pd.DataFrame:
    x, y, z = ck.latlng_deg_to_xyz(lat.to_numpy(dtype=np.float64),
                                   lon.to_numpy(dtype=np.float64))
    return pd.DataFrame({"x": x, "y": y, "z": z})


# ---------------------------------------------------------------------------
# pure Column expressions (JVM-side, codegen'd — no Python)
# ---------------------------------------------------------------------------

def cell_parent(cell: Column, level: int) -> Column:
    """Ancestor at `level` — S2CellId.parent as 2 bitwise ops
    (S2CellId.kt:356-373).  Valid for any id of level >= `level`."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    mask = ~(2 * lsb - 1)  # python int, sign-extends correctly
    return (cell.bitwiseAND(F.lit(mask)).bitwiseOR(F.lit(lsb))).alias(
        f"cell_l{level}")


def cell_range_min(cell: Column, level: int) -> Column:
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return cell - F.lit(lsb - 1)


def cell_range_max(cell: Column, level: int) -> Column:
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return cell + F.lit(lsb - 1)


def cell_level(cell: Column) -> Column:
    """level = 30 - trailing_zeros/2, via bit_count(lsb-1)."""
    lsb = cell.bitwiseAND(-cell)
    return (F.lit(MAX_LEVEL) -
            F.shiftright(F.bit_count(lsb - F.lit(1)), 1)).cast("int")


def cell_range_min_dyn(cell: Column) -> Column:
    """range_min for ids of mixed level."""
    lsb = cell.bitwiseAND(-cell)
    return cell - (lsb - F.lit(1))


def cell_range_max_dyn(cell: Column) -> Column:
    lsb = cell.bitwiseAND(-cell)
    return cell + (lsb - F.lit(1))


def s2_snap_to_cell_center(lat: Column, lon: Column, level: int) -> Column:
    """B2: S2CellIdSnapFunction — snap a point to its level-`level` cell
    center (builder/snap/S2CellIdSnapFunction.kt); returns struct
    (lat, lon)."""
    return s2_cell_center(cell_parent(s2_cellid(lat, lon), level))


# ---------------------------------------------------------------------------
# T1: raster tile grid (dilivia/s2/Tiles.kt:41-170) — pure arithmetic
# ---------------------------------------------------------------------------

def tile_row(lat: Column, lat0: float, size_deg: float) -> Column:
    return F.floor((lat - F.lit(lat0)) / F.lit(size_deg)).cast("long")


def tile_col(lon: Column, lon0: float, size_deg: float) -> Column:
    return F.floor((lon - F.lit(lon0)) / F.lit(size_deg)).cast("long")


def tile_index(lat: Column, lon: Column, lat0: float = -90.0,
               lon0: float = -180.0, size_deg: float = 1.0,
               ncols: int = 360) -> Column:
    """tile = row * ncols + col (Tiles.kt:103-119)."""
    return (tile_row(lat, lat0, size_deg) * F.lit(ncols) +
            tile_col(lon, lon0, size_deg))
