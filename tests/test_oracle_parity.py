"""Cross-engine trig parity: the oracle SQL (functions/sqlgen.py) and
the numpy kernels both reduce lat/lng degrees to unit vectors via
sin/cos.  The cell-id value hashes only agree if the quantities DERIVED
from those trig results — the quantized si/ti integer coordinates that
every Hilbert encode consumes — are identical across numpy, DuckDB and
Spark SQL.  This test pins exactly that, on boundary-hugging fixture
latitudes (face edges at ±45°, poles, equator, and jittered neighbours
at the quantization knife-edge), plus the raw sin/cos agreement to
within 1 ULP (the engines share this machine's libm but the JVM may
use its own fdlibm-accurate intrinsics — 1 ULP is the guarantee the
quantization argument needs, not bit equality of the transcendentals).
"""

import duckdb
import numpy as np
import pytest

from s2_geometry_kotlin_spark.kernel import cellid as ck

# boundary-hugging battery: face boundaries (|lat|=45 is the cube-face
# edge in latitude terms for lon 0), poles, equator, date line, plus
# tiny jitters that land next to the st->ij floor() knife-edge
_LATS = [0.0, 45.0, -45.0, 89.999999, -89.999999, 90.0, -90.0,
         44.999999999, 45.000000001, 35.264389682754654,  # atan(1/sqrt2)
         -35.264389682754654, 48.8566, 1e-12, -1e-12]
_LONS = [0.0, 45.0, -45.0, 90.0, -90.0, 135.0, -135.0, 180.0, -180.0,
         179.999999999, -179.999999999, 2.3522, 1e-12, -1e-12]


def _battery():
    lats, lons = [], []
    for la in _LATS:
        for lo in _LONS:
            lats.append(la)
            lons.append(lo)
    return np.array(lats), np.array(lons)


def _ulp_diff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ia = a.view(np.int64)
    ib = b.view(np.int64)
    # map to monotonic lexicographic ordering of IEEE doubles
    ia = np.where(ia < 0, np.int64(-(2 ** 63)) - ia - 1, ia)
    ib = np.where(ib < 0, np.int64(-(2 ** 63)) - ib - 1, ib)
    return np.abs(ia - ib)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_duckdb_trig_within_1ulp_of_numpy(duck):
    lats, lons = _battery()
    duck.register("pts", __import__("pandas").DataFrame(
        {"lat": lats, "lon": lons}))
    got = duck.execute(
        "SELECT sin(radians(lat)) AS sl, cos(radians(lat)) AS cl, "
        "sin(radians(lon)) AS so, cos(radians(lon)) AS co "
        "FROM pts").fetchnumpy()
    rl, ro = np.radians(lats), np.radians(lons)
    for name, g, e in [("sin lat", got["sl"], np.sin(rl)),
                       ("cos lat", got["cl"], np.cos(rl)),
                       ("sin lon", got["so"], np.sin(ro)),
                       ("cos lon", got["co"], np.cos(ro))]:
        d = _ulp_diff(np.asarray(g, dtype=np.float64), e)
        assert d.max() <= 1, f"{name}: max ulp diff {d.max()}"


def test_spark_trig_within_1ulp_of_numpy():
    from s2_geometry_kotlin_spark.session import get_spark
    spark = get_spark("trig-parity", cpus=2, shuffle_partitions=2)
    lats, lons = _battery()
    pdf = __import__("pandas").DataFrame({"lat": lats, "lon": lons})
    got = (spark.createDataFrame(pdf)
           .selectExpr("sin(radians(lat)) AS sl", "cos(radians(lat)) AS cl",
                       "sin(radians(lon)) AS so", "cos(radians(lon)) AS co")
           .toPandas())
    rl, ro = np.radians(lats), np.radians(lons)
    for name, g, e in [("sin lat", got["sl"], np.sin(rl)),
                       ("cos lat", got["cl"], np.cos(rl)),
                       ("sin lon", got["so"], np.sin(ro)),
                       ("cos lon", got["co"], np.cos(ro))]:
        d = _ulp_diff(g.to_numpy(dtype=np.float64), e)
        assert d.max() <= 1, f"{name}: max ulp diff {d.max()}"


def test_quantized_si_ti_exact_across_numpy_and_duckdb(duck):
    """The value-hash-bearing quantity: leaf cell ids derived through
    the generated SQL equal the numpy kernel's, on the battery.  (The
    full Spark leg of this identity is pinned at 2M points by the
    driver-contract suite via cell_leaf / cell_sessions.)"""
    from s2_geometry_kotlin_spark.functions import sqlgen
    lats, lons = _battery()
    # drop the exact poles: ij clamping at the pole is covered by unit
    # tests; here we pin the trig->quantization pipeline
    keep = np.abs(lats) < 90.0
    lats, lons = lats[keep], lons[keep]
    duck.register("pts2", __import__("pandas").DataFrame(
        {"k": np.arange(len(lats)), "lat": lats, "lon": lons}))
    sql = (sqlgen.cellid_from_latlng_query(
               "SELECT k, lat, lon FROM pts2", "k")
           + " SELECT cell_id FROM henc ORDER BY k")
    got = duck.execute(sql).fetchnumpy()["cell_id"].astype(np.int64)
    exp = ck.from_latlng_deg(lats, lons).astype(np.int64)
    assert (got == exp).all(), \
        f"{int((got != exp).sum())} mismatching leaf cell ids"
