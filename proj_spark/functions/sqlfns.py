"""SQL-surface registration: use the engine from plain ``spark.sql``.

Two registration classes:

  * **SQL UDFs (macros)** — ``cell_id``, ``cell_parent``, ``tile_x``,
    ``tile_y``, ``haversine_m`` are created with
    ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``: the body INLINES
    into the caller's plan, so these stay inside whole-stage codegen
    exactly like their Column-API twins (cells.cell_col etc.) — no
    Python worker, no UDF call overhead.
  * **Python UDF** — ``proj_transform(x, y, src, dst)`` needs the
    numpy kernels, so it registers as an Arrow-batched pandas UDF
    returning ``struct<x,y,err>``; rows are grouped by (src, dst)
    within each batch and run through the per-worker transform cache
    (one kernel call per CRS pair per batch).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

__all__ = ["register_sql_functions"]

_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _sql_spread(v: str) -> str:
    for shift, mask in _MASKS:
        v = f"(({v} | shiftleft({v}, {shift})) & {mask}L)"
    return v


def _sql_ij(coord: str, off: float, span: float) -> str:
    n = "shiftleft(1L, level)"
    return (f"CAST(greatest(0L, least({n} - 1L, "
            f"CAST(floor((({coord}) + {off!r}) / {span!r}"
            f" * CAST({n} AS DOUBLE)) AS BIGINT))) AS BIGINT)")


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotently register the SQL surface on this session."""
    ix = _sql_ij("lon", 180.0, 360.0)
    iy = _sql_ij("lat", 90.0, 180.0)
    # bit-identical to cells.cell_col (parity tested)
    spark.sql(f"""
CREATE OR REPLACE TEMPORARY FUNCTION cell_id(lon DOUBLE, lat DOUBLE, level INT)
RETURNS BIGINT
RETURN shiftleft({_sql_spread(ix)} | shiftleft({_sql_spread(iy)}, 1), 5)
       | CAST(level AS BIGINT)
""")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION cell_parent(cell BIGINT, level INT,
                                                 parent_level INT)
RETURNS BIGINT
RETURN shiftleft(shiftrightunsigned(shiftrightunsigned(cell, 5),
                                    2 * (level - parent_level)), 5)
       | CAST(parent_level AS BIGINT)
""")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION tile_x(lon DOUBLE, zoom INT)
RETURNS INT
RETURN CAST(greatest(0L, least(shiftleft(1L, zoom) - 1L,
  CAST(floor((lon + 180.0d) / 360.0d
       * CAST(shiftleft(1L, zoom) AS DOUBLE)) AS BIGINT))) AS INT)
""")
    max_lat = math.degrees(math.atan(math.sinh(math.pi)))
    spark.sql(f"""
CREATE OR REPLACE TEMPORARY FUNCTION tile_y(lat DOUBLE, zoom INT)
RETURNS INT
RETURN CAST(greatest(0L, least(shiftleft(1L, zoom) - 1L,
  CAST(floor((1.0d - ln(tan({math.pi / 4.0!r}d
       + radians(greatest({-max_lat!r}d, least({max_lat!r}d, lat))) / 2.0d))
       / {math.pi!r}d) / 2.0d
       * CAST(shiftleft(1L, zoom) AS DOUBLE)) AS BIGINT))) AS INT)
""")
    spark.sql("""
CREATE OR REPLACE TEMPORARY FUNCTION haversine_m(
    lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)
RETURNS DOUBLE
RETURN 2.0d * 6371008.8d * asin(least(1.0d, sqrt(
  pow(sin((radians(lat2) - radians(lat1)) / 2.0d), 2)
  + cos(radians(lat1)) * cos(radians(lat2))
    * pow(sin((radians(lon2) - radians(lon1)) / 2.0d), 2))))
""")

    # geohash: compute the FULL 12-char (60-bit) hash inline, then
    # take the prefix — geohash prefixes nest, so substr(gh12, 1, p)
    # is exactly the precision-p hash (parity-tested vs geohash_col)
    ghx = _sql_ij("lon", 180.0, 360.0).replace(
        "shiftleft(1L, level)", "1073741824L")  # 2^30
    ghy = _sql_ij("lat", 90.0, 180.0).replace(
        "shiftleft(1L, level)", "1073741824L")
    gh_v = f"({_sql_spread(ghy)} | shiftleft({_sql_spread(ghx)}, 1))"
    gh_chars = " || ".join(
        "substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(shiftrightunsigned({gh_v}, {5 * (12 - 1 - i)}) & 31L AS INT)"
        " + 1, 1)"
        for i in range(12)
    )
    spark.sql(f"""
CREATE OR REPLACE TEMPORARY FUNCTION geohash(
    lon DOUBLE, lat DOUBLE, precision INT)
RETURNS STRING
RETURN substr({gh_chars}, 1, precision)
""")

    @pandas_udf("double")
    def _geodesic_m(lon1: pd.Series, lat1: pd.Series,
                    lon2: pd.Series, lat2: pd.Series) -> pd.Series:
        from ..operators.geodesic import vincenty_inverse

        return pd.Series(vincenty_inverse(
            lon1.to_numpy(), lat1.to_numpy(),
            lon2.to_numpy(), lat2.to_numpy()))

    spark.udf.register("geodesic_m", _geodesic_m)

    @pandas_udf("x double, y double, err string")
    def _proj_transform(x: pd.Series, y: pd.Series, src: pd.Series,
                        dst: pd.Series) -> pd.DataFrame:
        from .transform import get_transform

        n = len(x)
        ox = np.full(n, np.nan)
        oy = np.full(n, np.nan)
        oe = np.full(n, None, dtype=object)
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        groups = pd.Series(range(n)).groupby(
            [src.values, dst.values], sort=False).groups
        for (s, d), idx in groups.items():
            ii = np.asarray(idx)
            try:
                t = get_transform((s, d))
            except Exception as ex:  # unknown CRS -> per-row error
                oe[ii] = f"create error: {ex}"
                continue
            tx, ty, te = t.convert_array(xs[ii], ys[ii], errors="mask")
            ox[ii] = tx
            oy[ii] = ty
            oe[ii] = te
        return pd.DataFrame({"x": ox, "y": oy, "err": oe})

    spark.udf.register("proj_transform", _proj_transform)

    # UDTF surface (the table-function leg of the §2.2 UDF/UDAF/UDTF
    # row): ring_cells(cell, r) expands a cell id to its ring-r
    # neighbourhood — the SQL-surface twin of cells.np_cell_ring /
    # cell_ring_col, usable in LATERAL joins for candidate generation:
    #   SELECT p.*, rc.cand_cell
    #   FROM points p, LATERAL ring_cells(p.cell, 1) rc
    from pyspark.sql.functions import udtf

    @udtf(returnType="cand_cell bigint")
    class _RingCells:
        def eval(self, cell, r):
            import numpy as np

            from ..operators.cells import np_cell_ring

            if cell is None or r is None:
                return
            for c in np_cell_ring(np.array([cell], dtype=np.int64),
                                  int(r)).ravel():
                yield (int(c),)

    spark.udtf.register("ring_cells", _RingCells)
