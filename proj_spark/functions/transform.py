"""Spark column functions for coordinate transformation.

The reference's batch path — marshal N points, one FFI call
(``proj_trans_array``, /root/reference/src/proj.rs:1210-1274) — maps
here to ONE Arrow batch per pandas-UDF invocation: Spark ships whole
column chunks to the Python worker as Arrow arrays, the numpy kernel
transforms them in a single vectorized call, and the result returns as
an Arrow struct column.  No per-row Python ever runs (input_hint
contract, /root/repo/BASELINE.json:15).

Per-worker transform cache: the reference keeps one PROJ context per
thread because context setup dominates construction cost
(/root/reference/src/context.rs:84-89).  Our analog is a module-level
memo in each Python worker process keyed by the transform spec, so
kernel setup runs once per worker, not once per batch.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..crs import Transform

__all__ = [
    "proj_udf",
    "projstring_udf",
    "projstring_udf3",
    "with_transformed",
    "transform_crs_to_crs",
    "get_transform",
]

# per-Python-worker transform cache (reference thread-local context
# analog, /root/reference/src/context.rs:84-89)
_TRANSFORM_CACHE: dict = {}


def get_transform(spec) -> Transform:
    """Resolve + memoize a Transform from a spec:
    "EPSG:A->EPSG:B" pair tuple, proj string, or Transform instance."""
    if isinstance(spec, Transform):
        return spec
    key = spec if isinstance(spec, str) else tuple(spec)
    t = _TRANSFORM_CACHE.get(key)
    if t is None:
        t = Transform.from_spec(spec)
        _TRANSFORM_CACHE[key] = t
    return t


def proj_udf(src_crs: str, dst_crs: str, errors: str = "mask",
             inverse: bool = False, **options):
    """Build an Arrow-batched pandas UDF ``(x, y) -> struct<x,y,err>``
    for a CRS->CRS transform (the Spark surface of reference operators
    O5-O8, /root/reference/src/proj.rs:932-1123).

    errors="mask"  -> row-wise: NaN outputs + err message column
                      (scalable mode; engine extension)
    errors="strict"-> all-or-nothing per Arrow batch, matching the
                      reference's array semantics
                      (/root/reference/src/proj.rs:1259)
    """
    spec = (src_crs, dst_crs)
    opts = dict(options)

    @pandas_udf("x double, y double, err string")
    def _udf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        key = (spec, tuple(sorted(opts.items())), inverse)
        t = _TRANSFORM_CACHE.get(key)
        if t is None:
            t = Transform.new_known_crs(spec[0], spec[1], **opts)
            _TRANSFORM_CACHE[key] = t
        xv = x.to_numpy(dtype=np.float64, na_value=np.nan)
        yv = y.to_numpy(dtype=np.float64, na_value=np.nan)
        if errors == "strict":
            ox, oy = t._run(xv, yv, forward=not inverse, errors="strict")
            err = np.full(len(ox), None, dtype=object)
        else:
            ox, oy, err = t._run(xv, yv, forward=not inverse, errors="mask")
        return pd.DataFrame({"x": ox, "y": oy, "err": err})

    return _udf


def projstring_udf(definition: str, input_units: str = "deg",
                   inverse: bool = False, errors: str = "mask"):
    """Arrow-batched UDF for a raw proj-string transform (reference O1
    Proj::new + O5-O8; caller-owned coordinate order,
    /root/reference/src/proj.rs:986-991).

    input_units="deg" converts degrees->radians before the kernel (for
    single-projection geodetic input); "unit" feeds the pipeline as-is.
    Output is in the definition's CRS units.
    """

    @pandas_udf("x double, y double, err string")
    def _udf(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        key = ("projstring", definition, input_units, inverse)
        t = _TRANSFORM_CACHE.get(key)
        if t is None:
            t = Transform.new(definition)
            _TRANSFORM_CACHE[key] = t
        xv = x.to_numpy(dtype=np.float64, na_value=np.nan)
        yv = y.to_numpy(dtype=np.float64, na_value=np.nan)
        if input_units == "deg" and not inverse:
            xv = np.radians(xv)
            yv = np.radians(yv)
        if errors == "strict":
            ox, oy = t._run(xv, yv, forward=not inverse, errors="strict")
            err = np.full(len(ox), None, dtype=object)
        else:
            ox, oy, err = t._run(xv, yv, forward=not inverse, errors="mask")
        if input_units == "deg" and inverse:
            ox = np.degrees(ox)
            oy = np.degrees(oy)
        return pd.DataFrame({"x": ox, "y": oy, "err": err})

    return _udf


def projstring_udf3(definition: str, input_units: str = "deg",
                    inverse: bool = False, errors: str = "mask"):
    """Arrow-batched UDF ``(x, y, z) -> struct<x,y,z,err>`` for a
    z-carrying pipeline (vgridshift and friends; the reference sets z
    on every PJ_COORD, /root/reference/src/proj.rs:951-957, 1022-1030).
    z is in the pipeline's vertical units (meters for GTX geoids) and
    is untouched by ``input_units``."""

    @pandas_udf("x double, y double, z double, err string")
    def _udf(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.DataFrame:
        key = ("projstring3", definition, input_units, inverse)
        t = _TRANSFORM_CACHE.get(key)
        if t is None:
            t = Transform.new(definition)
            _TRANSFORM_CACHE[key] = t
        xv = x.to_numpy(dtype=np.float64, na_value=np.nan)
        yv = y.to_numpy(dtype=np.float64, na_value=np.nan)
        zv = z.to_numpy(dtype=np.float64, na_value=np.nan)
        if input_units == "deg" and not inverse:
            xv = np.radians(xv)
            yv = np.radians(yv)
        if errors == "strict":
            ox, oy, oz = t._run3(xv, yv, zv, forward=not inverse,
                                 errors="strict")
            err = np.full(len(ox), None, dtype=object)
        else:
            ox, oy, oz, err = t._run3(xv, yv, zv, forward=not inverse,
                                      errors="mask")
        if input_units == "deg" and inverse:
            ox = np.degrees(ox)
            oy = np.degrees(oy)
        return pd.DataFrame({"x": ox, "y": oy, "z": oz, "err": err})

    return _udf


def with_transformed(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    x_col: str = "lon",
    y_col: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
    err_col: Optional[str] = "proj_err",
    errors: str = "mask",
    **options,
) -> DataFrame:
    """Append transformed coordinate columns to ``df`` (the engine's
    ``with_transformed`` operator, SURVEY.md §2.2 projections row).

    One extra struct column is produced then unpacked — Catalyst prunes
    the struct away, so the physical plan is scan -> ArrowEvalPython ->
    project with no shuffle.
    """
    udf = proj_udf(src_crs, dst_crs, errors=errors, **options)
    tmp = f"__proj_{out_x}_{out_y}"
    df = df.withColumn(tmp, udf(F.col(x_col).cast("double"),
                                F.col(y_col).cast("double")))
    df = df.withColumn(out_x, F.col(f"{tmp}.x")).withColumn(
        out_y, F.col(f"{tmp}.y"))
    if err_col is not None:
        df = df.withColumn(err_col, F.col(f"{tmp}.err"))
    return df.drop(tmp)


def transform_crs_to_crs(
    df: DataFrame,
    src_crs: str,
    dst_crs: str,
    x_col: str = "lon",
    y_col: str = "lat",
    **kwargs,
) -> DataFrame:
    """One-shot convenience mirroring the reference's
    ``Transform::transform_crs_to_crs`` (O11,
    /root/reference/src/transform.rs:87-124): build the CRS->CRS
    transform and apply it, replacing the coordinate columns."""
    return with_transformed(
        df, src_crs, dst_crs, x_col=x_col, y_col=y_col,
        out_x=x_col, out_y=y_col, **kwargs,
    )
