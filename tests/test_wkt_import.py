"""WKT / PROJJSON import (round-2 verdict ask #4): the construction
path must accept WKT strings like the reference's proj_create does
(/root/reference/src/proj.rs:679-685), at minimum round-tripping every
registry entry's own as_wkt output in every dialect."""

import math

import pytest

from proj_spark.crs import (ComparisonCriterion, ProjCreateError, Transform,
                            registry_codes)
from proj_spark.wkt import WKT_VERSIONS


def test_wkt_roundtrip_every_registry_code_every_dialect():
    from proj_spark.crs import resolve_crs

    for code in registry_codes():
        t = Transform.new(code)
        entry = resolve_crs(code)
        for ver in WKT_VERSIONS:
            for ml in (True, False):
                t2 = Transform.new(t.as_wkt(ver, multiline=ml))
                if entry.kind == "geographic3d" and ver == "WKT1_ESRI":
                    # WKT1 cannot express a 3D geographic CRS and the
                    # ESRI dialect carries no identifiers: the export
                    # demotes to the 2D horizontal base (GDAL's WKT1
                    # morphing does the same)
                    assert t2._src.kind == "geographic", (code, ver)
                    continue
                assert t2.equivalent_to(t, ComparisonCriterion.Equivalent), \
                    (code, ver, ml)
                if "ESRI" not in ver:  # ESRI WKT carries no ids
                    assert t2.equivalent_to(t, ComparisonCriterion.Strict), \
                        (code, ver, ml)


def test_projjson_roundtrip():
    for code in ("EPSG:4326", "EPSG:2230", "EPSG:3857", "ESRI:54009"):
        t = Transform.new(code)
        t2 = Transform.new(t.to_projjson())
        assert t2.equivalent_to(t, ComparisonCriterion.Strict)


def test_new_known_crs_accepts_wkt_specs():
    w1 = Transform.new("EPSG:4326").as_wkt()
    w2 = Transform.new("EPSG:2230").as_wkt("WKT1_GDAL", multiline=False)
    t = Transform.new_known_crs(w1, w2)
    ref = Transform.new_known_crs("EPSG:4326", "EPSG:2230")
    x, y = t.convert(-117.2, 33.1)
    xr, yr = ref.convert(-117.2, 33.1)
    assert abs(x - xr) < 1e-9 and abs(y - yr) < 1e-9


_EXTERNAL_LCC = '''PROJCS["My Custom Zone 6",
  GEOGCS["Some NAD83", DATUM["North_American_Datum_1983",
    SPHEROID["GRS 1980", 6378137, 298.257222101]],
    PRIMEM["Greenwich", 0], UNIT["degree", 0.0174532925199433]],
  PROJECTION["Lambert_Conformal_Conic_2SP"],
  PARAMETER["latitude_of_origin", 32.1666666666667],
  PARAMETER["central_meridian", -116.25],
  PARAMETER["standard_parallel_1", 33.8833333333333],
  PARAMETER["standard_parallel_2", 32.7833333333333],
  PARAMETER["false_easting", 2000000],
  PARAMETER["false_northing", 500000],
  UNIT["metre", 1]]'''


def test_external_wkt_structural_reconstruction():
    # no AUTHORITY element, custom names, parens-and-bracket-mixed
    # whitespace: must reconstruct a semantically identical transform
    t_ext = Transform.new(_EXTERNAL_LCC)
    t_ref = Transform.new("EPSG:26946")
    lam, phi = math.radians(-117.2), math.radians(33.1)
    xa, ya = t_ext.project(lam, phi)
    xb, yb = t_ref.project(lam, phi)
    assert abs(xa - xb) < 1e-6 and abs(ya - yb) < 1e-6


def test_external_wkt_usft_lengths_convert_to_meters():
    # WKT lengths are in the CRS unit; the proj string carries meters
    ext = (_EXTERNAL_LCC
           .replace('PARAMETER["false_easting", 2000000]',
                    'PARAMETER["false_easting", 6561666.66700001]')
           .replace('PARAMETER["false_northing", 500000]',
                    'PARAMETER["false_northing", 1640416.66700001]')
           .replace('UNIT["metre", 1]]',
                    'UNIT["US survey foot", 0.304800609601219]]'))
    t_ft = Transform.new(ext)
    t2230 = Transform.new("EPSG:2230")
    lam, phi = math.radians(-117.2), math.radians(33.1)
    xa, ya = t_ft.project(lam, phi)
    xb, yb = t2230.project(lam, phi)
    assert abs(xa - xb) < 1e-4 and abs(ya - yb) < 1e-4


def test_external_wkt2_parens_and_quotes():
    # OGC grammar allows () brackets and "" quote escaping
    t_ref = Transform.new("EPSG:4326")
    wkt = t_ref.as_wkt("WKT2_2019", multiline=False)
    alt = wkt.replace("[", "(").replace("]", ")")
    assert Transform.new(alt).equivalent_to(
        t_ref, ComparisonCriterion.Equivalent)


@pytest.mark.parametrize("bad", [
    'PROJCS["x", GEOGCS["y"]]',              # no datum
    'GEOGCRS["unclosed',                     # lexer error
    '{"name": "no id"}',                     # PROJJSON without id
    'PROJCS["p", GEOGCS["g", DATUM["d", SPHEROID["s", 1, 2]]], '
    'PROJECTION["No_Such_Method"], UNIT["metre", 1]]',
])
def test_wkt_import_error_paths(bad):
    with pytest.raises(ProjCreateError):
        Transform.new(bad)
