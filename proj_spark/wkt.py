"""WKT / PROJJSON export writers.

Reference parity target: ``Proj::as_wkt`` with the six ``WktVersion``
dialects (/root/reference/src/proj.rs:1310-1377, 1446-1453) and
``Proj::to_projjson`` (src/proj.rs:1280-1308).  The writers are
structural: every element (datum/ensemble, ellipsoid, prime meridian,
conversion method + EPSG parameter codes, CS/axes, usage, ids) is
generated from the registry entry — only the EPSG:4326 WKT2:2019
ensemble matches libproj byte-for-byte (golden-tested); other CRS are
engine-canonical strings with the correct WKT2/WKT1 structure and EPSG
codes, since the engine does not embed the full EPSG name database.

Dialects:
  * WKT2_2019 (default) — GEOGCRS/PROJCRS, USAGE[SCOPE,AREA,BBOX],
    datum ensembles;
  * WKT2_2015 — GEODCRS keyword, plain DATUM (no ensembles),
    SCOPE/AREA/BBOX un-wrapped;
  * WKT2_2019_SIMPLIFIED / WKT2_2015_SIMPLIFIED — ORDER[], USAGE and
    nested ID[] elements dropped (top-level ID kept);
  * WKT1_GDAL — PROJCS/GEOGCS with underscored datum names, TOWGS84,
    AUTHORITY elements;
  * WKT1_ESRI — ESRI-style GCS_/D_ naming, no AUTHORITY.

``multiline=True`` renders libproj's 4-space-indented style (every
nested element on its own line); ``False`` is the compact single-line
form.
"""

from __future__ import annotations

import math
from typing import Optional

from . import kernels as K

__all__ = ["WKT_VERSIONS", "to_wkt", "to_projjson_dict"]

WKT_VERSIONS = (
    "WKT2_2019", "WKT2_2015", "WKT2_2019_SIMPLIFIED", "WKT2_2015_SIMPLIFIED",
    "WKT1_GDAL", "WKT1_ESRI",
)

# canonical EPSG ellipsoid names / codes / inverse flattenings
_ELLPS = {
    "WGS84": ("WGS 84", 7030, 6378137.0, 298.257223563),
    "GRS80": ("GRS 1980", 7019, 6378137.0, 298.257222101),
    "clrk66": ("Clarke 1866", 7008, 6378206.4, 294.978698213898),
    "airy": ("Airy 1830", 7001, 6377563.396, 299.3249646),
    "krass": ("Krassowsky 1940", 7024, 6378245.0, 298.3),
    "bessel": ("Bessel 1841", 7004, 6377397.155, 299.1528128),
    "evrstSS": ("Everest 1830 (1967 Definition)", 7016,
                6377298.556, 300.8017),
    "intl": ("International 1924", 7022, 6378388.0, 297.0),
    "sphere": ("Clarke 1866 Authalic Sphere", 7052, 6370997.0, 0.0),
}

_UNITS = {
    "m": ("metre", 1.0, 9001),
    "us-ft": ("US survey foot", 0.304800609601219, 9003),
    "deg": ("degree", 0.0174532925199433, 9122),
}

# EPSG scopes for the main registry codes (public EPSG data); others
# report "unknown" like libproj does for scope-less objects
_SCOPES = {
    "EPSG:4326": "Horizontal component of 3D system.",
    "EPSG:2230": "Engineering survey, topographic mapping.",
    "EPSG:26946": "Engineering survey, topographic mapping.",
    "EPSG:3857": "Web mapping and visualisation.",
}

# WGS84 ensemble member names (EPSG datum ensemble 6326)
_WGS84_MEMBERS = (
    "World Geodetic System 1984 (Transit)",
    "World Geodetic System 1984 (G730)",
    "World Geodetic System 1984 (G873)",
    "World Geodetic System 1984 (G1150)",
    "World Geodetic System 1984 (G1674)",
    "World Geodetic System 1984 (G1762)",
    "World Geodetic System 1984 (G2139)",
    "World Geodetic System 1984 (G2296)",
)
_ETRS89_MEMBERS = ("ETRF89", "ETRF90", "ETRF91", "ETRF92", "ETRF93",
                   "ETRF94", "ETRF96", "ETRF97", "ETRF2000", "ETRF2005",
                   "ETRF2014", "ETRF2020")

# projection method registry: proj name -> WKT2 method (name, EPSG code),
# WKT1-GDAL / ESRI projection names, ordered parameter list
# (proj_key, wkt2_name, epsg_code, gdal_name, esri_name, kind, default)
_P_ANG, _P_LEN, _P_SCALE = "angle", "length", "scale"
_METHODS = {
    "lcc": ("Lambert Conic Conformal (2SP)", 9802,
            "Lambert_Conformal_Conic_2SP", "Lambert_Conformal_Conic", [
        ("lat_0", "Latitude of false origin", 8821,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of false origin", 8822,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("lat_1", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("lat_2", "Latitude of 2nd standard parallel", 8824,
         "standard_parallel_2", "Standard_Parallel_2", _P_ANG, None),
        ("x_0", "Easting at false origin", 8826,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "Northing at false origin", 8827,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "tmerc": ("Transverse Mercator", 9807,
              "Transverse_Mercator", "Transverse_Mercator", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("k", "Scale factor at natural origin", 8805,
         "scale_factor", "Scale_Factor", _P_SCALE, 1.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "merc": ("Mercator (variant B)", 9805, "Mercator_2SP", "Mercator", [
        ("lat_ts", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "webmerc": ("Popular Visualisation Pseudo Mercator", 1024,
                "Mercator_1SP", "Mercator_Auxiliary_Sphere", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "sterea": ("Oblique Stereographic", 9809,
               "Oblique_Stereographic", "Double_Stereographic", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("k", "Scale factor at natural origin", 8805,
         "scale_factor", "Scale_Factor", _P_SCALE, 1.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "aea": ("Albers Equal Area", 9822,
            "Albers_Conic_Equal_Area", "Albers", [
        ("lat_0", "Latitude of false origin", 8821,
         "latitude_of_center", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of false origin", 8822,
         "longitude_of_center", "Central_Meridian", _P_ANG, 0.0),
        ("lat_1", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("lat_2", "Latitude of 2nd standard parallel", 8824,
         "standard_parallel_2", "Standard_Parallel_2", _P_ANG, None),
        ("x_0", "Easting at false origin", 8826,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "Northing at false origin", 8827,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "laea": ("Lambert Azimuthal Equal Area", 9820,
             "Lambert_Azimuthal_Equal_Area", "Lambert_Azimuthal_Equal_Area", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_center", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "longitude_of_center", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "eqc": ("Equidistant Cylindrical", 1028,
            "Equirectangular", "Equidistant_Cylindrical", [
        ("lat_ts", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, 0.0),
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "cea": ("Lambert Cylindrical Equal Area", 9835,
            "Cylindrical_Equal_Area", "Cylindrical_Equal_Area", [
        ("lat_ts", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "stere": ("Polar Stereographic (variant B)", 9829,
              "Polar_Stereographic", "Stereographic", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lat_ts", "Latitude of standard parallel", 8832,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("k", "Scale factor at natural origin", 8805,
         "scale_factor", "Scale_Factor", _P_SCALE, None),
        ("lon_0", "Longitude of origin", 8833,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "krovak": ("Krovak (North Orientated)", 1041, "Krovak", "Krovak", [
        ("lat_0", "Latitude of projection centre", 8811,
         "latitude_of_center", "Latitude_Of_Center", _P_ANG, 49.5),
        ("lon_0", "Longitude of origin", 8833,
         "longitude_of_center", "Longitude_Of_Center", _P_ANG, 0.0),
        ("alpha", "Co-latitude of cone axis", 1036,
         "azimuth", "Azimuth", _P_ANG, 30.28813972222222),
        ("k", "Scale factor on pseudo standard parallel", 8819,
         "scale_factor", "Scale_Factor", _P_SCALE, 0.9999),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "poly": ("American Polyconic", 9818,
             "American_Polyconic", "Polyconic", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_natural_origin", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "longitude_of_natural_origin", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "nzmg": ("New Zealand Map Grid", 9811,
             "New_Zealand_Map_Grid", "New_Zealand_Map_Grid", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_natural_origin", "Latitude_Of_Origin", _P_ANG, -41.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "longitude_of_natural_origin", "Central_Meridian", _P_ANG, 173.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 2510000.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 6023150.0),
    ]),
    "sinu": ("Sinusoidal", 0,  # no EPSG method code (ESRI/IOGP informal)
             "Sinusoidal", "Sinusoidal", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "aeqd": ("Modified Azimuthal Equidistant", 9832,
             "Azimuthal_Equidistant", "Azimuthal_Equidistant", [
        ("lat_0", "Latitude of natural origin", 8801,
         "latitude_of_center", "Latitude_Of_Center", _P_ANG, 0.0),
        ("lon_0", "Longitude of natural origin", 8802,
         "longitude_of_center", "Longitude_Of_Center", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "moll": ("Mollweide", 0,  # no EPSG method code (ESRI/IOGP informal)
             "Mollweide", "Mollweide", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "eqearth": ("Equal Earth", 1078, "Equal_Earth", "Equal_Earth", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "gall": ("Gall Stereographic", 0,  # no EPSG method code
             "Gall_Stereographic", "Gall_Stereographic", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "aitoff": ("Aitoff", 0,  # no EPSG method code
               "Aitoff", "Aitoff", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "eck6": ("Eckert VI", 0,  # no EPSG method code
             "Eckert_VI", "Eckert_VI", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "bonne": ("Bonne", 9827, "Bonne", "Bonne", [
        ("lat_1", "Latitude of natural origin", 8801,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "eqdc": ("Equidistant Conic", 1119,
             "Equidistant_Conic", "Equidistant_Conic", [
        ("lat_0", "Latitude of false origin", 8821,
         "latitude_of_center", "Latitude_Of_Origin", _P_ANG, 0.0),
        ("lon_0", "Longitude of false origin", 8822,
         "longitude_of_center", "Central_Meridian", _P_ANG, 0.0),
        ("lat_1", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("lat_2", "Latitude of 2nd standard parallel", 8824,
         "standard_parallel_2", "Standard_Parallel_2", _P_ANG, None),
        ("x_0", "Easting at false origin", 8826,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "Northing at false origin", 8827,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "wintri": ("Winkel Tripel", 0,  # no EPSG method code
               "Winkel_Tripel", "Winkel_Tripel", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("lat_1", "Latitude of 1st standard parallel", 8823,
         "standard_parallel_1", "Standard_Parallel_1", _P_ANG, None),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "hammer": ("Hammer Aitoff", 0,  # no EPSG method code
               "Hammer_Aitoff", "Hammer_Aitoff", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "vandg": ("Van der Grinten", 0,  # no EPSG method code
              "VanDerGrinten", "Van_der_Grinten_I", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "igh": ("Interrupted Goode Homolosine", 0,  # no EPSG method code
            "Interrupted_Goode_Homolosine", "Interrupted_Goode_Homolosine", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "mill": ("Miller Cylindrical", 0,  # no EPSG method code
             "Miller_Cylindrical", "Miller_Cylindrical", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "natearth": ("Natural Earth", 0,  # no EPSG method code
                 "Natural_Earth", "Natural_Earth", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "eck4": ("Eckert IV", 0,  # no EPSG method code
             "Eckert_IV", "Eckert_IV", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "robin": ("Robinson", 0,  # no EPSG method code (ESRI/IOGP informal)
              "Robinson", "Robinson", [
        ("lon_0", "Longitude of natural origin", 8802,
         "central_meridian", "Central_Meridian", _P_ANG, 0.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    # Hotine Oblique Mercator.  Two EPSG methods share the kernel:
    # variant B (9815, false grid offsets at the projection centre) is
    # the "omerc" key; variant A (9812, offsets at the natural origin,
    # proj-string +no_uoff) the synthetic "omerc_a" key mapped in
    # _model / wkt_parse.  somerc (Swiss) is re-expressed as 9815 with
    # a 90 deg azimuth (EPSG conversion 19950's own definition).
    "omerc": ("Hotine Oblique Mercator (variant B)", 9815,
              "Hotine_Oblique_Mercator_Azimuth_Center",
              "Hotine_Oblique_Mercator_Azimuth_Center", [
        ("lat_0", "Latitude of projection centre", 8811,
         "latitude_of_center", "Latitude_Of_Center", _P_ANG, 0.0),
        ("lonc", "Longitude of projection centre", 8812,
         "longitude_of_center", "Longitude_Of_Center", _P_ANG, 0.0),
        ("alpha", "Azimuth of initial line", 8813,
         "azimuth", "Azimuth", _P_ANG, 0.0),
        ("gamma", "Angle from Rectified to Skew Grid", 8814,
         "rectified_grid_angle", "Rectified_Grid_Angle", _P_ANG, None),
        ("k", "Scale factor on initial line", 8815,
         "scale_factor", "Scale_Factor", _P_SCALE, 1.0),
        ("x_0", "Easting at projection centre", 8816,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "Northing at projection centre", 8817,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
    "omerc_a": ("Hotine Oblique Mercator (variant A)", 9812,
                "Hotine_Oblique_Mercator",
                "Hotine_Oblique_Mercator_Azimuth_Natural_Origin", [
        ("lat_0", "Latitude of projection centre", 8811,
         "latitude_of_center", "Latitude_Of_Center", _P_ANG, 0.0),
        ("lonc", "Longitude of projection centre", 8812,
         "longitude_of_center", "Longitude_Of_Center", _P_ANG, 0.0),
        ("alpha", "Azimuth of initial line", 8813,
         "azimuth", "Azimuth", _P_ANG, 0.0),
        ("gamma", "Angle from Rectified to Skew Grid", 8814,
         "rectified_grid_angle", "Rectified_Grid_Angle", _P_ANG, None),
        ("k", "Scale factor on initial line", 8815,
         "scale_factor", "Scale_Factor", _P_SCALE, 1.0),
        ("x_0", "False easting", 8806,
         "false_easting", "False_Easting", _P_LEN, 0.0),
        ("y_0", "False northing", 8807,
         "false_northing", "False_Northing", _P_LEN, 0.0),
    ]),
}


class _Node:
    __slots__ = ("kw", "vals")

    def __init__(self, kw, *vals):
        self.kw = kw
        self.vals = [v for v in vals if v is not None]


def _q(s: str) -> str:
    return '"' + str(s).replace('"', '""') + '"'


def _n(v) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return f"{f:.15g}"


def _render(node: _Node, multiline: bool, indent: int = 0) -> str:
    s = node.kw + "["
    for i, v in enumerate(node.vals):
        if i:
            s += ","
        if isinstance(v, _Node):
            txt = _render(v, multiline, indent + 1)
            if multiline:
                s += "\n" + "    " * (indent + 1) + txt
            else:
                s += txt
        else:
            s += v
    return s + "]"


def _strip_for_simplified(node: _Node, depth: int = 0) -> Optional[_Node]:
    """Simplified WKT2: drop ORDER[], USAGE[] and nested ID[] elements
    (the root CRS keeps its own ID child)."""
    if node.kw == "ORDER" or node.kw == "USAGE":
        return None
    if node.kw == "ID" and depth > 1:
        return None
    out = _Node(node.kw)
    for v in node.vals:
        if isinstance(v, _Node):
            child = _strip_for_simplified(v, depth + 1)
            if child is not None:
                out.vals.append(child)
        else:
            out.vals.append(v)
    return out


# ---------------------------------------------------------------------------
# model extraction
# ---------------------------------------------------------------------------
def _model(entry):
    from .crs import parse_proj_string

    ell_name, ell_code, a, rf = _ELLPS[entry.datum_ellps]
    params = parse_proj_string(entry.proj)[0]
    proj = params.get("proj")
    if proj == "utm":
        zone = int(params["zone"])
        south = "south" in params
        params = {
            "proj": "tmerc", "lat_0": 0.0, "lon_0": zone * 6 - 183,
            "k": 0.9996, "x_0": 500000.0,
            "y_0": 10000000.0 if south else 0.0,
        }
        proj = "tmerc"
    if proj == "somerc":
        # Swiss Oblique Mercator is published by EPSG as Hotine
        # variant B (9815) with a 90 deg azimuth (conversion 19950)
        params = dict(params)
        params["proj"] = "omerc"
        params.setdefault("lonc", params.get("lon_0", 0.0))
        params.setdefault("alpha", 90.0)
        params.setdefault("gamma", 90.0)
        if "k_0" in params and "k" not in params:
            params["k"] = params["k_0"]
        proj = "omerc"
    if proj == "omerc" and (params.get("no_uoff") or params.get("no_off")):
        proj = "omerc_a"  # EPSG 9812: offsets at the natural origin
    unit = _UNITS[entry.unit if entry.kind == "projected" else "deg"]
    datum_name = entry.datum_name or f"Unknown datum based upon the {ell_name} ellipsoid"
    is_ensemble = datum_name.endswith("ensemble")
    members = ()
    if is_ensemble:
        members = (_WGS84_MEMBERS if "World Geodetic" in datum_name
                   else _ETRS89_MEMBERS)
    return {
        "entry": entry,
        "ellipsoid": (ell_name, ell_code, a, rf),
        "proj": proj,
        "params": params,
        "unit": unit,
        "datum_name": datum_name,
        "is_ensemble": is_ensemble,
        "members": members,
        "scope": _SCOPES.get(entry.code, "unknown"),
    }


def _param_value(m, p_key, kind, default):
    raw = m["params"].get(p_key, default)
    if raw is None:
        raise KeyError(p_key)
    v = float(raw)
    if kind == _P_LEN and m["entry"].unit != "m":
        v = v / _UNITS[m["entry"].unit][1]
    return v


def _iter_params(m):
    _, _, _, _, plist = _METHODS[m["proj"]]
    for p_key, w2, code, gdal, esri, kind, default in plist:
        try:
            v = _param_value(m, p_key, kind, default)
        except KeyError:
            continue
        yield p_key, w2, code, gdal, esri, kind, v


# ---------------------------------------------------------------------------
# WKT2
# ---------------------------------------------------------------------------
def _angleunit() -> _Node:
    return _Node("ANGLEUNIT", _q("degree"), "0.0174532925199433")


def _lengthunit(unit) -> _Node:
    return _Node("LENGTHUNIT", _q(unit[0]), _n(unit[1]))


def _ellipsoid_node(m) -> _Node:
    name, _, a, rf = m["ellipsoid"]
    return _Node("ELLIPSOID", _q(name), _n(a), _n(rf),
                 _lengthunit(_UNITS["m"]))


def _datum_node(m, v2019: bool) -> _Node:
    if m["is_ensemble"] and v2019:
        node = _Node("ENSEMBLE", _q(m["datum_name"]))
        for member in m["members"]:
            node.vals.append(_Node("MEMBER", _q(member)))
        node.vals.append(_ellipsoid_node(m))
        node.vals.append(_Node("ENSEMBLEACCURACY", "2.0"
                               if "World Geodetic" in m["datum_name"]
                               else "0.1"))
        return node
    name = m["datum_name"]
    if name.endswith(" ensemble"):
        name = name[: -len(" ensemble")]
    return _Node("DATUM", _q(name), _ellipsoid_node(m))


def _primem() -> _Node:
    return _Node("PRIMEM", _q("Greenwich"), "0", _angleunit())


def _geog_cs_axes(m) -> list:
    lat = _Node("AXIS", _q("geodetic latitude (Lat)"), "north",
                _Node("ORDER", "1"), _angleunit())
    lon = _Node("AXIS", _q("geodetic longitude (Lon)"), "east",
                _Node("ORDER", "2"), _angleunit())
    first, second = ((lat, lon) if m["entry"].axis_order == "ne" else (lon, lat))
    if m["entry"].axis_order == "en":
        first = _Node("AXIS", _q("geodetic longitude (Lon)"), "east",
                      _Node("ORDER", "1"), _angleunit())
        second = _Node("AXIS", _q("geodetic latitude (Lat)"), "north",
                       _Node("ORDER", "2"), _angleunit())
    if m["entry"].kind == "geographic3d":
        h = _Node("AXIS", _q("ellipsoidal height (h)"), "up",
                  _Node("ORDER", "3"),
                  _Node("LENGTHUNIT", _q("metre"), "1"))
        return [_Node("CS", "ellipsoidal", "3"), first, second, h]
    return [_Node("CS", "ellipsoidal", "2"), first, second]


def _proj_cs_axes(m) -> list:
    u = _lengthunit(m["unit"])
    e = _Node("AXIS", _q("easting (E)"), "east", _Node("ORDER", "1"), u)
    n = _Node("AXIS", _q("northing (N)"), "north", _Node("ORDER", "2"),
              _lengthunit(m["unit"]))
    return [_Node("CS", "Cartesian", "2"), e, n]


def _usage_nodes(m, v2019: bool) -> list:
    entry = m["entry"]
    inner = [_Node("SCOPE", _q(m["scope"]))]
    if entry.area is not None:
        inner.append(_Node("AREA", _q(entry.area_name or "unknown")))
        inner.append(_Node("BBOX", _n(entry.area.south), _n(entry.area.west),
                           _n(entry.area.north), _n(entry.area.east)))
    if v2019:
        return [_Node("USAGE", *inner)]
    return inner


def _id_node(code: str) -> _Node:
    auth, _, num = code.partition(":")
    return _Node("ID", _q(auth), num if num.isdigit() else _q(num))


def _geogcrs_node(m, v2019: bool, kw: Optional[str] = None,
                  with_usage: bool = True) -> _Node:
    entry = m["entry"]
    kw = kw or ("GEOGCRS" if v2019 else "GEODCRS")
    node = _Node(kw, _q(entry.name), _datum_node(m, v2019), _primem())
    node.vals.extend(_geog_cs_axes(m))
    if with_usage:
        node.vals.extend(_usage_nodes(m, v2019))
    node.vals.append(_id_node(entry.code))
    return node


def _conversion_node(m) -> _Node:
    w2_name, w2_code, _, _, _ = _METHODS[m["proj"]]
    method = _Node("METHOD", _q(w2_name))
    if w2_code:
        method.vals.append(_Node("ID", _q("EPSG"), str(w2_code)))
    conv = _Node("CONVERSION", _q(m["entry"].name), method)
    for _, w2, code, _, _, kind, v in _iter_params(m):
        unit = (_angleunit() if kind == _P_ANG
                else _lengthunit(m["unit"]) if kind == _P_LEN
                else _Node("SCALEUNIT", _q("unity"), "1"))
        conv.vals.append(_Node("PARAMETER", _q(w2), _n(v), unit,
                               _Node("ID", _q("EPSG"), str(code))))
    return conv


def _projcrs_node(m, v2019: bool) -> _Node:
    from .crs import resolve_crs

    entry = m["entry"]
    if entry.base_geog:
        base_m = _model(resolve_crs(entry.base_geog))
    else:
        base_m = dict(m, entry=entry)
    base_kw = "BASEGEOGCRS" if v2019 else "BASEGEODCRS"
    base = _Node(base_kw, _q(entry.base_geog_name or base_m["datum_name"]),
                 _datum_node(base_m, v2019), _primem())
    if entry.base_geog:
        base.vals.append(_id_node(entry.base_geog))
    node = _Node("PROJCRS", _q(entry.name), base, _conversion_node(m))
    node.vals.extend(_proj_cs_axes(m))
    node.vals.extend(_usage_nodes(m, v2019))
    node.vals.append(_id_node(entry.code))
    return node


# ---------------------------------------------------------------------------
# WKT1
# ---------------------------------------------------------------------------
def _auth(code, num=None) -> _Node:
    if num is None:
        auth, _, num = str(code).partition(":")
    else:
        auth = "EPSG"
    return _Node("AUTHORITY", _q(auth), _q(num))


def _wkt1_geogcs(m, esri: bool) -> _Node:
    entry = m["entry"]
    ell_name, ell_code, a, rf = m["ellipsoid"]
    datum_name = m["datum_name"]
    if datum_name.endswith(" ensemble"):
        datum_name = datum_name[: -len(" ensemble")]
    if esri:
        name = "GCS_" + (entry.base_geog_name or entry.name).replace(" ", "_")
        datum = _Node("DATUM", _q("D_" + datum_name.replace(" ", "_")),
                      _Node("SPHEROID", _q(ell_name.replace(" ", "_")),
                            _n(a), _n(rf)))
        return _Node("GEOGCS", _q(name), datum,
                     _Node("PRIMEM", _q("Greenwich"), "0.0"),
                     _Node("UNIT", _q("Degree"), "0.0174532925199433"))
    datum = _Node("DATUM", _q(datum_name.replace(" ", "_")),
                  _Node("SPHEROID", _q(ell_name), _n(a), _n(rf),
                        _auth(None, str(ell_code))))
    if entry.towgs84 is not None:
        tw = list(entry.towgs84) + [0.0] * (7 - len(entry.towgs84))
        datum.vals.append(_Node("TOWGS84", *[_n(v) for v in tw]))
    if entry.datum_code:
        datum.vals.append(_auth(None, str(entry.datum_code)))
    geog_code = entry.base_geog if entry.kind == "projected" else entry.code
    node = _Node("GEOGCS", _q(entry.base_geog_name or entry.name), datum,
                 _Node("PRIMEM", _q("Greenwich"), "0",
                       _auth(None, "8901")),
                 _Node("UNIT", _q("degree"), "0.0174532925199433",
                       _auth(None, "9122")))
    if geog_code:
        node.vals.append(_auth(geog_code))
    return node


def _wkt1_node(m, esri: bool) -> _Node:
    entry = m["entry"]
    geogcs = _wkt1_geogcs(m, esri)
    if entry.kind in ("geographic", "geographic3d"):
        return geogcs
    _, _, gdal_name, esri_name, _ = _METHODS[m["proj"]]
    name = (entry.name.replace(" / ", "_").replace(" ", "_")
            if esri else entry.name)
    node = _Node("PROJCS", _q(name), geogcs,
                 _Node("PROJECTION", _q(esri_name if esri else gdal_name)))
    for _, _, _, gdal, esri_p, kind, v in _iter_params(m):
        pname = esri_p if esri else gdal
        node.vals.append(_Node("PARAMETER", _q(pname),
                               _n(v) if not esri else f"{float(v):.15g}"))
    uname, ufac, ucode = m["unit"]
    if esri:
        # ESRI prints the full-precision factor (1200/3937), not the
        # 15-digit WKT2 rendering
        if uname == "US survey foot":
            uname, ufac = "Foot_US", 1200.0 / 3937.0
        elif uname == "metre":
            uname = "Meter"
        node.vals.append(_Node("UNIT", _q(uname), f"{ufac:.16g}"))
    else:
        node.vals.append(_Node("UNIT", _q(uname), _n(ufac),
                               _auth(None, str(ucode))))
        node.vals.append(_Node("AXIS", _q("Easting"), "EAST"))
        node.vals.append(_Node("AXIS", _q("Northing"), "NORTH"))
        node.vals.append(_auth(entry.code))
    return node


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------
def _vertcrs_node(entry, v2019: bool) -> _Node:
    kids = [
        _q(entry.name),
        _Node("VDATUM", _q(entry.datum_name)),
        _Node("CS", "vertical", "1"),
        _Node("AXIS", _q("gravity-related height (H)"), "up",
              _Node("LENGTHUNIT", _q("metre"), "1")),
    ]
    kids.extend(_vert_usage(entry, v2019))
    kids.append(_id_node(entry.code))
    return _Node("VERTCRS", *kids)


def _vert_usage(entry, v2019: bool) -> list:
    # mirrors _usage_nodes but from the entry alone (no projection model)
    if entry.area is None:
        return []
    a = entry.area
    area = _Node("AREA", _q(entry.area_name or "unknown"))
    bbox = _Node("BBOX", _n(a.south), _n(a.west), _n(a.north), _n(a.east))
    scope = _Node("SCOPE", _q(_SCOPES.get(entry.code, "unknown")))
    if v2019:
        return [_Node("USAGE", scope, area, bbox)]
    return [scope, area, bbox]


def _wkt1_vert_node(entry) -> _Node:
    return _Node(
        "VERT_CS", _q(entry.name),
        _Node("VERT_DATUM", _q(entry.datum_name), "2005",
              _Node("AUTHORITY", _q("EPSG"), _q(str(entry.datum_code)))),
        _Node("UNIT", _q("metre"), "1"),
        _Node("AXIS", _q("Gravity-related height"), "UP"),
        _Node("AUTHORITY", _q("EPSG"),
              _q(entry.code.partition(":")[2])),
    )


def _compound_node(entry, version: str, multiline: bool):
    """COMPOUNDCRS (WKT2) / COMPD_CS (WKT1): render both members with
    the same dialect and wrap them."""
    from .crs import resolve_crs

    horiz = resolve_crs(entry.members[0])
    vert = resolve_crs(entry.members[1])
    v2019 = "2019" in version
    if version.startswith("WKT1"):
        hm = _model(horiz)
        hnode = _wkt1_node(hm, esri=(version == "WKT1_ESRI"))
        vnode = _wkt1_vert_node(vert)
        return _Node("COMPD_CS", _q(entry.name), hnode, vnode,
                     _Node("AUTHORITY", _q("EPSG"),
                           _q(entry.code.partition(":")[2])))
    hm = _model(horiz)
    hnode = (_geogcrs_node(hm, v2019)
             if horiz.kind in ("geographic", "geographic3d")
             else _projcrs_node(hm, v2019))
    vnode = _vertcrs_node(vert, v2019)
    kids = [_q(entry.name), hnode, vnode]
    kids.extend(_vert_usage(entry, v2019))
    kids.append(_id_node(entry.code))
    return _Node("COMPOUNDCRS", *kids)


def to_wkt(entry, version: str = "WKT2_2019", multiline: bool = True) -> str:
    version = version.upper()
    if version not in WKT_VERSIONS:
        raise ValueError(f"unknown WKT version {version!r}; one of {WKT_VERSIONS}")
    if entry.kind == "vertical":
        if version.startswith("WKT1"):
            return _render(_wkt1_vert_node(entry), multiline)
        node = _vertcrs_node(entry, "2019" in version)
        if version.endswith("_SIMPLIFIED"):
            node = _strip_for_simplified(node)
        return _render(node, multiline)
    if entry.kind == "compound":
        node = _compound_node(entry, version, multiline)
        if version.endswith("_SIMPLIFIED"):
            node = _strip_for_simplified(node)
        return _render(node, multiline)
    m = _model(entry)
    if version.startswith("WKT1"):
        node = _wkt1_node(m, esri=(version == "WKT1_ESRI"))
        return _render(node, multiline)
    v2019 = "2019" in version
    if entry.kind in ("geographic", "geographic3d"):
        node = _geogcrs_node(m, v2019)
    else:
        node = _projcrs_node(m, v2019)
    if version.endswith("_SIMPLIFIED"):
        node = _strip_for_simplified(node)
    return _render(node, multiline)


def _unit_json(kind, m):
    if kind == _P_ANG:
        return "degree"
    if kind == _P_SCALE:
        return "unity"
    name, fac, _ = m["unit"]
    if name == "metre":
        return "metre"
    return {"type": "LinearUnit", "name": name, "conversion_factor": fac}


def _id_json(code: str) -> dict:
    auth, _, num = code.partition(":")
    return {"authority": auth, "code": int(num) if num.isdigit() else num}


def _geog_json(m, with_id: bool = True) -> dict:
    entry = m["entry"]
    name, _, a, rf = m["ellipsoid"]
    ell = {"name": name, "semi_major_axis": a, "inverse_flattening": rf}
    obj: dict = {"name": entry.base_geog_name or entry.name}
    datum_name = m["datum_name"]
    if m["is_ensemble"]:
        obj["datum_ensemble"] = {
            "name": datum_name,
            "members": [{"name": n} for n in m["members"]],
            "ellipsoid": ell,
            "accuracy": "2.0" if "World Geodetic" in datum_name else "0.1",
        }
    else:
        obj["datum"] = {
            "type": "GeodeticReferenceFrame",
            "name": datum_name,
            "ellipsoid": ell,
        }
    lat_ax = {"name": "Geodetic latitude", "abbreviation": "Lat",
              "direction": "north", "unit": "degree"}
    lon_ax = {"name": "Geodetic longitude", "abbreviation": "Lon",
              "direction": "east", "unit": "degree"}
    axes = [lat_ax, lon_ax] if entry.axis_order == "ne" else [lon_ax, lat_ax]
    obj["coordinate_system"] = {"subtype": "ellipsoidal", "axis": axes}
    if with_id:
        code = entry.base_geog if entry.kind == "projected" else entry.code
        if code:
            obj["id"] = _id_json(code)
    return obj


def _vert_json(entry) -> dict:
    return {
        "type": "VerticalCRS",
        "name": entry.name,
        "datum": {"type": "VerticalReferenceFrame",
                  "name": entry.datum_name},
        "coordinate_system": {
            "subtype": "vertical",
            "axis": [{"name": "Gravity-related height",
                      "abbreviation": "H", "direction": "up",
                      "unit": "metre"}],
        },
        "id": _id_json(entry.code),
    }


def to_projjson_dict(entry, schema: str) -> dict:
    """Full PROJJSON CRS description (datum/ensemble, ellipsoid, CS,
    conversion with EPSG method/parameter codes, scope/area/bbox, id)."""
    if entry.kind == "vertical":
        obj = {"$schema": schema}
        obj.update(_vert_json(entry))
        if entry.area is not None:
            obj["bbox"] = {
                "south_latitude": entry.area.south,
                "west_longitude": entry.area.west,
                "north_latitude": entry.area.north,
                "east_longitude": entry.area.east,
            }
        return obj
    if entry.kind == "compound":
        from .crs import resolve_crs

        horiz = resolve_crs(entry.members[0])
        vert = resolve_crs(entry.members[1])
        h_json = to_projjson_dict(horiz, schema)
        h_json.pop("$schema", None)
        return {
            "$schema": schema,
            "type": "CompoundCRS",
            "name": entry.name,
            "components": [h_json, _vert_json(vert)],
            "id": _id_json(entry.code),
        }
    m = _model(entry)
    obj = {"$schema": schema}
    if entry.kind in ("geographic", "geographic3d"):
        obj["type"] = "GeographicCRS"
        g = _geog_json(m, with_id=False)
        g.pop("name")
        obj["name"] = entry.name
        obj.update(g)
        if entry.kind == "geographic3d":
            obj["coordinate_system"]["axis"].append(
                {"name": "Ellipsoidal height", "abbreviation": "h",
                 "direction": "up", "unit": "metre"})
    else:
        obj["type"] = "ProjectedCRS"
        obj["name"] = entry.name
        from .crs import resolve_crs

        base_m = _model(resolve_crs(entry.base_geog)) if entry.base_geog else m
        base = _geog_json(dict(base_m, entry=base_m["entry"]))
        if not entry.base_geog:
            base = _geog_json(dict(m, entry=entry))
        base["type"] = "GeographicCRS"
        obj["base_crs"] = base
        w2_name, w2_code, _, _, _ = _METHODS[m["proj"]]
        method = {"name": w2_name}
        if w2_code:
            method["id"] = {"authority": "EPSG", "code": w2_code}
        obj["conversion"] = {
            "name": entry.name,
            "method": method,
            "parameters": [
                {"name": w2, "value": v, "unit": _unit_json(kind, m),
                 "id": {"authority": "EPSG", "code": code}}
                for _, w2, code, _, _, kind, v in _iter_params(m)
            ],
        }
        uname, ufac, _ = m["unit"]
        unit = "metre" if uname == "metre" else {
            "type": "LinearUnit", "name": uname, "conversion_factor": ufac}
        obj["coordinate_system"] = {
            "subtype": "Cartesian",
            "axis": [
                {"name": "Easting", "abbreviation": "E",
                 "direction": "east", "unit": unit},
                {"name": "Northing", "abbreviation": "N",
                 "direction": "north", "unit": unit},
            ],
        }
    obj["scope"] = m["scope"]
    if entry.area is not None:
        obj["area"] = entry.area_name or "unknown"
        obj["bbox"] = {
            "south_latitude": entry.area.south,
            "west_longitude": entry.area.west,
            "north_latitude": entry.area.north,
            "east_longitude": entry.area.east,
        }
    obj["id"] = _id_json(entry.code)
    return obj
