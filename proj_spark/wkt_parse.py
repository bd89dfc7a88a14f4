"""WKT (and PROJJSON) CRS IMPORT — the inverse of :mod:`proj_spark.wkt`.

Reference parity: the reference's construction path accepts anything
libproj's ``proj_create`` resolves — PROJ strings, AUTHORITY:CODE,
*WKT strings* and PROJJSON (/root/reference/src/proj.rs:679-685; the
``TryFrom`` surface at :1455-1492 inherits it).  Round 2 exported WKT
(six dialects) but could not read its own output back; this module
closes that gap (round-2 verdict ask #4).

Resolution order for a WKT string:

  1. **ID/AUTHORITY element at the root** -> registry lookup — the
     common round-trip (WKT2 dialects and WKT1_GDAL carry ids);
  2. **registry WKT match** — the string equals (modulo whitespace)
     some registry entry's own export in ANY dialect; catches the
     id-less WKT1_ESRI round-trip exactly;
  3. **structural reconstruction** — external WKT: parse the tree,
     match the ellipsoid by (a, rf), reverse-map the projection method
     and parameter names through the same method registry the writer
     uses, rebuild a proj string, and synthesize a CrsEntry.  The
     result is semantically equivalent (same kernels, same axis/unit
     handling) even when no registry code matches.

The tokenizer accepts both bracket styles (``[]`` / ``()``) and WKT's
doubled-quote escape, per the OGC WKT-CRS grammar.
"""

from __future__ import annotations

import math
from typing import Optional, Union

__all__ = ["WktNode", "parse_wkt", "looks_like_wkt", "wkt_to_entry",
           "projjson_to_entry"]

_WKT_ROOTS = (
    "GEOGCRS", "GEODCRS", "PROJCRS", "GEOGCS", "PROJCS", "GEOCCS",
    "BOUNDCRS", "COMPOUNDCRS", "VERTCRS", "VERT_CS", "COMPD_CS",
)


class WktNode:
    """One ``KEYWORD[...]`` element; ``vals`` holds quoted strings
    (str), numbers (float), bare words (str) and nested WktNodes."""

    __slots__ = ("kw", "vals")

    def __init__(self, kw: str, vals: list):
        self.kw = kw
        self.vals = vals

    def first(self, *kws: str) -> Optional["WktNode"]:
        for v in self.vals:
            if isinstance(v, WktNode) and v.kw in kws:
                return v
        return None

    def all(self, *kws: str) -> list["WktNode"]:
        return [v for v in self.vals if isinstance(v, WktNode) and v.kw in kws]

    def strs(self) -> list[str]:
        return [v for v in self.vals if isinstance(v, str)]

    def nums(self) -> list[float]:
        return [v for v in self.vals if isinstance(v, float)]


def looks_like_wkt(s: str) -> bool:
    s = s.lstrip()
    head = s[:16].upper()
    return any(head.startswith(r) for r in _WKT_ROOTS) and ("[" in s or "(" in s)


def _tokenize(s: str):
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace() or c == ",":
            i += 1
            continue
        if c in "[(":
            yield ("open", "[")
            i += 1
            continue
        if c in "])":
            yield ("close", "]")
            i += 1
            continue
        if c == '"':
            j = i + 1
            buf = []
            while j < n:
                if s[j] == '"':
                    if j + 1 < n and s[j + 1] == '"':
                        buf.append('"')
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            if j >= n:
                raise ValueError("unterminated quoted string in WKT")
            yield ("str", "".join(buf))
            i = j + 1
            continue
        j = i
        while j < n and s[j] not in '[]()",' and not s[j].isspace():
            j += 1
        yield ("word", s[i:j])
        i = j


def parse_wkt(s: str) -> WktNode:
    """Parse a WKT string into a WktNode tree."""
    toks = list(_tokenize(s))
    pos = 0

    def _value():
        nonlocal pos
        kind, val = toks[pos]
        if kind == "str":
            pos += 1
            return val
        if kind == "word":
            # keyword followed by '[' -> nested node; else scalar
            if pos + 1 < len(toks) and toks[pos + 1][0] == "open":
                return _node()
            pos += 1
            try:
                return float(val)
            except ValueError:
                return val
        raise ValueError(f"unexpected WKT token {val!r}")

    def _node():
        nonlocal pos
        kind, kw = toks[pos]
        if kind != "word":
            raise ValueError(f"expected WKT keyword, got {kw!r}")
        pos += 1
        if pos >= len(toks) or toks[pos][0] != "open":
            raise ValueError(f"expected '[' after {kw!r}")
        pos += 1
        vals = []
        while pos < len(toks) and toks[pos][0] != "close":
            vals.append(_value())
        if pos >= len(toks):
            raise ValueError(f"unterminated {kw!r} element")
        pos += 1  # consume ']'
        return WktNode(kw.upper(), vals)

    root = _node()
    if pos != len(toks):
        raise ValueError("trailing content after WKT root element")
    return root


# ---------------------------------------------------------------------------
# entry construction
# ---------------------------------------------------------------------------
def _root_code(node: WktNode) -> Optional[str]:
    idn = node.first("ID", "AUTHORITY")
    if idn is None:
        return None
    parts = idn.strs() + [str(int(v)) for v in idn.nums()]
    if len(parts) < 2:
        return None
    return f"{parts[0]}:{parts[1]}"


_REGISTRY_WKT: dict[str, str] = {}


def _norm(s: str) -> str:
    return "".join(s.split())


def _registry_wkt_match(text: str):
    """Exact (whitespace-normalized) match against every registry
    entry's own export in every dialect — the id-less round-trip path
    (WKT1_ESRI carries no AUTHORITY elements)."""
    from .crs import registry_codes, resolve_crs
    from .wkt import WKT_VERSIONS, to_wkt

    if not _REGISTRY_WKT:
        for code in registry_codes():
            entry = resolve_crs(code)
            for ver in WKT_VERSIONS:
                try:
                    _REGISTRY_WKT.setdefault(
                        _norm(to_wkt(entry, ver, multiline=False)), code)
                except Exception:
                    continue
    code = _REGISTRY_WKT.get(_norm(text))
    if code is None:
        return None
    from .crs import resolve_crs as _r

    return _r(code)


def _match_ellps(a: float, rf: float) -> str:
    from .wkt import _ELLPS

    for key, (_name, _code, a0, rf0) in _ELLPS.items():
        if abs(a - a0) < 1e-3 and abs(rf - rf0) < 1e-6:
            return key
    raise ValueError(f"no registered ellipsoid matches a={a}, 1/f={rf}")


def _parse_datum(datum_node: WktNode):
    """-> (ellps_key, datum_name, towgs84 or None)."""
    ell = datum_node.first("ELLIPSOID", "SPHEROID")
    if ell is None:
        raise ValueError(f"{datum_node.kw} carries no ellipsoid")
    nums = ell.nums()
    ellps = _match_ellps(nums[0], nums[1])
    name = (datum_node.strs() or [""])[0]
    if name.startswith("D_"):
        name = name[2:]
    name = name.replace("_", " ")
    tw = datum_node.first("TOWGS84")
    towgs84 = tuple(tw.nums()) if tw is not None else None
    return ellps, name, towgs84


def _geog_axis_order(node: WktNode) -> str:
    axes = node.all("AXIS")
    if not axes:
        return "en"
    first = axes[0]
    vals = [v.lower() for v in first.strs()]
    return "ne" if any("north" in v or "lat" in v for v in vals) else "en"


def _unit_key(unit_node: Optional[WktNode]) -> str:
    if unit_node is None:
        return "m"
    nums = unit_node.nums()
    fac = nums[0] if nums else 1.0
    if abs(fac - 1.0) < 1e-9:
        return "m"
    if abs(fac - 0.304800609601219) < 1e-9 or abs(fac - 1200.0 / 3937.0) < 1e-9:
        return "us-ft"
    if abs(fac - 0.0174532925199433) < 1e-12:
        return "deg"
    raise ValueError(f"unsupported unit conversion factor {fac}")


def _num(v) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return f"{f:.15g}"


def _method_maps():
    """Reverse lookups over the writer's method registry: method-name ->
    proj key; (proj key, param-name) -> (p_key, kind)."""
    from .wkt import _METHODS

    meth: dict[str, str] = {}
    params: dict[str, dict[str, tuple]] = {}
    for pk, (w2, _code, gdal, esri, plist) in _METHODS.items():
        for nm in (w2, gdal, esri):
            meth[nm.lower()] = pk
        pmap: dict[str, tuple] = {}
        for p_key, w2n, _c, gdaln, esrin, kind, _d in plist:
            for nm in (w2n, gdaln, esrin):
                pmap[nm.lower()] = (p_key, kind)
        params[pk] = pmap
    return meth, params


def _entry_from_node(node: WktNode):
    """Structural reconstruction -> synthesized CrsEntry (code-less
    unless the WKT carried an id that failed registry lookup)."""
    from .crs import CrsEntry
    from .wkt import _P_LEN, _UNITS

    name = (node.strs() or ["unknown"])[0]
    if node.kw in ("GEOGCRS", "GEODCRS", "GEOGCS"):
        datum = node.first("DATUM", "ENSEMBLE", "TRF")
        if datum is None:
            raise ValueError("geographic CRS without a datum element")
        ellps, datum_name, towgs84 = _parse_datum(datum)
        return CrsEntry(
            code=_root_code(node) or "",
            name=name,
            kind="geographic",
            proj=f"+proj=longlat +ellps={ellps}",
            towgs84=towgs84,
            axis_order=_geog_axis_order(node),
            unit="deg",
            datum_ellps=ellps,
            datum_name=datum_name,
        )
    if node.kw not in ("PROJCRS", "PROJCS"):
        raise ValueError(f"unsupported WKT root {node.kw!r}")

    base = node.first("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
    if base is None:
        raise ValueError("projected CRS without a base geographic CRS")
    datum = base.first("DATUM", "ENSEMBLE", "TRF")
    if datum is None:
        raise ValueError("base CRS without a datum element")
    ellps, datum_name, towgs84 = _parse_datum(datum)

    meth_map, param_maps = _method_maps()
    conv = node.first("CONVERSION")
    if conv is not None:  # WKT2
        method = conv.first("METHOD")
        mname = (method.strs() or [""])[0] if method is not None else ""
        param_nodes = conv.all("PARAMETER")
    else:  # WKT1
        proj_n = node.first("PROJECTION")
        mname = (proj_n.strs() or [""])[0] if proj_n is not None else ""
        param_nodes = node.all("PARAMETER")
    pk = meth_map.get(mname.lower())
    if pk is None:
        raise ValueError(f"unsupported projection method {mname!r}")

    # linear unit: WKT2 puts LENGTHUNIT under the CS axes; WKT1 a UNIT
    # element at the CRS level
    unit_node = None
    for ax in node.all("AXIS"):
        unit_node = ax.first("LENGTHUNIT", "UNIT") or unit_node
    unit_node = unit_node or node.first("LENGTHUNIT", "UNIT")
    unit = _unit_key(unit_node)
    ufac = _UNITS[unit][1] if unit in _UNITS else 1.0

    pmap = param_maps[pk]
    # synthetic writer keys -> real proj strings (Hotine variant A is
    # +proj=omerc +no_uoff, EPSG method 9812)
    parts = (["+proj=omerc", "+no_uoff"] if pk == "omerc_a"
             else [f"+proj={pk}"])
    for p in param_nodes:
        pname = (p.strs() or [""])[0]
        hit = pmap.get(pname.lower())
        if hit is None:
            raise ValueError(f"unsupported parameter {pname!r} for {pk!r}")
        p_key, kind = hit
        v = p.nums()[0]
        if kind == _P_LEN:
            v = v * ufac  # proj strings carry lengths in meters
        parts.append(f"+{p_key}={_num(v)}")
    parts.append(f"+ellps={ellps}")
    parts.append(f"+units={unit}")
    return CrsEntry(
        code=_root_code(node) or "",
        name=name,
        kind="projected",
        proj=" ".join(parts),
        towgs84=towgs84,
        axis_order="en",
        unit=unit,
        datum_ellps=ellps,
        datum_name=datum_name,
    )


def wkt_to_entry(text: str):
    """WKT string -> CrsEntry (see module docstring for the order)."""
    from .crs import ProjCreateError, resolve_crs

    try:
        node = parse_wkt(text)
    except ValueError as e:
        raise ProjCreateError(f"invalid WKT: {e}") from e
    code = _root_code(node)
    if code:
        try:
            return resolve_crs(code)
        except ProjCreateError:
            pass
    entry = _registry_wkt_match(text)
    if entry is not None:
        return entry
    try:
        return _entry_from_node(node)
    except ValueError as e:
        raise ProjCreateError(f"cannot interpret WKT: {e}") from e


def projjson_to_entry(text: str):
    """PROJJSON string -> CrsEntry: resolve by id (authority, code);
    the engine's own to_projjson output always carries one."""
    import json

    from .crs import ProjCreateError, resolve_crs

    try:
        obj = json.loads(text)
    except json.JSONDecodeError as e:
        raise ProjCreateError(f"invalid PROJJSON: {e}") from e
    ident = obj.get("id") or {}
    auth, code = ident.get("authority"), ident.get("code")
    if auth is None or code is None:
        raise ProjCreateError("PROJJSON without an id element")
    return resolve_crs(f"{auth}:{code}")


def _is_projjson(s: str) -> bool:
    s = s.lstrip()
    return s.startswith("{")


def entry_from_definition(definition: str):
    """Dispatch for Transform.new: WKT or PROJJSON -> CrsEntry, else
    None (caller falls through to proj-string / AUTHORITY:CODE)."""
    if looks_like_wkt(definition):
        return wkt_to_entry(definition)
    if _is_projjson(definition):
        return projjson_to_entry(definition)
    return None
