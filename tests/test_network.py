"""O22 network grid download: the reference's retry/backoff semantics
(/root/reference/src/network.rs:31-37, 124-171), the bounded download
cache (src/proj.rs:417-431), and the end-to-end KAT shape of
test_network_enabled_conversion (src/proj.rs:1597-1639): with
networking enabled a remote grid resolves and measurably moves a
point vs the grid-less (ballpark) answer.

All HTTP here is loopback (http.server on 127.0.0.1); networking is
off by default and every test restores that."""

import http.server
import os
import threading

import numpy as np
import pytest

from proj_spark import grids as G
from proj_spark import network as N
from proj_spark.crs import TransformBuilder, Transform


@pytest.fixture(autouse=True)
def _reset_network_state(tmp_path, monkeypatch):
    monkeypatch.setenv("PROJ_SPARK_GRID_CACHE", str(tmp_path / "cache"))
    yield
    N.enable_network(False)
    N.grid_cache_enable(True)
    N.grid_cache_set_max_size(N.DEFAULT_CACHE_MAX_BYTES)
    N.set_url_endpoint(N.DEFAULT_ENDPOINT)
    # drop any network-cached parse results so later tests re-resolve
    for k in [k for k in G._GRID_CACHE if "cache" in str(k)]:
        del G._GRID_CACHE[k]


# ---------------------------------------------------------------------------
# retry loop unit pins (src/network.rs:124-171)
# ---------------------------------------------------------------------------
def test_wait_time_is_quadratic():
    # get_wait_time: retries^2 * 100 ms, zero before the first retry
    # (src/network.rs:124-131)
    assert N.get_wait_time(0) == 0.0
    assert N.get_wait_time(1) == pytest.approx(0.1)
    assert N.get_wait_time(3) == pytest.approx(0.9)
    assert N.get_wait_time(8) == pytest.approx(6.4)


def test_retries_on_server_and_s3_codes(monkeypatch):
    """5xx and the S3-disguise codes {429,500,502,504} retry with
    quadratic waits; success mid-way returns the body."""
    waits = []
    monkeypatch.setattr(N, "_sleep", waits.append)
    calls = {"n": 0}
    script = [500, 502, 429, 504, 200]

    def fake(url, timeout):
        s = script[calls["n"]]
        calls["n"] += 1
        return s, b"GRID" if s == 200 else b""

    body = N.request_with_retries("http://x/g.gsb", _request=fake)
    assert body == b"GRID"
    assert calls["n"] == 5
    assert waits == [pytest.approx(0.1), pytest.approx(0.4),
                     pytest.approx(0.9), pytest.approx(1.6)]


def test_client_error_fails_immediately(monkeypatch):
    monkeypatch.setattr(N, "_sleep", lambda s: None)
    calls = {"n": 0}

    def fake(url, timeout):
        calls["n"] += 1
        return 404, b""

    with pytest.raises(N.DownloadError) as ei:
        N.request_with_retries("http://x/missing.gsb", _request=fake)
    assert calls["n"] == 1  # 4xx outside the retry set: no retries
    assert ei.value.status == 404 and ei.value.retries == 0


def test_exhausted_retries_raise_with_final_status(monkeypatch):
    waits = []
    monkeypatch.setattr(N, "_sleep", waits.append)
    calls = {"n": 0}

    def fake(url, timeout):
        calls["n"] += 1
        return 503, b""

    with pytest.raises(N.DownloadError) as ei:
        N.request_with_retries("http://x/g.gsb", _request=fake)
    # initial request + exactly MAX_RETRIES retries (the reference's
    # contract, src/network.rs:141-152: at most 8 retries, final
    # backoff 8^2 x 100 ms = 6.4 s)
    assert calls["n"] == 1 + N.MAX_RETRIES
    assert ei.value.status == 503
    assert ei.value.retries == N.MAX_RETRIES
    assert waits[0] == pytest.approx(0.1)
    assert waits[-1] == pytest.approx(N.get_wait_time(N.MAX_RETRIES))
    assert waits[-1] == pytest.approx(6.4)


# ---------------------------------------------------------------------------
# loopback end-to-end: enable_network -> fetch -> load_grid -> transform
# ---------------------------------------------------------------------------
class _FlakyGridHandler(http.server.BaseHTTPRequestHandler):
    """Serves the synthetic fixture; fails the first two hits of each
    path with 502 to prove the retry loop runs against a REAL socket."""

    store: dict = {}
    hits: dict = {}

    def do_GET(self):  # noqa: N802  (stdlib naming)
        name = self.path.lstrip("/")
        n = self.hits[name] = self.hits.get(name, 0) + 1
        if n <= 2:
            self.send_response(502)
            self.end_headers()
            return
        data = self.store.get(name)
        if data is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def grid_server(tmp_path):
    fixture = tmp_path / "remote_shift.gsb"
    G.write_synthetic_fixture(str(fixture))
    _FlakyGridHandler.store = {
        "remote_shift.gsb": fixture.read_bytes()}
    _FlakyGridHandler.hits = {}
    srv = http.server.HTTPServer(("127.0.0.1", 0), _FlakyGridHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_enable_network_end_to_end(grid_server, monkeypatch):
    """The reference KAT shape (src/proj.rs:1597-1639): same point,
    grid vs ballpark, measurably different — here the grid arrives
    over loopback HTTP through the retry loop (2x 502 then 200)."""
    monkeypatch.setattr(N, "_sleep", lambda s: None)  # don't wait in CI
    b = TransformBuilder()
    assert not b.network_enabled()
    b.set_url_endpoint(grid_server)
    assert b.get_url_endpoint() == grid_server
    # disabled: a network-only grid does NOT resolve
    with pytest.raises(FileNotFoundError):
        Transform.new(
            "+proj=pipeline +step +proj=hgridshift +grids=remote_shift.gsb")
    b.enable_network(True)
    assert b.network_enabled()
    t = Transform.new(
        "+proj=pipeline +step +proj=hgridshift +grids=remote_shift.gsb")
    # the step pinned the downloaded file's absolute cache path, so
    # executor workers need no network state
    assert os.path.isabs(t._steps[0].grids_name)
    assert _FlakyGridHandler.hits["remote_shift.gsb"] == 3  # retried
    lon, lat = -117.7321, 33.8765
    x, y = t.convert_array(np.radians([lon]).copy(),
                           np.radians([lat]).copy())
    glon, glat = np.degrees(x[0]), np.degrees(y[0])
    # grid vs ballpark (identity): measurably moved, like OSTN15 demo
    assert 10.0 < abs(glat - lat) * 111320.0 < 60.0
    dlon_want, dlat_want = G.grid_shift(
        G.load_grid("synthetic_shift.gsb"), lon, lat)
    assert abs((glat - lat) - dlat_want[0]) < 1e-12
    # second construction hits the cache, not the server
    Transform.new(
        "+proj=pipeline +step +proj=hgridshift +grids=remote_shift.gsb")
    assert _FlakyGridHandler.hits["remote_shift.gsb"] == 3


def test_cache_eviction_is_lru_bounded(grid_server, monkeypatch):
    """The 300 MB-analog bound: oldest entries evict to fit new ones
    (src/proj.rs:417-424)."""
    monkeypatch.setattr(N, "_sleep", lambda s: None)
    N.enable_network(True)
    N.set_url_endpoint(grid_server)
    p = N.fetch_grid("remote_shift.gsb")
    size = os.path.getsize(p)
    # bound below one file: fetching a second name evicts the first
    _FlakyGridHandler.store["other_shift.gsb"] = \
        _FlakyGridHandler.store["remote_shift.gsb"]
    N.grid_cache_set_max_size(size + size // 2)
    os.utime(p, (1, 1))  # make it the LRU victim
    p2 = N.fetch_grid("other_shift.gsb")
    assert os.path.exists(p2)
    assert not os.path.exists(p)  # evicted


def test_fetch_requires_enable_and_bare_name():
    with pytest.raises(N.DownloadError, match="disabled"):
        N.fetch_grid("x.gsb")
    N.enable_network(True)
    with pytest.raises(ValueError, match="bare"):
        N.fetch_grid("../evil.gsb")


def test_transport_errors_retry_and_raise_download_error(monkeypatch):
    """URLError/timeout are as transient as a 5xx: same backoff, and
    DownloadError (never a raw URLError) on exhaustion so grid
    resolution can fall through to packaged grids."""
    import urllib.error

    calls = {"n": 0}
    monkeypatch.setattr(N, "_sleep", lambda s: None)

    def fake(url, timeout):
        calls["n"] += 1
        raise urllib.error.URLError("dns failure")

    with pytest.raises(N.DownloadError) as ei:
        N.request_with_retries("http://x/g.gsb", _request=fake)
    assert calls["n"] == 1 + N.MAX_RETRIES
    assert "transport error" in str(ei.value.status)


def test_transport_error_then_success(monkeypatch):
    import urllib.error

    calls = {"n": 0}
    monkeypatch.setattr(N, "_sleep", lambda s: None)

    def fake(url, timeout):
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.URLError("connection reset")
        return 200, b"grid-bytes"

    assert N.request_with_retries("http://x/g.gsb", _request=fake) \
        == b"grid-bytes"
    assert calls["n"] == 2
