"""The HTTP facade serves each mapped route's rows equal to the DuckDB
oracle of the registered query behind it (VERDICT r6 item 4: curl each
route, match the oracle output) — end-to-end through a real TCP socket,
JSON on the wire."""

from __future__ import annotations

import datetime
import decimal
import json
import urllib.error
import urllib.request

import pytest

from mini_hive_server_spark import registry
from mini_hive_server_spark.http_server import (
    POST_ROUTES,
    ROUTES,
    QueryHTTPServer,
)

from .conftest import SF_ORACLE
from .oracle_harness import run_duckdb_oracle


@pytest.fixture(scope="module")
def http_server(spark):
    srv = QueryHTTPServer(spark, SF_ORACLE, port=0)
    yield srv
    srv.shutdown()


def _get(srv: QueryHTTPServer, path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=120
    ) as resp:
        return resp.status, json.loads(resp.read())


def _canon(v) -> str:
    """Unify JSON-on-the-wire values with DuckDB-fetched Python values:
    numerics (including numeric-looking strings — the facade renders
    Decimal as its exact decimal string) collapse to a shortest-float
    form, temporals to ISO strings."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (int, float, decimal.Decimal)) or (
        isinstance(v, str)
        and v
        and v.replace(".", "", 1).replace("-", "", 1).isdigit()
    ):
        f = float(v)
        if f.is_integer() and abs(f) < 2**53:
            return str(int(f))
        return repr(f)
    return str(v)


def _canon_rows(rows: list[dict]) -> list[tuple[str, ...]]:
    return sorted(
        tuple(_canon(r[k]) for k in sorted(r)) for r in rows
    )


def test_health_and_route_index(http_server):
    status, body = _get(http_server, "/health")
    assert (status, body) == (200, {"status": "ok"})
    status, body = _get(http_server, "/routes")
    assert status == 200 and body == ROUTES


def test_unknown_route_is_404(http_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(http_server, "/no/such/route")
    assert ei.value.code == 404


@pytest.mark.parametrize("path", sorted(ROUTES))
def test_route_matches_registered_query_oracle(http_server, path):
    name = ROUTES[path]
    spec = registry.all_specs()[name]
    assert spec.oracle, f"{name}: routed queries must be oracle-paired"

    status, got = _get(http_server, path)
    assert status == 200
    assert isinstance(got, list) and got, f"{path}: empty result"

    expected = run_duckdb_oracle(spec.oracle, SF_ORACLE).to_pylist()
    assert sorted(got[0]) == sorted(expected[0]), f"{path}: column drift"
    assert _canon_rows(got) == _canon_rows(expected), path


def test_task_detail_path_param_route(http_server):
    """GET /tasks/:id (index.js:1017) — the one path-parameter route:
    the fixture oid returns the single task DOCUMENT (not a list, the
    findOne shape), any other oid returns the reference's 404 body."""
    from mini_hive_server_spark.plans.reference_model import _TASK_DETAIL_OID

    spec = registry.all_specs()["ref_task_detail"]
    status, got = _get(http_server, f"/tasks/{_TASK_DETAIL_OID}")
    assert status == 200 and isinstance(got, dict), "findOne returns a doc"
    expected = run_duckdb_oracle(spec.oracle, SF_ORACLE).to_pylist()
    assert len(expected) == 1
    assert _canon_rows([got]) == _canon_rows(expected)


def test_task_detail_unknown_oid_is_404(http_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(http_server, "/tasks/deadbeefdeadbeefdeadbeef")
    assert ei.value.code == 404
    assert json.loads(ei.value.read()) == {"message": "Task not found"}


def _post(srv: QueryHTTPServer, path: str):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=b"{}", method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


@pytest.mark.parametrize("path", sorted(POST_ROUTES))
def test_post_route_matches_write_lifecycle_oracle(http_server, path):
    """The POST routes replay the reference's WRITE endpoints as batch
    folds; the response must equal the registered fold's DuckDB oracle."""
    name = POST_ROUTES[path]
    spec = registry.all_specs()[name]
    status, got = _post(http_server, path)
    assert status == 200 and isinstance(got, list) and got, path
    expected = run_duckdb_oracle(spec.oracle, SF_ORACLE).to_pylist()
    assert _canon_rows(got) == _canon_rows(expected), path


def test_post_to_read_route_is_404(http_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(http_server, "/buyer/home")
    assert ei.value.code == 404


def test_post_huge_declared_body_is_413_without_drain(http_server):
    """A client declaring a multi-GB Content-Length (while sending
    almost nothing) must get an immediate 413, not pin a handler thread
    draining bytes that will never arrive (ADVICE r10 #3). The short
    urlopen timeout doubles as the no-pin proof: the old drain loop
    would block on rfile.read until the client timeout."""
    path = sorted(POST_ROUTES)[0]
    req = urllib.request.Request(
        f"http://127.0.0.1:{http_server.port}{path}",
        data=b"{}",
        method="POST",
    )
    # lie about the length AFTER urllib computed it from `data`
    req.add_header("Content-Length", str(8 * 1024 * 1024 * 1024))
    with pytest.raises(urllib.error.HTTPError) as ei:
        with urllib.request.urlopen(req, timeout=10):
            pass
    assert ei.value.code == 413
    assert json.loads(ei.value.read()) == {
        "message": "request body too large"
    }


def test_refused_drain_releases_connection_quickly(http_server):
    """After the 413 reply, the courtesy drain must ride a SHORT deadline:
    an honest client that declared a huge Content-Length but sent a short
    body must not pin the handler thread in rfile.read() for the full 30 s
    socket timeout (ADVICE r11). Proof: the server closes the connection
    within seconds of the refusal, not at the request timeout."""
    import socket
    import time

    path = sorted(POST_ROUTES)[0]
    s = socket.create_connection(("127.0.0.1", http_server.port), timeout=20)
    try:
        s.sendall(
            f"POST {path} HTTP/1.1\r\nHost: x\r\n"
            "Content-Length: 9000000000\r\n\r\n".encode() + b"xx"
        )
        s.settimeout(20)
        t0 = time.monotonic()
        buf = b""
        while b"\r\n\r\n" not in buf:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        assert b" 413 " in buf, buf[:200]
        # then: server-side close well before the 30 s request timeout
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
        assert time.monotonic() - t0 < 15
    finally:
        s.close()
