"""Wire-contract parity tests for the HTTP shim, lifted from the
reference's own e2e suite (``tests/index.test.ts``): produce/consume
paging (:56-129), long-poll (:130-179), versioning incl. 409/400
bodies (:224-299), destroy + recreate (:300-350), plus the auth gate
and the PUT 405 (``src/stream_manager.ts:181-199``)."""

import json
import threading
import time
import urllib.error
import urllib.request
import uuid

import pytest

from durablestreams_spark import StreamCatalog
from durablestreams_spark.httpshim import StreamHTTPShim


@pytest.fixture()
def catalog(tmp_path):
    return StreamCatalog(str(tmp_path / "streams"))


def _req(url, method="GET", body=None, headers=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, method=method, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_produce_consume_paging(catalog):
    """tests/index.test.ts:56-129 — consume from '-' with a limit,
    then exclusive-start from a returned offset."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        st, body = _req(
            f"{base}/{name}",
            "POST",
            {"records": [{"value": f"msg-{i}"} for i in (1, 2, 3)]},
        )
        assert st == 200
        offsets = json.loads(body)["offsets"]
        assert len(offsets) == 3 and offsets == sorted(offsets)

        st, body = _req(f"{base}/{name}?offset=-&limit=2")
        assert st == 200
        recs = json.loads(body)["records"]
        assert [r["data"]["value"] for r in recs] == ["msg-1", "msg-2"]
        assert all("offset" in r for r in recs)

        # exclusive start: consuming FROM offsets[0] returns msg-2
        st, body = _req(f"{base}/{name}?offset={offsets[0]}&limit=1")
        recs = json.loads(body)["records"]
        assert [r["data"]["value"] for r in recs] == ["msg-2"]


def test_long_poll_receives_concurrent_produce(catalog):
    """tests/index.test.ts:130-163 — a long-polling consumer gets a
    concurrently-produced record; :165-177 — timeout on a silent
    stream returns an empty records list."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        _req(f"{base}/{name}", "POST", {"records": [{"value": "old"}]})

        def later():
            time.sleep(0.3)
            _req(f"{base}/{name}", "POST", {"records": [{"value": "new"}]})

        t = threading.Thread(target=later)
        t.start()
        st, body = _req(f"{base}/{name}?timeout_sec=10")
        t.join()
        assert st == 200
        recs = json.loads(body)["records"]
        assert [r["data"]["value"] for r in recs] == ["new"]

        st, body = _req(f"{base}/{uuid.uuid4().hex}?timeout_sec=1")
        assert st == 200 and json.loads(body)["records"] == []


def test_long_poll_string_records_round_trip_unmodified(catalog):
    """Reference wire contract: ``records: any[]`` — a produced JSON
    string must come back as the same string from BOTH the plain-GET
    and the long-poll branches (src/stream_manager.ts:201-229).
    Regression for the r7 double-decode: the long-poll branch used to
    re-``json.loads`` string data, turning '123' into 123 and raising
    on non-JSON strings like 'hello'."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        _req(f"{base}/{name}", "POST", {"records": ["123", "hello"]})
        st, body = _req(f"{base}/{name}?offset=-&limit=10")
        assert st == 200
        plain = [r["data"] for r in json.loads(body)["records"]]
        assert plain == ["123", "hello"]

        # same records via the long-poll branch (concurrent produce)
        name2 = uuid.uuid4().hex

        def later():
            time.sleep(0.2)
            _req(f"{base}/{name2}", "POST", {"records": ["123", "hello"]})

        t = threading.Thread(target=later)
        t.start()
        st, body = _req(f"{base}/{name2}?timeout_sec=10")
        t.join()
        assert st == 200
        polled = [r["data"] for r in json.loads(body)["records"]]
        assert polled == ["123", "hello"]


def test_long_poll_delivery_within_one_flush(catalog):
    """tests/index.test.ts:130-163 under real concurrency: a blocked
    GET must observe a concurrent produce well inside its timeout —
    bounded here at 5 s against a 30 s budget (the shim flushes
    per-produce, so delivery is one notify away)."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex

        def later():
            time.sleep(0.3)
            _req(f"{base}/{name}", "POST", {"records": [{"v": "x"}]})

        t = threading.Thread(target=later)
        t.start()
        t0 = time.monotonic()
        st, body = _req(f"{base}/{name}?timeout_sec=30")
        elapsed = time.monotonic() - t0
        t.join()
        assert st == 200
        assert [r["data"]["v"] for r in json.loads(body)["records"]] == ["x"]
        assert elapsed < 5.0, f"long-poll took {elapsed:.1f}s"


def test_bad_limit_and_timeout_params_return_400(catalog):
    """Unparseable limit/timeout_sec must produce a 400 response, not
    an aborted connection (r7 ADVICE low)."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        _req(f"{base}/{name}", "POST", {"records": [{"v": 1}]})
        for qs in ("offset=-&limit=abc", "offset=-&timeout_sec=xyz"):
            st, body = _req(f"{base}/{name}?{qs}")
            assert st == 400
            assert json.loads(body)["error"] == "Invalid limit or timeout_sec"


def test_producer_versioning_wire_shapes(catalog):
    """tests/index.test.ts:224-299 — monotonic accept, equal accept,
    stale 409 with the exact error body, versionless accept,
    non-numeric 400."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        st, _ = _req(
            f"{base}/{name}?version=2", "POST", {"records": [{"v": 1}]}
        )
        assert st == 200
        st, _ = _req(
            f"{base}/{name}?version=2", "POST", {"records": [{"v": 2}]}
        )
        assert st == 200  # equal version accepted
        st, body = _req(
            f"{base}/{name}?version=1", "POST", {"records": [{"v": 3}]}
        )
        assert st == 409
        err = json.loads(body)
        assert err["error"] == "Producer version too old"
        assert err["current_version"] == 2 and err["provided_version"] == 1
        st, _ = _req(f"{base}/{name}", "POST", {"records": [{"v": 4}]})
        assert st == 200  # versionless always accepted
        st, body = _req(
            f"{base}/{name}?version=zebra", "POST", {"records": []}
        )
        assert st == 400
        assert json.loads(body)["error"] == "Invalid version parameter"
        # version-bump-only: empty records, higher version
        st, body = _req(f"{base}/{name}?version=9", "POST", {"records": []})
        assert st == 200 and json.loads(body)["version"] == 9


def test_destroy_and_recreate(catalog):
    """tests/index.test.ts:300-350 — DELETE wipes the stream; the same
    name is immediately reusable."""
    with StreamHTTPShim(catalog) as base:
        name = uuid.uuid4().hex
        _req(f"{base}/{name}", "POST", {"records": [{"v": "a"}]})
        st, body = _req(f"{base}/{name}", "DELETE")
        assert st == 200 and json.loads(body) == {"success": True}
        st, body = _req(f"{base}/{name}?offset=-&limit=10")
        assert json.loads(body)["records"] == []
        st, _ = _req(f"{base}/{name}", "POST", {"records": [{"v": "b"}]})
        assert st == 200
        st, body = _req(f"{base}/{name}?offset=-&limit=10")
        assert [r["data"]["v"] for r in json.loads(body)["records"]] == ["b"]


def test_auth_gate_and_put_and_bad_json(catalog):
    """src/stream_manager.ts:181-199 — auth header match, PUT 405; 400
    on an unparseable produce body."""
    with StreamHTTPShim(catalog, auth_header="sekret") as base:
        name = uuid.uuid4().hex
        st, body = _req(f"{base}/{name}?offset=-")
        assert st == 401 and body == "Unauthorized"
        ok = {"auth": "sekret"}
        st, _ = _req(
            f"{base}/{name}", "POST", {"records": [{"v": 1}]}, headers=ok
        )
        assert st == 200
        st, body = _req(f"{base}/{name}", "PUT", headers=ok)
        assert st == 405 and body == "NOT IMPLEMENTED"
        # invalid JSON body
        req = urllib.request.Request(
            f"{base}/{name}", data=b"{nope", method="POST", headers=ok
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                st = resp.status
        except urllib.error.HTTPError as e:
            st, body = e.code, e.read().decode()
        assert st == 400 and json.loads(body)["error"] == "Invalid JSON body"


def test_bad_offset_returns_400(catalog):
    """A malformed cursor must produce a 400, not an aborted
    connection from an uncaught parse_offset ValueError."""
    with StreamHTTPShim(catalog) as url:
        _req(f"{url}/s400", "POST", {"records": [{"v": 1}]})
        for bad in ("abc", "12"):
            st, _ = _req(f"{url}/s400?offset={bad}")
            assert st == 400, bad


def test_root_and_nested_paths_return_404(catalog):
    """GET / (health probes) and nested paths must get a 404, not an
    uncaught Stream-name ValueError that drops the connection."""
    with StreamHTTPShim(catalog) as url:
        for path in ("/", "/a/b"):
            st, _ = _req(f"{url}{path}")
            assert st == 404, path


def test_nonfinite_timeout_returns_400(catalog):
    """timeout_sec=inf would pin a server thread forever; nan breaks
    every deadline comparison — both are 400s, as is a negative."""
    with StreamHTTPShim(catalog) as url:
        _req(f"{url}/sinf", "POST", {"records": [{"v": 1}]})
        for bad in ("inf", "nan", "-1"):
            st, _ = _req(f"{url}/sinf?offset=-&timeout_sec={bad}")
            assert st == 400, bad


def test_records_must_be_array(catalog):
    """A string/dict 'records' is iterable — produce() would append its
    characters/keys as records; the shim must 400 instead (the
    reference's records.map would throw)."""
    with StreamHTTPShim(catalog) as url:
        for bad in ("ab", {"k": 1}, 5):
            st, _ = _req(f"{url}/sarr", "POST", {"records": bad})
            assert st == 400, bad
        st, body = _req(f"{url}/sarr?offset=-")
        assert st == 200 and json.loads(body)["records"] == []


def test_long_poll_sees_gap_records(catalog):
    """Records produced between the poll's consume() check and its
    wait must satisfy the poll immediately (snapshot pinned to the
    CLIENT's cursor, not to 'now')."""
    with StreamHTTPShim(catalog) as url:
        _st, body = _req(f"{url}/sgap", "POST", {"records": [{"v": 1}]})
        cursor = json.loads(body)["offsets"][-1]
        # this record lands BEFORE the long-poll request is sent: a
        # now-snapshot would wait the full timeout and return []
        _req(f"{url}/sgap", "POST", {"records": [{"v": 2}]})
        t0 = time.monotonic()
        st, body = _req(f"{url}/sgap?offset={cursor}&timeout_sec=10")
        assert st == 200
        assert [r["data"] for r in json.loads(body)["records"]] == [{"v": 2}]
        assert time.monotonic() - t0 < 5.0
