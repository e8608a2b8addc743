"""REST catalog client tests against an in-process http.server stub.

The reference tests this against a dockerized catalog
(``daskberg/tests/test_rest.py``); no Docker/network exists here, so a
stdlib HTTP stub serves the same JSON shapes (FIXTURES.md §4), including
the metadata-location hand-off into a real IcebergTable.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from daskberg_spark.iceberg.rest import IceRestClient

STATE: dict = {"namespaces": {}, "tables": {}, "views": {}}

OPENAPI_DOC = {
    "openapi": "3.0.3",
    "paths": {"/v1/namespaces": {"get": {"operationId": "listNamespaces"}}},
    "components": {
        "schemas": {
            "BaseUpdate": {
                "type": "object",
                "required": ["action"],
                "properties": {"action": {"type": "string"}},
            },
            "AddSnapshotUpdate": {
                "allOf": [
                    {"$ref": "#/components/schemas/BaseUpdate"},
                    {
                        "type": "object",
                        "required": ["snapshot"],
                        "properties": {
                            "snapshot": {"$ref": "#/components/schemas/Snapshot"}
                        },
                    },
                ]
            },
            "Snapshot": {
                "type": "object",
                "properties": {"snapshot-id": {"type": "integer"}},
            },
        }
    },
}


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence
        pass

    def _send(self, payload, code=200):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        raw_path, _, raw_q = self.path.partition("?")
        query = urllib.parse.parse_qs(raw_q)
        parts = [urllib.parse.unquote(x) for x in raw_path.strip("/").split("/")]
        # /v1/namespaces | /v1/namespaces/{ns} | /v1/namespaces/{ns}/tables[/t]
        if parts == ["openapi.yaml"]:
            # JSON is a YAML subset; serves fetch_openapi either way
            self._send(OPENAPI_DOC)
        elif parts == ["v1", "namespaces"]:
            self._send({"namespaces": [[ns] for ns in STATE["namespaces"]]})
        elif len(parts) == 3 and parts[1] == "namespaces":
            ns = parts[2]
            if ns in STATE["namespaces"]:
                self._send({"namespace": [ns], "properties": {}})
            else:
                self._send({"error": "no such namespace"}, 404)
        elif len(parts) == 4 and parts[3] == "tables":
            ns = parts[2]
            idents = [
                {"namespace": [ns], "name": t}
                for (tns, t) in sorted(STATE["tables"])
                if tns == ns
            ]
            # spec pagination: pageSize slices, next-page-token resumes
            out = {"identifiers": idents}
            if "pageSize" in query:
                size = int(query["pageSize"][0])
                start = int(query.get("pageToken", ["0"])[0])
                out["identifiers"] = idents[start : start + size]
                if start + size < len(idents):
                    out["next-page-token"] = str(start + size)
                STATE.setdefault("page_calls", []).append(start)
            self._send(out)
        elif len(parts) == 5 and parts[3] == "tables":
            key = (parts[2], parts[4])
            if key in STATE["tables"]:
                self._send(STATE["tables"][key])
            else:
                self._send({"error": "no such table"}, 404)
        elif len(parts) == 4 and parts[3] == "views":
            ns = parts[2]
            self._send(
                {
                    "identifiers": [
                        {"namespace": [ns], "name": v}
                        for (vns, v) in STATE["views"]
                        if vns == ns
                    ]
                }
            )
        elif len(parts) == 5 and parts[3] == "views":
            key = (parts[2], parts[4])
            if key in STATE["views"]:
                self._send(STATE["views"][key])
            else:
                self._send({"error": "no such view"}, 404)
        else:
            self._send({"error": "bad path"}, 400)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else {}
        parts = [urllib.parse.unquote(x) for x in self.path.strip("/").split("/")]
        if parts == ["v1", "namespaces"]:
            ns = body["namespace"][0]
            STATE["namespaces"][ns] = body.get("properties", {})
            self._send({"namespace": body["namespace"], "properties": {}})
        elif len(parts) == 4 and parts[3] == "register":
            # spec RegisterTableRequest: point the catalog at existing
            # metadata (the portable registration path)
            ns = parts[2]
            if "name" not in body or "metadata-location" not in body:
                self._send({"error": "missing required field"}, 400)
                return
            info = {
                "metadata-location": body["metadata-location"],
                "name": body["name"],
            }
            STATE["tables"][(ns, body["name"])] = info
            self._send(info)
        elif len(parts) == 4 and parts[3] == "tables":
            ns = parts[2]
            name = body["name"]
            info = {
                "metadata-location": STATE.get("metadata_location", ""),
                "metadata": {"schema": body.get("schema")},
                "name": name,
            }
            STATE["tables"][(ns, name)] = info
            self._send(info)
        elif len(parts) == 5 and parts[3] == "tables":
            # CommitTableRequest: apply set-metadata-location updates
            key = (parts[2], parts[4])
            if key not in STATE["tables"]:
                self._send({"error": "no such table"}, 404)
                return
            for upd in body.get("updates", []):
                if upd.get("action") == "set-metadata-location":
                    STATE["tables"][key]["metadata-location"] = upd["location"]
            self._send(STATE["tables"][key])
        elif len(parts) == 4 and parts[3] == "views":
            ns = parts[2]
            name = body["name"]
            info = {
                "metadata-location": body.get("metadata-location", ""),
                "name": name,
            }
            STATE["views"][(ns, name)] = info
            self._send(info)
        elif parts == ["v1", "transactions", "commit"]:
            # CommitTransactionRequest: ALL-OR-NOTHING — validate every
            # identifier before touching any state
            changes = body.get("table-changes", [])
            keys = [
                (c["identifier"]["namespace"][0], c["identifier"]["name"])
                for c in changes
            ]
            if any(k not in STATE["tables"] for k in keys):
                self._send({"error": "no such table"}, 404)
                return
            for key, c in zip(keys, changes):
                for upd in c.get("updates", []):
                    if upd.get("action") == "set-metadata-location":
                        STATE["tables"][key]["metadata-location"] = upd[
                            "location"
                        ]
            self._send({})
        else:
            self._send({"error": "bad path"}, 400)

    def do_DELETE(self):
        parts = [urllib.parse.unquote(x) for x in self.path.strip("/").split("?")[0].split("/")]
        if len(parts) == 3 and parts[1] == "namespaces":
            STATE["namespaces"].pop(parts[2], None)
            self._send({})
        elif len(parts) == 5 and parts[3] == "tables":
            STATE["tables"].pop((parts[2], parts[4]), None)
            self._send({})
        elif len(parts) == 5 and parts[3] == "views":
            STATE["views"].pop((parts[2], parts[4]), None)
            self._send({})
        else:
            self._send({"error": "bad path"}, 400)


@pytest.fixture(scope="module")
def rest_endpoint():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


AUTH_TOKEN = "sekrit-token"


class AuthHandler(Handler):
    """Same catalog stub, but every /v1 call must carry the bearer token;
    POST /v1/oauth/tokens exchanges client credentials for it."""

    def do_POST(self):
        if self.path.strip("/") == "v1/oauth/tokens":
            n = int(self.headers.get("Content-Length", 0))
            import urllib.parse as up

            form = dict(up.parse_qsl(self.rfile.read(n).decode()))
            if (
                form.get("grant_type") == "client_credentials"
                and form.get("client_id") == "svc"
                and form.get("client_secret") == "pw"
            ):
                self._send({"access_token": AUTH_TOKEN, "token_type": "bearer"})
            else:
                self._send({"error": "invalid_client"}, 401)
            return
        if not self._authed():
            return
        super().do_POST()

    def do_GET(self):
        if not self._authed():
            return
        super().do_GET()

    def do_DELETE(self):
        if not self._authed():
            return
        super().do_DELETE()

    def _authed(self) -> bool:
        if self.headers.get("Authorization") == f"Bearer {AUTH_TOKEN}":
            return True
        self._send({"error": "unauthorized"}, 401)
        return False


@pytest.fixture(scope="module")
def auth_endpoint():
    server = HTTPServer(("127.0.0.1", 0), AuthHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_namespace_crud(rest_endpoint):
    client = IceRestClient(rest_endpoint, namespace="db")
    assert client.list_namespaces() == []
    client.create_namespace()
    assert client.list_namespaces() == ["db"]
    assert client.get_namespace()["namespace"] == ["db"]
    assert client.delete_namespace()
    assert client.list_namespaces() == []


def test_table_crud_and_schema_conversion(rest_endpoint):
    client = IceRestClient(rest_endpoint, namespace="db")
    client.create_namespace()
    # dict schema → auto-id field list (reference rest_client.py:51-82)
    client.create_table("trades", {"date": "date", "symbol": "string"})
    assert client.list_tables() == ["trades"]
    info = client.get_table("trades")
    fields = info["metadata"]["schema"]["fields"]
    assert fields == [
        {"id": 1, "name": "date", "required": False, "type": "date"},
        {"id": 2, "name": "symbol", "required": False, "type": "string"},
    ]
    assert client.delete_table("trades")
    assert client.list_tables() == []


def test_metadata_location_handoff(rest_endpoint):
    """get_table → metadata-location → IcebergTable (reference
    tests/test_rest.py:74-79), against the real partitioned fixture."""
    from daskberg_spark.iceberg.fixtures import ensure_partitioned_fixture

    fixture = ensure_partitioned_fixture()
    STATE["metadata_location"] = f"{fixture}/metadata/v3.metadata.json"
    client = IceRestClient(rest_endpoint, namespace="db")
    client.create_namespace()
    client.create_table("part_table", {"id": "long"})
    table = client.open_table("part_table")
    assert len(table.plan_files()) == 36


def test_missing_table_raises(rest_endpoint):
    client = IceRestClient(rest_endpoint, namespace="db")
    with pytest.raises(RuntimeError, match="404"):
        client.get_table("nope")


def test_openapi_introspect(rest_endpoint):
    """A26: fetch the published OpenAPI doc, walk $ref paths, inline refs
    (reference rest_client.py:103-132)."""
    from daskberg_spark.iceberg.rest import fetch_openapi, get_def, resolve_refs

    api = fetch_openapi(f"{rest_endpoint}/openapi.yaml")
    assert api["openapi"].startswith("3.")
    d = get_def(api, "#/components/schemas/AddSnapshotUpdate")
    assert d["allOf"][0] == {"$ref": "#/components/schemas/BaseUpdate"}
    inlined = resolve_refs(api, d)
    assert inlined["allOf"][0]["properties"]["action"] == {"type": "string"}
    assert (
        inlined["allOf"][1]["properties"]["snapshot"]["properties"]["snapshot-id"]
        == {"type": "integer"}
    )


def test_rest_commit_write_loop(rest_endpoint, tmp_path):
    """Writer -> commit_table -> open_table round-trip: the catalog hands
    readers each newly committed snapshot (closes the write loop the
    reference leaves open at create_table(stage=True))."""
    from daskberg_spark.iceberg.writer import IcebergWriter

    client = IceRestClient(rest_endpoint, namespace="db")
    client.create_namespace()
    client.create_table("kv", {"x": "long"}, stage=True)
    w = IcebergWriter(
        str(tmp_path / "kv"),
        [{"id": 1, "name": "x", "type": "long", "required": False}],
    )
    w.append([{"x": 1}, {"x": 2}])
    client.commit_table("kv", f"{w.path}/metadata/v1.metadata.json")
    t = client.open_table("kv")
    assert len(t.plan_files()) == 1
    w.append([{"x": 3}])
    client.commit_table("kv", f"{w.path}/metadata/v2.metadata.json")
    t2 = client.open_table("kv")
    assert len(t2.snapshots) == 2
    assert len(t2.plan_files()) == 2
    # un-committed local state is invisible through the catalog
    w.append([{"x": 4}])
    assert len(client.open_table("kv").plan_files()) == 2


def test_auth_bearer_token_sent(auth_endpoint):
    client = IceRestClient(auth_endpoint, namespace="db", token=AUTH_TOKEN)
    client.create_namespace("db")
    assert "db" in client.list_namespaces()


def test_auth_missing_token_rejected(auth_endpoint):
    client = IceRestClient(auth_endpoint, namespace="db")
    with pytest.raises(RuntimeError, match="401"):
        client.list_namespaces()


def test_auth_credential_exchange(auth_endpoint):
    """client_id:client_secret → token via POST /v1/oauth/tokens
    (client_credentials grant), then authorized calls proceed."""
    client = IceRestClient(auth_endpoint, namespace="db", credential="svc:pw")
    client.create_namespace("db2")
    assert client.token == AUTH_TOKEN
    assert "db2" in client.list_namespaces()


def test_view_endpoints_and_handoff(rest_endpoint, tmp_path):
    """REST /views surface (beyond the reference, which has no view
    support): register a locally-written view's metadata location, list
    it, load it, and hand off to IcebergView — the view twin of
    open_table.  Delete removes it."""
    from daskberg_spark.iceberg.rest import IceRestClient
    from daskberg_spark.iceberg.views import create_view

    c = IceRestClient(rest_endpoint, "db")
    c.create_namespace()
    vpath = str(tmp_path / "v")
    create_view(vpath, "SELECT 1 AS one")  # dialect-only (no session)
    c.register_view("myview", vpath)
    assert c.list_views() == ["myview"]
    info = c.get_view("myview")
    assert info["metadata-location"] == vpath
    v = c.open_view("myview")
    assert v.sql() == "SELECT 1 AS one"
    assert c.delete_view("myview") is True
    assert c.list_views() == []
    import pytest as _pytest

    with _pytest.raises(Exception):
        c.get_view("myview")


def test_register_table_spec_endpoint(rest_endpoint):
    """register_table uses the spec's POST .../register
    (RegisterTableRequest) — the portable path real catalogs accept,
    unlike commit_table's documented engine-extension action."""
    client = IceRestClient(rest_endpoint, namespace="ns1")
    out = client.register_table("regtab", "/tmp/meta/v1.metadata.json")
    assert out["metadata-location"] == "/tmp/meta/v1.metadata.json"
    got = client.get_table("regtab")
    assert got["metadata-location"] == "/tmp/meta/v1.metadata.json"


def test_names_are_url_quoted(rest_endpoint):
    """A table name with a space/'#' must round-trip — unquoted it
    crashes http.client or truncates the path at the fragment."""
    client = IceRestClient(rest_endpoint, namespace="ns1")
    client.register_table("odd name#1", "/tmp/m/v1.metadata.json")
    got = client.get_table("odd name#1")
    assert got["metadata-location"] == "/tmp/m/v1.metadata.json"
    assert client.delete_table("odd name#1")


def test_multi_table_transaction_atomic(rest_endpoint):
    """POST /v1/transactions/commit: both pointers move together, and a
    transaction naming a missing table moves NEITHER."""
    c = IceRestClient(rest_endpoint, "txns")
    c.create_namespace()
    c.create_table("fact", {"id": "long"})
    c.create_table("dim", {"id": "long"})
    c.commit_transaction(
        [("fact", "/wh/fact/metadata/v2.metadata.json"),
         ("dim", "/wh/dim/metadata/v2.metadata.json")]
    )
    assert c.get_table("fact")["metadata-location"].endswith("fact/metadata/v2.metadata.json")
    assert c.get_table("dim")["metadata-location"].endswith("dim/metadata/v2.metadata.json")

    with pytest.raises(RuntimeError, match="404"):
        c.commit_transaction(
            [("fact", "/wh/fact/metadata/v3.metadata.json"),
             ("missing", "/wh/missing/metadata/v1.metadata.json")]
        )
    # both-or-neither: fact must still point at v2
    assert c.get_table("fact")["metadata-location"].endswith("v2.metadata.json")


def test_paginated_list_tables(rest_endpoint):
    """pageToken/pageSize pagination: the client drains every page and
    the stub actually served multiple pages."""
    c = IceRestClient(rest_endpoint, "pages")
    c.create_namespace()
    names = [f"t{i:02d}" for i in range(5)]
    for n in names:
        c.create_table(n, {"id": "long"})
    STATE.pop("page_calls", None)
    assert sorted(c.list_tables(page_size=2)) == names
    assert STATE.get("page_calls") == [0, 2, 4]
    # an unpaginated catalog (no pageSize sent) still returns everything
    assert sorted(c.list_tables()) == names


def test_statistics_metadata_through_catalog(rest_endpoint, tmp_path, spark):
    """r13 (tracking the writer's statistics growth): grouped theta NDV
    blobs, grouped quantile blobs, and their per-file refresh partials
    all live inside the metadata JSON, so the metadata-location handoff
    carries them unchanged — commit through the ATOMIC transaction
    endpoint, reopen via open_table, and the metadata-only consumers
    (ndv_groupby, percentile_groupby) still answer with zero data IO."""
    import glob
    import re

    import daskberg_spark.iceberg.agg  # noqa: F401  (attaches)
    from daskberg_spark.iceberg.quantiles import (
        refresh_grouped_quantile_statistics,
        write_grouped_quantile_statistics,
    )
    from daskberg_spark.iceberg.theta import (
        refresh_grouped_theta_statistics,
        write_grouped_theta_statistics,
    )
    from daskberg_spark.iceberg.writer import IcebergWriter

    client = IceRestClient(rest_endpoint, namespace="db")
    client.create_namespace()
    client.create_table("st", {"g": "long", "v": "long"}, stage=True)
    w = IcebergWriter(
        str(tmp_path / "st"),
        [
            {"id": 1, "name": "g", "type": "long", "required": False},
            {"id": 2, "name": "v", "type": "long", "required": False},
        ],
    )
    w.append([{"g": i % 3, "v": i} for i in range(120)])
    write_grouped_theta_statistics(w, spark, ["g"], ["v"])
    write_grouped_quantile_statistics(w, spark, ["g"], ["v"])
    w.append([{"g": 3, "v": 1000 + i} for i in range(30)])
    # refreshes write merged blobs + per-file partials entries
    assert refresh_grouped_theta_statistics(w, spark) is not None
    assert refresh_grouped_quantile_statistics(w, spark) is not None
    latest = max(
        glob.glob(f"{w.path}/metadata/v*.metadata.json"),
        key=lambda p: int(re.search(r"v(\d+)\.metadata", p).group(1)),
    )
    client.commit_transaction([("st", latest)])
    t = client.open_table("st")
    # grouped NDV: merged blob serves metadata-only through the catalog
    out = t.ndv_groupby(spark, "v", ["g"])
    assert t.last_ndv_groupby["route"] == "stats", t.last_ndv_groupby
    assert t.last_scan["files_scanned"] == 0
    got = {r.g: r.ndv for r in out.collect()}
    assert got == {0: 40, 1: 40, 2: 40, 3: 30}, got
    # grouped percentiles: merged blob serves metadata-only too
    out2 = t.percentile_groupby(spark, [("v", 0.5, "p50")], ["g"])
    assert t.last_percentile_groupby["route"] == "stats"
    assert {r.g for r in out2.collect()} == {0, 1, 2, 3}
