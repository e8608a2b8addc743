"""REST catalog client tests against an in-process http.server stub.

The reference tests this against a dockerized catalog
(``daskberg/tests/test_rest.py``); no Docker/network exists here, so a
stdlib HTTP stub serves the same JSON shapes (FIXTURES.md §4), including
the metadata-location hand-off into a real IcebergTable.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from daskberg_spark.iceberg.rest import IceRestClient

STATE: dict = {"namespaces": {}, "tables": {}}


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
        parts = self.path.strip("/").split("/")
        # /v1/namespaces | /v1/namespaces/{ns} | /v1/namespaces/{ns}/tables[/t]
        if parts == ["v1", "namespaces"]:
            self._send({"namespaces": [[ns] for ns in STATE["namespaces"]]})
        elif len(parts) == 3 and parts[1] == "namespaces":
            ns = parts[2]
            if ns in STATE["namespaces"]:
                self._send({"namespace": [ns], "properties": {}})
            else:
                self._send({"error": "no such namespace"}, 404)
        elif len(parts) == 4 and parts[3] == "tables":
            ns = parts[2]
            self._send(
                {
                    "identifiers": [
                        {"namespace": [ns], "name": t}
                        for (tns, t) in STATE["tables"]
                        if tns == ns
                    ]
                }
            )
        elif len(parts) == 5 and parts[3] == "tables":
            key = (parts[2], parts[4])
            if key in STATE["tables"]:
                self._send(STATE["tables"][key])
            else:
                self._send({"error": "no such table"}, 404)
        else:
            self._send({"error": "bad path"}, 400)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else {}
        parts = self.path.strip("/").split("/")
        if parts == ["v1", "namespaces"]:
            ns = body["namespace"][0]
            STATE["namespaces"][ns] = body.get("properties", {})
            self._send({"namespace": body["namespace"], "properties": {}})
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
        else:
            self._send({"error": "bad path"}, 400)

    def do_DELETE(self):
        parts = self.path.strip("/").split("?")[0].split("/")
        if len(parts) == 3 and parts[1] == "namespaces":
            STATE["namespaces"].pop(parts[2], None)
            self._send({})
        elif len(parts) == 5 and parts[3] == "tables":
            STATE["tables"].pop((parts[2], parts[4]), None)
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
