"""Iceberg REST catalog client.

Reference counterpart: ``/root/reference/daskberg/rest_client.py`` —
namespace/table CRUD against the Iceberg REST catalog OpenAPI, plus the
``metadata-location`` hand-off that opens a table directly from its
metadata JSON (``tests/test_rest.py:74-79``).

Uses stdlib ``urllib`` (no ``requests`` dependency needed); tested against
an in-process ``http.server`` stub since this environment has no Docker or
network (FIXTURES.md §4).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request
from typing import Any


def _name_path(name: str) -> str:
    """Percent-encode a table/view name for a URL path segment — names
    with spaces, '#', '?', or '/' would otherwise truncate or reroute
    the request (namespaces already go through _ns_path)."""
    return urllib.parse.quote(name, safe="")


def _ns_path(namespace: str) -> str:
    """Dotted namespace → REST path segment (levels joined by the
    unit separator, percent-encoded, per the Iceberg REST spec)."""
    return urllib.parse.quote("\x1f".join(namespace.split(".")), safe="")


class IceRestClient:
    """Minimal Iceberg REST catalog client (v1 endpoints).

    ``token`` sends ``Authorization: Bearer <token>`` on every request
    (the REST spec's OAuth2 bearer flow once a token is in hand);
    ``credential`` (``client_id:client_secret``) exchanges itself for a
    token at ``v1/oauth/tokens`` (client_credentials grant) on first use.
    The reference ships no auth at all (its README lists auth as
    missing)."""

    def __init__(
        self,
        endpoint: str,
        namespace: str | None = None,
        prefix: str = "",
        token: str | None = None,
        credential: str | None = None,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.namespace = namespace
        self.prefix = prefix.strip("/")
        self.token = token
        self._credential = credential

    # -- http ---------------------------------------------------------------

    def _url(self, path: str) -> str:
        base = f"{self.endpoint}/v1"
        if self.prefix:
            base = f"{base}/{self.prefix}"
        return f"{base}/{path.lstrip('/')}"

    def _ensure_token(self) -> None:
        if self.token or not self._credential:
            return
        client_id, _, client_secret = self._credential.partition(":")
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/v1/oauth/tokens",
            data=form,
            method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as resp:
            self.token = json.loads(resp.read())["access_token"]

    def _call(self, method: str, path: str, body: dict[str, Any] | None = None) -> Any:
        self._ensure_token()
        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self._url(path),
            data=data,
            method=method,
            headers=headers,
        )
        try:
            with urllib.request.urlopen(req) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as e:
            raise RuntimeError(f"REST catalog {method} {path}: {e.code} {e.reason}") from e
        return json.loads(payload) if payload else None

    def _list_pages(
        self, path: str, key: str, page_size: int | None = None
    ) -> list[Any]:
        """Drain a paginated list endpoint (REST spec ``pageToken`` /
        ``pageSize`` query params + ``next-page-token`` response field).
        A catalog that ignores pagination returns everything with no
        token and the loop runs once — both shapes work unchanged."""
        items: list[Any] = []
        token: str | None = None
        while True:
            params = []
            if page_size is not None:
                params.append(f"pageSize={page_size}")
            if token is not None:
                params.append(f"pageToken={urllib.parse.quote(token, safe='')}")
            q = ("?" + "&".join(params)) if params else ""
            out = self._call("GET", path + q) or {}
            items.extend(out.get(key, []))
            token = out.get("next-page-token")
            if not token:
                return items

    # -- namespaces (rest_client.py:27-44) -----------------------------------

    def list_namespaces(self, page_size: int | None = None) -> list[str]:
        out = self._list_pages("namespaces", "namespaces", page_size)
        return [".".join(ns) for ns in out]

    def get_namespace(self, namespace: str | None = None) -> dict[str, Any]:
        ns = namespace or self.namespace
        return self._call("GET", f"namespaces/{_ns_path(ns)}")

    def create_namespace(self, namespace: str | None = None) -> dict[str, Any]:
        ns = namespace or self.namespace
        return self._call(
            "POST", "namespaces", {"namespace": ns.split("."), "properties": {}}
        )

    def delete_namespace(self, namespace: str | None = None) -> bool:
        ns = namespace or self.namespace
        self._call("DELETE", f"namespaces/{_ns_path(ns)}")
        return True

    # -- tables (rest_client.py:46-95) ---------------------------------------

    def list_tables(
        self, namespace: str | None = None, page_size: int | None = None
    ) -> list[str]:
        ns = namespace or self.namespace
        out = self._list_pages(
            f"namespaces/{_ns_path(ns)}/tables", "identifiers", page_size
        )
        return [t["name"] for t in out]

    def create_table(
        self,
        name: str,
        schema: dict[str, str] | list[dict[str, Any]],
        namespace: str | None = None,
        stage: bool = False,
    ) -> dict[str, Any]:
        """Create a table; ``schema`` may be a simple {name: iceberg-type}
        dict (auto field ids) or a full Iceberg field list
        (rest_client.py:51-82)."""
        ns = namespace or self.namespace
        if isinstance(schema, dict):
            fields = [
                {"id": i + 1, "name": k, "required": False, "type": v}
                for i, (k, v) in enumerate(schema.items())
            ]
        else:
            fields = schema
        body = {
            "name": name,
            "schema": {
                "type": "struct",
                "schema-id": 0,
                "fields": fields,
            },
            "stage-create": stage,
        }
        return self._call("POST", f"namespaces/{_ns_path(ns)}/tables", body)

    def get_table(self, name: str, namespace: str | None = None) -> dict[str, Any]:
        ns = namespace or self.namespace
        return self._call("GET", f"namespaces/{_ns_path(ns)}/tables/{_name_path(name)}")

    def delete_table(self, name: str, namespace: str | None = None, purge: bool = True) -> bool:
        ns = namespace or self.namespace
        self._call(
            "DELETE",
            f"namespaces/{_ns_path(ns)}/tables/{_name_path(name)}"
            f"?purgeRequested={str(purge).lower()}",
        )
        return True

    # -- commit (beyond reference: closes the write loop) --------------------

    def register_table(
        self, name: str, metadata_location: str, namespace: str | None = None
    ) -> dict[str, Any]:
        """Register an EXISTING table by metadata location — the spec's
        ``POST .../namespaces/{ns}/register`` (RegisterTableRequest):
        the one portable way to point any conforming catalog (Polaris,
        Lakekeeper, Nessie) at metadata this engine wrote."""
        ns = namespace or self.namespace
        body = {"name": name, "metadata-location": metadata_location}
        return self._call("POST", f"namespaces/{_ns_path(ns)}/register", body)

    def commit_table(
        self, name: str, metadata_location: str, namespace: str | None = None
    ) -> dict[str, Any]:
        """Point the catalog at a new metadata file for an EXISTING
        table via ``POST .../tables/{name}`` with a
        ``set-metadata-location`` update.

        OUT-OF-SPEC delta (documented): the REST spec's TableUpdate
        union has no ``set-metadata-location`` action — conforming
        catalogs own the metadata pointer and expect add-snapshot-style
        updates; this action is an engine extension the in-process stub
        (and any catalog fronting this engine's file layout) accepts.
        For portable registration of new tables use ``register_table``
        (the spec's /register endpoint).  This pairs ``IcebergWriter``
        with the catalog: the writer emits ``v{N}.metadata.json``
        locally (data files written by executors), then this call
        points the catalog at it — after which ``open_table`` readers
        see the new snapshot."""
        ns = namespace or self.namespace
        body = {
            "identifier": {"namespace": ns.split("."), "name": name},
            "requirements": [],
            "updates": [
                {"action": "set-metadata-location", "location": metadata_location}
            ],
        }
        return self._call(
            "POST", f"namespaces/{_ns_path(ns)}/tables/{_name_path(name)}", body
        )

    def commit_transaction(
        self,
        changes: list[tuple[str, str]],
        namespace: str | None = None,
    ) -> None:
        """Atomic multi-table commit — the spec's ``POST
        /v1/transactions/commit`` (CommitTransactionRequest: a list of
        per-table CommitTableRequests the catalog applies
        ALL-OR-NOTHING).  ``changes`` is ``[(table_name,
        new_metadata_location), ...]``; each becomes the same
        ``set-metadata-location`` update shape as :meth:`commit_table`
        (see its docstring for the documented out-of-spec delta).  The
        transactional contract lives on the CATALOG: either every
        table's pointer moves or none does — the two-table
        writer-then-publish pattern (fact + its dedup index, table +
        its audit log) needs exactly this."""
        ns = namespace or self.namespace
        body = {
            "table-changes": [
                {
                    "identifier": {"namespace": ns.split("."), "name": name},
                    "requirements": [],
                    "updates": [
                        {
                            "action": "set-metadata-location",
                            "location": location,
                        }
                    ],
                }
                for name, location in changes
            ]
        }
        self._call("POST", "transactions/commit", body)

    # -- views (REST spec /views endpoints; beyond the reference, which
    #    has no view support at all) -----------------------------------------

    def list_views(
        self, namespace: str | None = None, page_size: int | None = None
    ) -> list[str]:
        ns = namespace or self.namespace
        out = self._list_pages(
            f"namespaces/{_ns_path(ns)}/views", "identifiers", page_size
        )
        return [v["name"] for v in out]

    def register_view(
        self,
        name: str,
        metadata_location: str,
        namespace: str | None = None,
    ) -> dict[str, Any]:
        """Register an existing view with the catalog
        (`views.create_view` writes view-metadata JSON locally, this
        call publishes it).  When the metadata is locally readable the
        request carries the spec CreateViewRequest fields (``schema``,
        ``view-version``, ``properties``) alongside the
        ``metadata-location`` handoff this engine's catalogs use; a
        spec-conforming catalog validates the former, the stub serves
        the latter."""
        ns = namespace or self.namespace
        body: dict[str, Any] = {
            "name": name,
            "metadata-location": metadata_location,
        }
        try:
            from daskberg_spark.iceberg.views import IcebergView

            v = IcebergView(os.path.dirname(os.path.dirname(metadata_location))
                            if metadata_location.endswith(".json")
                            else metadata_location)
            body["schema"] = v.schema
            body["view-version"] = v.current_version
            body["properties"] = v.metadata.get("properties", {})
        except (OSError, ValueError, KeyError):
            pass  # remote/unreadable metadata: minimal handoff body
        return self._call("POST", f"namespaces/{_ns_path(ns)}/views", body)

    def get_view(self, name: str, namespace: str | None = None) -> dict[str, Any]:
        ns = namespace or self.namespace
        return self._call("GET", f"namespaces/{_ns_path(ns)}/views/{_name_path(name)}")

    def delete_view(self, name: str, namespace: str | None = None) -> bool:
        ns = namespace or self.namespace
        self._call("DELETE", f"namespaces/{_ns_path(ns)}/views/{_name_path(name)}")
        return True

    def open_view(self, name: str, namespace: str | None = None) -> "Any":
        """get_view → metadata-location → IcebergView (the view twin of
        ``open_table``'s hand-off)."""
        from daskberg_spark.iceberg.views import IcebergView

        info = self.get_view(name, namespace)
        location = info.get("metadata-location") or info.get("metadata_location")
        if not location:
            raise ValueError(f"view {name} has no metadata-location")
        return IcebergView(location)

    # -- hand-off ------------------------------------------------------------

    def open_table(self, name: str, namespace: str | None = None) -> "Any":
        """get_table → metadata-location → IcebergTable (tests/test_rest.py:74-79)."""
        from daskberg_spark.iceberg.metadata import IcebergTable

        info = self.get_table(name, namespace)
        location = info.get("metadata-location") or info.get("metadata_location")
        if not location:
            raise ValueError(f"table {name} has no metadata-location")
        return IcebergTable(location)


# -- OpenAPI introspection (A26; reference rest_client.py:103-132) -----------

OPENAPI_URL = (
    "https://raw.githubusercontent.com/apache/iceberg/main/"
    "open-api/rest-catalog-open-api.yaml"
)


def fetch_openapi(url: str = OPENAPI_URL) -> dict[str, Any]:
    """Fetch + parse the published REST catalog OpenAPI document
    (JSON or YAML)."""
    with urllib.request.urlopen(url) as resp:
        text = resp.read().decode()
    try:
        return json.loads(text)
    except ValueError:
        import yaml

        return yaml.safe_load(text)


def get_def(api: dict[str, Any], ref: str) -> Any:
    """Walk a ``#/components/schemas/X`` reference path into the document
    (reference ``_get_def``, rest_client.py:117-132)."""
    out: Any = api
    for part in ref.strip("#").strip("/").split("/"):
        out = out[part]
    return out


def resolve_refs(api: dict[str, Any], node: Any, max_depth: int = 10) -> Any:
    """Recursively inline ``$ref`` nodes (depth-bounded: the spec's schema
    graph is cyclic — e.g. Expression → and/or → Expression)."""
    if max_depth <= 0:
        return node
    if isinstance(node, dict):
        if set(node) == {"$ref"}:
            return resolve_refs(api, get_def(api, node["$ref"]), max_depth - 1)
        return {k: resolve_refs(api, v, max_depth) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_refs(api, v, max_depth) for v in node]
    return node
