"""REST catalog client — the `ice` CLI side of the pair.

The reference CLI talks to its server through Iceberg's RESTCatalog
(`ice/.../cli/Main.java:1054-1104` loads RESTCatalog from the config
uri; every verb then calls catalog methods that become REST calls).
This client plays that role with urllib: it exposes the same
method surface as `ice_spark.catalog.Catalog` (check /
list_namespaces / create_table / ...), so CLI verbs and tests can run
against `http://host:port` exactly as they run against a local
warehouse path.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

UNIT_SEP = "\x1f"


class RestError(RuntimeError):
    def __init__(self, code: int, err_type: str, message: str):
        super().__init__(f"{code} {err_type}: {message}")
        self.code = code
        self.err_type = err_type
        self.message = message


class RestCatalogClient:
    def __init__(
        self,
        uri: str,
        token: str | None = None,
        prefix: str | None = None,
        access_delegation: bool = True,
        request_signer=None,
        warehouse: str | None = None,
    ):
        self.uri = uri.rstrip("/")
        self.token = token
        # Optional per-request signer (SigV4 for S3Tables endpoints):
        # callable(method, url, headers, body) -> headers to add
        # (catalog/s3tables.py; reference Config.java:291-298 turns on
        # Iceberg's sigv4 signing the same way).
        self.request_signer = request_signer
        # Ask the server for vended storage credentials on table loads
        # (Iceberg REST X-Iceberg-Access-Delegation header; the
        # reference client consumes them via VendedCredentialsProvider,
        # ice/.../aws/s3/VendedCredentialsProvider.java).
        self.access_delegation = access_delegation
        if prefix is not None:
            # explicit prefix → no config handshake needed (S3Tables
            # passes the bucket ARN here; probing /v1/config without
            # the required ?warehouse param would fail against the
            # managed endpoint before any verb ran)
            self.prefix = prefix
        else:
            # config handshake (RESTSessionCatalog.initialize does the
            # same, forwarding the warehouse as a query param when set)
            cfg = self._req(
                "GET",
                "/v1/config",
                query={"warehouse": warehouse} if warehouse else None,
            )
            self.prefix = cfg.get("overrides", {}).get("prefix", "")

    # ---------- plumbing ----------

    def _req(self, method: str, path: str, body: dict | None = None, query: dict | None = None):
        url = self.uri + path
        if query:
            url += "?" + urllib.parse.urlencode(query)
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.access_delegation:
            req.add_header("X-Iceberg-Access-Delegation", "vended-credentials")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        if self.request_signer is not None:
            unsigned = {
                k: v
                for k, v in req.header_items()
                if k.lower() != "authorization"  # SigV4 emits its own
            }
            for k, v in self.request_signer(method, url, unsigned, data).items():
                req.add_header(k, v)
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else None
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                err = json.loads(raw)["error"]
                raise RestError(err.get("code", e.code), err.get("type", ""), err.get("message", ""))
            except (json.JSONDecodeError, KeyError):
                raise RestError(e.code, "HTTPError", raw.decode(errors="replace"))

    def _p(self, path: str) -> str:
        # The prefix is ONE path segment: fully %-encode it, '/'
        # included (Iceberg RESTUtil.encodeString semantics — an
        # S3Tables ARN's 'bucket/<name>' slash must become %2F, or
        # the managed endpoint sees a different route)
        pre = f"/{urllib.parse.quote(self.prefix, safe='')}" if self.prefix else ""
        return f"/v1{pre}{path}"

    @staticmethod
    def _ns_seg(ns: str) -> str:
        return urllib.parse.quote(UNIT_SEP.join(p for p in ns.split(".") if p))

    @staticmethod
    def _split(ident: str) -> tuple[str, str]:
        parts = [p for p in ident.split(".") if p]
        if len(parts) < 2:
            raise ValueError(f"identifier needs a namespace: {ident!r}")
        return ".".join(parts[:-1]), parts[-1]

    # ---------- Catalog-shaped surface ----------

    def check(self) -> bool:
        """Connectivity probe = listNamespaces (Check.java:19-22)."""
        self.list_namespaces()
        return True

    def _paged(self, path: str, key: str, query: dict | None, page_size: int | None):
        """Drain a paginated list endpoint (Iceberg REST pageToken
        protocol). page_size=None → one unpaginated request."""
        base = dict(query or {})
        if page_size is None:
            return self._req("GET", path, query=base or None).get(key, [])
        items, token = [], None
        while True:
            q = {**base, "pageSize": str(page_size)}
            if token:
                q["pageToken"] = token
            out = self._req("GET", path, query=q)
            items.extend(out.get(key, []))
            token = out.get("next-page-token")
            if not token:
                return items

    def list_namespaces(self, parent: str | None = None, page_size: int | None = None) -> list[str]:
        q = {"parent": UNIT_SEP.join(parent.split("."))} if parent else None
        out = self._paged(self._p("/namespaces"), "namespaces", q, page_size)
        return [".".join(ns) for ns in out]

    def create_namespace(self, ns: str, properties: dict | None = None) -> None:
        self._req(
            "POST",
            self._p("/namespaces"),
            {"namespace": ns.split("."), "properties": properties or {}},
        )

    def namespace_exists(self, ns: str) -> bool:
        try:
            self._req("HEAD", self._p(f"/namespaces/{self._ns_seg(ns)}"))
            return True
        except RestError as e:
            if e.code == 404:
                return False
            raise

    def delete_namespace(self, ns: str) -> None:
        self._req("DELETE", self._p(f"/namespaces/{self._ns_seg(ns)}"))

    def load_namespace(self, ns: str) -> dict:
        return self._req("GET", self._p(f"/namespaces/{self._ns_seg(ns)}"))

    def update_namespace_properties(
        self, ns: str, removals: list[str] | None = None, updates: dict | None = None
    ) -> dict:
        return self._req(
            "POST",
            self._p(f"/namespaces/{self._ns_seg(ns)}/properties"),
            {"removals": removals or [], "updates": updates or {}},
        )

    def list_tables(self, ns: str, page_size: int | None = None) -> list[str]:
        out = self._paged(
            self._p(f"/namespaces/{self._ns_seg(ns)}/tables"), "identifiers", None, page_size
        )
        return [i["name"] for i in out]

    def create_table(
        self,
        ident: str,
        schema_json: dict,
        partition_spec: list[dict] | None = None,
        sort_order: list[dict] | None = None,
        properties: dict | None = None,
        location: str | None = None,
    ) -> dict:
        ns, name = self._split(ident)
        body = {"name": name, "schema": schema_json}
        if partition_spec:
            body["partition-spec"] = partition_spec
        if sort_order:
            body["write-order"] = sort_order
        if properties:
            body["properties"] = properties
        if location:
            body["location"] = location
        return self._req("POST", self._p(f"/namespaces/{self._ns_seg(ns)}/tables"), body)

    def load_table(self, ident: str) -> dict:
        """Returns the LoadTableResult: {metadata-location, metadata}."""
        ns, name = self._split(ident)
        return self._req(
            "GET", self._p(f"/namespaces/{self._ns_seg(ns)}/tables/{urllib.parse.quote(name)}")
        )

    def vended_storage_config(self, ident: str) -> dict:
        """Storage settings vended by the server for this table —
        empty unless the server is configured to vend and this
        client's token opts in (protocol stub of the reference's STS
        credential vending)."""
        return self.load_table(ident).get("config", {})

    def table_exists(self, ident: str) -> bool:
        ns, name = self._split(ident)
        try:
            self._req(
                "HEAD",
                self._p(f"/namespaces/{self._ns_seg(ns)}/tables/{urllib.parse.quote(name)}"),
            )
            return True
        except RestError as e:
            if e.code == 404:
                return False
            raise

    def drop_table(self, ident: str, purge: bool = False) -> None:
        ns, name = self._split(ident)
        self._req(
            "DELETE",
            self._p(f"/namespaces/{self._ns_seg(ns)}/tables/{urllib.parse.quote(name)}"),
            query={"purgeRequested": "true"} if purge else None,
        )

    def rename_table(self, ident: str, new_ident: str) -> None:
        s_ns, s_name = self._split(ident)
        d_ns, d_name = self._split(new_ident)
        self._req(
            "POST",
            self._p("/tables/rename"),
            {
                "source": {"namespace": s_ns.split("."), "name": s_name},
                "destination": {"namespace": d_ns.split("."), "name": d_name},
            },
        )

    def register_table(self, ident: str, metadata_location: str) -> dict:
        ns, name = self._split(ident)
        return self._req(
            "POST",
            self._p(f"/namespaces/{self._ns_seg(ns)}/register"),
            {"name": name, "metadata-location": metadata_location},
        )

    def commit_table(self, ident: str, requirements: list[dict], updates: list[dict]) -> dict:
        ns, name = self._split(ident)
        return self._req(
            "POST",
            self._p(f"/namespaces/{self._ns_seg(ns)}/tables/{urllib.parse.quote(name)}"),
            {"requirements": requirements, "updates": updates},
        )

    def commit_transaction(self, table_changes: list[dict]) -> None:
        self._req("POST", self._p("/transactions/commit"), {"table-changes": table_changes})

    def report_metrics(self, ident: str, report: dict) -> None:
        ns, name = self._split(ident)
        self._req(
            "POST",
            self._p(
                f"/namespaces/{self._ns_seg(ns)}/tables/{urllib.parse.quote(name)}/metrics"
            ),
            report,
        )

    # ---------- views ----------

    def list_views(self, ns: str, page_size: int | None = None) -> list[str]:
        out = self._paged(
            self._p(f"/namespaces/{self._ns_seg(ns)}/views"), "identifiers", None, page_size
        )
        return [i["name"] for i in out]

    def create_view(self, ident: str, sql: str, comment: str = "") -> dict:
        ns, name = self._split(ident)
        return self._req(
            "POST",
            self._p(f"/namespaces/{self._ns_seg(ns)}/views"),
            {"name": name, "sql": sql, "comment": comment},
        )["view"]

    def load_view(self, ident: str) -> dict:
        ns, name = self._split(ident)
        return self._req(
            "GET", self._p(f"/namespaces/{self._ns_seg(ns)}/views/{urllib.parse.quote(name)}")
        )["view"]

    def drop_view(self, ident: str) -> None:
        ns, name = self._split(ident)
        self._req(
            "DELETE", self._p(f"/namespaces/{self._ns_seg(ns)}/views/{urllib.parse.quote(name)}")
        )


def read_table(spark, client: RestCatalogClient, ident: str, snapshot_id: int | None = None,
               as_of_ms: int | None = None):
    """Spark read driven by REST-loaded metadata — the Iceberg
    deployment model: the catalog serves only the metadata pointer,
    data/metadata files live on shared storage. The local
    version-hint file is never consulted; the Table handle is seeded
    entirely from the server's LoadTableResult, so a stale or absent
    hint cannot mislead the read (mirrors Spark reading through
    RESTCatalog in the reference's docker-compose example)."""
    import re as _re

    from ice_spark.catalog.table import Table

    res = client.load_table(ident)
    meta = res["metadata"]
    t = Table(spark, meta["location"], identifier=ident)
    m = _re.search(r"v(\d+)\.metadata\.json$", res["metadata-location"])
    t._meta = meta
    t._version = int(m.group(1)) if m else 0
    return t.read(snapshot_id=snapshot_id, as_of_ms=as_of_ms)
