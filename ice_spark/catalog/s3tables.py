"""S3Tables catalog backend routing (``arn:aws:s3tables:`` warehouses).

Reference parity: ice-rest-catalog recognizes a warehouse of the form
``arn:aws:s3tables:<region>:<account>:bucket/<name>`` and switches the
catalog to AWS S3 Tables' managed Iceberg REST endpoint with SigV4
request signing (ice-rest-catalog/.../config/Config.java:291-298:
``rest.sigv4-enabled=true``, signing name ``s3tables``, signer/client
region from the ARN; catalog impl CustomS3TablesCatalog). The only
server-side code the reference adds is a quirk shim:
``listNamespaces(parent)`` returns ``[]`` for a non-empty parent
instead of failing, because S3 table buckets have no nested
namespaces (CustomS3TablesCatalog.java:20-28).

Here the same routing is reproduced over our REST client: the ARN is
parsed, the Iceberg config defaults are applied with the reference's
putIfAbsent semantics, and `S3TablesClient` signs every request with
the pure-stdlib SigV4 signer (sources/sigv4.py) against the public
S3Tables Iceberg REST endpoint
``https://s3tables.<region>.amazonaws.com/iceberg`` — the endpoint is
the only AWS-bound part; the signing, routing, and quirk behavior are
all local and tested.
"""

from __future__ import annotations

import os
import re

from ice_spark.rest.client import RestCatalogClient
from ice_spark.sources.sigv4 import SigV4Signer

_ARN = re.compile(
    r"^arn:aws:s3tables:(?P<region>[a-z0-9-]+):(?P<account>\d+):bucket/(?P<bucket>[a-z0-9][a-z0-9-]*)$"
)


def is_s3tables_warehouse(warehouse: str) -> bool:
    return warehouse.startswith("arn:aws:s3tables:")


def parse_s3tables_arn(warehouse: str) -> dict:
    m = _ARN.match(warehouse)
    if not m:
        raise ValueError(f"not an S3Tables bucket ARN: {warehouse}")
    return m.groupdict()


def s3tables_config(warehouse: str, base: dict | None = None) -> dict:
    """Iceberg catalog config for an S3Tables warehouse, mirroring
    Config.toIcebergConfig's putIfAbsent dispatch
    (Config.java:291-298): user-supplied values win, the S3Tables
    defaults fill the gaps."""
    arn = parse_s3tables_arn(warehouse)
    out = dict(base or {})
    defaults = {
        "catalog-impl": "s3tables",
        "rest.sigv4-enabled": "true",
        "rest.signing-name": "s3tables",
        "rest.signing-region": arn["region"],
        "client.region": arn["region"],
        "uri": f"https://s3tables.{arn['region']}.amazonaws.com/iceberg",
        "warehouse": warehouse,
    }
    for k, v in defaults.items():
        out.setdefault(k, v)
    return out


class S3TablesClient(RestCatalogClient):
    """REST catalog client for an S3Tables bucket: SigV4-signed
    requests, plus the reference's namespace quirk
    (CustomS3TablesCatalog.java:20-28). Credentials come from the
    standard AWS env vars unless given explicitly — stdlib only, no
    boto3 required."""

    def __init__(
        self,
        warehouse: str,
        access_key: str | None = None,
        secret_key: str | None = None,
        session_token: str | None = None,
        uri: str | None = None,
        prefix: str | None = None,
        clock=None,
    ):
        arn = parse_s3tables_arn(warehouse)
        cfg = s3tables_config(warehouse)
        access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID", "")
        secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        session_token = session_token or os.environ.get("AWS_SESSION_TOKEN") or None
        if not access_key or not secret_key:
            raise RuntimeError(
                "S3Tables access needs AWS credentials "
                "(AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY)"
            )
        signer = SigV4Signer(
            access_key,
            secret_key,
            region=cfg["rest.signing-region"],
            service=cfg["rest.signing-name"],
            session_token=session_token,
            clock=clock,
        )
        self.warehouse_arn = warehouse
        self.region = arn["region"]
        super().__init__(
            uri or cfg["uri"],
            # S3Tables expects the ARN as the REST `prefix` path
            # segment (the managed endpoint scopes by bucket ARN)
            prefix=warehouse if prefix is None else prefix,
            request_signer=signer.sign,
        )

    def list_namespaces(self, parent: str | None = None, page_size: int | None = None):
        if parent:
            # S3 table buckets don't nest namespaces; the reference
            # returns [] instead of erroring on GET ?parent=$ns
            # (CustomS3TablesCatalog.java:20-28)
            return []
        return super().list_namespaces(None, page_size)
