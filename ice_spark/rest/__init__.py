"""REST catalog server + client (SURVEY §2.6).

The reference ships `ice-rest-catalog` — an Iceberg-REST-protocol
server over etcd (Route.java:50-116, RESTCatalogAdapter.java:102-380)
— and the `ice` CLI is a client of it. This package rebuilds that
client/server pair on the stdlib: `server.RestCatalogServer` exposes
the catalog over the Iceberg REST route surface, and
`client.RestCatalogClient` consumes it with urllib.

The server is infrastructure, not a query engine: every route is a
thin JSON adapter over `ice_spark.catalog.Catalog`/`Table`, and the
commit route reuses the exact CAS path local commits use
(Table._write_metadata), so HTTP writers and in-process writers
conflict correctly against each other.
"""

from ice_spark.rest.server import RestCatalogServer, ServerConfig  # noqa: F401
from ice_spark.rest.client import RestCatalogClient, RestError  # noqa: F401
from ice_spark.rest.commit_lock import CommitLock, LockTimeout  # noqa: F401
