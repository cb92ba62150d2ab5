"""Input scheme routing: file:// passthrough, http(s):// download
with a local content cache, s3:// behind an injectable fetcher.

Reference parity: `Input.newFile` routes file/s3/http(s) schemes, and
remote inputs are downloaded to a local cache before ingest
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/iceberg/io/Input.java:78-114).
The scheme DISPATCH is complete (SchemeFileIO.java:61-197 shape): any
scheme can be registered via `register_scheme`. The s3 fetcher ships
unbound — boto3/credentials/network are absent in this environment —
and raises an instructive error unless a client is injected
(`s3_fetcher(client)` maps 1:1 onto `client.download_fileobj`); tests
exercise the full path with a fake client, so everything except the
AWS SDK call itself is real, cached, and covered.

Cache key is sha256(url): re-ingesting the same URL never re-downloads
(matches the reference's cache-by-source behavior and keeps
`--skip-duplicates` meaningful for remote inputs).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from urllib.parse import urlparse

DEFAULT_CACHE = os.path.join(tempfile.gettempdir(), "ice_spark_http_cache")

# scheme -> fetcher(url, out_file) writing the object's bytes.
# Registered schemes are cached identically to http(s).
_SCHEME_FETCHERS: dict[str, object] = {}


def register_scheme(scheme: str, fetcher) -> None:
    """Register a fetcher for a URL scheme: `fetcher(url, out_file)`
    must write the object's bytes to the open binary file."""
    _SCHEME_FETCHERS[scheme] = fetcher


def unregister_scheme(scheme: str) -> None:
    _SCHEME_FETCHERS.pop(scheme, None)


def s3_fetcher(client):
    """Adapt a boto3-style S3 client into a fetcher. The client needs
    one method: `download_fileobj(Bucket=, Key=, Fileobj=)` — exactly
    boto3's. Bind with `register_scheme("s3", s3_fetcher(client))`."""

    def fetch(url: str, out) -> None:
        p = urlparse(url)
        client.download_fileobj(Bucket=p.netloc, Key=p.path.lstrip("/"), Fileobj=out)

    return fetch


def _cached_fetch(path_or_url: str, cache_dir: str, write_to) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    key = hashlib.sha256(path_or_url.encode()).hexdigest()
    base = os.path.basename(urlparse(path_or_url).path) or "download"
    dst = os.path.join(cache_dir, f"{key[:16]}-{base}")
    if os.path.exists(dst):
        return dst
    tmp = dst + ".part"
    with open(tmp, "wb") as out:
        write_to(out)
    os.replace(tmp, dst)  # atomic: concurrent fetches never see partials
    return dst


def resolve_input(
    path_or_url: str,
    cache_dir: str = DEFAULT_CACHE,
    opener=None,
) -> str:
    """Return a local filesystem path for an input, downloading and
    caching remote URLs. `opener` is an injectable
    `urllib.request.urlopen`-compatible callable (tests stub it)."""
    scheme = urlparse(path_or_url).scheme
    if scheme in ("", "file"):
        return path_or_url[len("file://") :] if scheme == "file" else path_or_url
    if scheme in ("http", "https"):
        if opener is None:  # pragma: no cover - no network in CI env
            from urllib.request import urlopen as opener  # type: ignore[no-redef]

        def write_http(out):
            with opener(path_or_url) as resp:
                shutil.copyfileobj(resp, out)

        return _cached_fetch(path_or_url, cache_dir, write_http)
    if scheme in _SCHEME_FETCHERS:
        fetcher = _SCHEME_FETCHERS[scheme]
        return _cached_fetch(
            path_or_url, cache_dir, lambda out: fetcher(path_or_url, out)
        )
    if scheme == "s3":
        raise ValueError(
            "s3:// input requires a bound client: "
            'register_scheme("s3", s3_fetcher(boto3.client("s3"))) '
            "(no AWS SDK/credentials in this environment)"
        )
    raise ValueError(
        f"unsupported input scheme {scheme!r} for {path_or_url!r} "
        "(supported: local path, file://, http://, https://, registered schemes)"
    )
