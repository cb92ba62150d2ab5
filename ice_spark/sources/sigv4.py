"""AWS Signature Version 4 request signing, pure stdlib.

Needed by the S3Tables catalog path: the reference turns an
``arn:aws:s3tables:`` warehouse into a SigV4-signed Iceberg REST
session (``rest.sigv4-enabled=true``, signing name ``s3tables`` —
ice-rest-catalog/.../config/Config.java:291-298); the Iceberg AWS
module does the signing there. Here the algorithm itself is
implemented from the public SigV4 specification (canonical request →
string-to-sign → derived signing key → Authorization header), so the
only AWS-bound part of our S3Tables client is the network endpoint.

The derivation chain is pinned in tests against the worked example in
AWS's "Deriving the signing key" documentation.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import urllib.parse

_ALGORITHM = "AWS4-HMAC-SHA256"
_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def signing_key(secret_key: str, date_stamp: str, region: str, service: str) -> bytes:
    """kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    service), "aws4_request") — the SigV4 key-derivation chain."""
    k_date = _hmac(("AWS4" + secret_key).encode("utf-8"), date_stamp)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    return _hmac(k_service, "aws4_request")


def _canonical_query(query: str) -> str:
    """URI-encoded, name-sorted query string (spec: encode every name
    and value, sort by name then value)."""
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        name, _, value = part.partition("=")
        pairs.append(
            (
                urllib.parse.quote(urllib.parse.unquote_plus(name), safe="-_.~"),
                urllib.parse.quote(urllib.parse.unquote_plus(value), safe="-_.~"),
            )
        )
    return "&".join(f"{n}={v}" for n, v in sorted(pairs))


def _canonical_uri(path: str) -> str:
    if not path:
        return "/"
    # each segment URI-encoded; '/' preserved
    return urllib.parse.quote(path, safe="/-_.~")


class SigV4Signer:
    """Signs requests for one (credentials, region, service) scope.

    `sign(method, url, headers, body)` returns the headers to add:
    x-amz-date, x-amz-content-sha256, Authorization (and
    x-amz-security-token for session credentials). `clock` is
    injectable so tests produce stable signatures."""

    def __init__(
        self,
        access_key: str,
        secret_key: str,
        region: str,
        service: str,
        session_token: str | None = None,
        clock=None,
    ):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.service = service
        self.session_token = session_token
        self._clock = clock or (lambda: datetime.datetime.now(datetime.timezone.utc))

    def sign(
        self,
        method: str,
        url: str,
        headers: dict[str, str] | None = None,
        body: bytes | None = None,
    ) -> dict[str, str]:
        now = self._clock()
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        date_stamp = now.strftime("%Y%m%d")
        parsed = urllib.parse.urlsplit(url)
        payload_hash = hashlib.sha256(body or b"").hexdigest() if body else _EMPTY_SHA256

        to_sign = {
            "host": parsed.netloc,
            "x-amz-date": amz_date,
            "x-amz-content-sha256": payload_hash,
        }
        if self.session_token:
            to_sign["x-amz-security-token"] = self.session_token
        for k, v in (headers or {}).items():
            to_sign.setdefault(k.lower(), v.strip())

        signed_names = sorted(to_sign)
        canonical_headers = "".join(f"{k}:{to_sign[k]}\n" for k in signed_names)
        signed_headers = ";".join(signed_names)
        canonical_request = "\n".join(
            [
                method.upper(),
                _canonical_uri(parsed.path),
                _canonical_query(parsed.query),
                canonical_headers,
                signed_headers,
                payload_hash,
            ]
        )
        scope = f"{date_stamp}/{self.region}/{self.service}/aws4_request"
        string_to_sign = "\n".join(
            [
                _ALGORITHM,
                amz_date,
                scope,
                hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
            ]
        )
        key = signing_key(self.secret_key, date_stamp, self.region, self.service)
        signature = hmac.new(
            key, string_to_sign.encode("utf-8"), hashlib.sha256
        ).hexdigest()

        out = {
            "x-amz-date": amz_date,
            "x-amz-content-sha256": payload_hash,
            "Authorization": (
                f"{_ALGORITHM} Credential={self.access_key}/{scope}, "
                f"SignedHeaders={signed_headers}, Signature={signature}"
            ),
        }
        if self.session_token:
            out["x-amz-security-token"] = self.session_token
        return out
