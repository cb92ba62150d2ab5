"""STS assume-role credential vending for the REST catalog server.

Reference parity: ice-rest-catalog vends per-token AWS credentials in
LoadTableResult `config` — each bearer token may carry an
``awsAssumeRoleARN`` (Config.java:149-161); the server builds one
credentials provider per token (Main.java:353-397), assuming the role
with session name ``ice-rest-catalog.<token-name>``
(Main.java:399-402) through ``StsAssumeRoleCredentialsProvider``
(CredentialsProvider.java:21-31), and the SDK's CachedSupplier
refreshes the session before it expires
(ice/.../aws/s3/VendedCredentialsProvider.java:121-160, which also
stamps ``s3.session-token-expires-at-ms`` into the client config).

The STS call itself is AWS-bound, so it sits behind the injectable
`StsClient` seam (the same pattern as the S3/GCS/Azure/SQS clients in
this repo): `Boto3StsClient` binds the real ``sts.assume_role`` call
shape when boto3 is installed; tests drive `AssumeRoleProvider`'s
caching/refresh/expiry logic — the part that is actually testable —
through a fake client and a fake clock.
"""

from __future__ import annotations

import threading
import time


class StsClient:
    """AssumeRole call surface (AssumeRoleRequest: roleArn +
    roleSessionName + durationSeconds, CredentialsProvider.java:24-27).
    Returns {"access_key_id", "secret_access_key", "session_token",
    "expiration_ms"}."""

    def assume_role(
        self, role_arn: str, session_name: str, duration_seconds: int
    ) -> dict:
        raise NotImplementedError


class Boto3StsClient(StsClient):
    """Real binding via boto3 (import-gated; boto3 is absent in this
    sandbox, so only the call shape lives here)."""

    def __init__(self, client=None):
        if client is None:  # pragma: no cover - needs boto3 + AWS
            try:
                import boto3
            except ImportError as e:
                raise RuntimeError(
                    "STS credential vending requires the 'boto3' package"
                ) from e
            client = boto3.client("sts")
        self._client = client

    def assume_role(self, role_arn, session_name, duration_seconds):  # pragma: no cover
        resp = self._client.assume_role(
            RoleArn=role_arn,
            RoleSessionName=session_name,
            DurationSeconds=duration_seconds,
        )
        creds = resp["Credentials"]
        return {
            "access_key_id": creds["AccessKeyId"],
            "secret_access_key": creds["SecretAccessKey"],
            "session_token": creds["SessionToken"],
            "expiration_ms": int(creds["Expiration"].timestamp() * 1000),
        }


def session_name_for_token(token_name: str) -> str:
    """``ice-rest-catalog.<name>`` / ``ice-rest-catalog``
    (Main.java:399-402)."""
    return f"ice-rest-catalog.{token_name}" if token_name else "ice-rest-catalog"


class AssumeRoleProvider:
    """Caching assume-role provider: one STS call serves requests until
    the session nears expiry, then a single refresh replaces it
    (CachedSupplier semantics — prefetch ahead of the hard deadline,
    VendedCredentialsProvider.java:153-159). Thread-safe: concurrent
    vends during a refresh window make at most one STS call."""

    def __init__(
        self,
        sts: StsClient,
        role_arn: str,
        session_name: str,
        duration_seconds: int = 3600,
        refresh_skew_seconds: int = 300,
        clock=time.time,
    ):
        self.sts = sts
        self.role_arn = role_arn
        self.session_name = session_name
        self.duration_seconds = duration_seconds
        self.refresh_skew_seconds = refresh_skew_seconds
        self._clock = clock
        self._lock = threading.Lock()
        self._cached: dict | None = None

    def _stale(self) -> bool:
        if self._cached is None:
            return True
        deadline = self._cached["expiration_ms"] / 1000.0 - self.refresh_skew_seconds
        return self._clock() >= deadline

    def credentials(self) -> dict:
        """Current session credentials, refreshed when within the skew
        window of expiry."""
        with self._lock:
            if self._stale():
                self._cached = self.sts.assume_role(
                    self.role_arn, self.session_name, self.duration_seconds
                )
            return dict(self._cached)

    def storage_config(self) -> dict:
        """Iceberg client config keys for LoadTableResult `config` —
        the exact keys S3FileIO reads, plus the expiry stamp
        (VendedCredentialsProvider.java:44,121-147)."""
        c = self.credentials()
        return {
            "s3.access-key-id": c["access_key_id"],
            "s3.secret-access-key": c["secret_access_key"],
            "s3.session-token": c["session_token"],
            "s3.session-token-expires-at-ms": str(c["expiration_ms"]),
        }


def build_token_providers(
    tokens: dict[str, dict],
    sts: StsClient | None,
    anonymous: bool = False,
    anonymous_role_arn: str = "",
) -> dict[str, AssumeRoleProvider]:
    """Per-token provider map (Main.java:374-396): tokens whose config
    carries ``aws_assume_role_arn`` get an assume-role provider keyed
    by the token string; anonymous access gets one under ``""`` when
    configured. Tokens without a role ARN fall through to the static
    storage credentials (the reference's default-provider path)."""
    providers: dict[str, AssumeRoleProvider] = {}
    if sts is None:
        return providers
    for token, info in tokens.items():
        arn = info.get("aws_assume_role_arn")
        if arn:
            providers[token] = AssumeRoleProvider(
                sts, arn, session_name_for_token(info.get("name", ""))
            )
    if anonymous and anonymous_role_arn:
        providers[""] = AssumeRoleProvider(
            sts, anonymous_role_arn, session_name_for_token("anonymous")
        )
    return providers
