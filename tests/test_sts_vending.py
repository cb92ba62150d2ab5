"""STS assume-role credential vending (reference middleware parity).

The reference builds one AWS credentials provider per bearer token:
tokens with an ``awsAssumeRoleARN`` get STS session credentials
assumed under session name ``ice-rest-catalog.<token-name>``
(ice-rest-catalog Main.java:353-402, CredentialsProvider.java:21-31),
cached and refreshed before expiry (the SDK CachedSupplier inside
StsAssumeRoleCredentialsProvider; the client side stamps
``s3.session-token-expires-at-ms`` —
ice/.../aws/s3/VendedCredentialsProvider.java:44,121-160).

The STS network call is AWS-bound; these tests drive the cache /
refresh / per-token-isolation logic through the injectable StsClient
seam and the full REST round-trip over a fake STS.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.sqlite_catalog import SqliteCatalog
from ice_spark.rest import RestCatalogClient, RestCatalogServer, ServerConfig
from ice_spark.rest.credentials import (
    AssumeRoleProvider,
    build_token_providers,
    session_name_for_token,
)

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


class FakeSts:
    """Deterministic STS double: credentials encode the role + call
    ordinal so tests can see exactly which call produced them."""

    def __init__(self, clock, lifetime_sec=3600):
        self.clock = clock
        self.lifetime_sec = lifetime_sec
        self.calls = []

    def assume_role(self, role_arn, session_name, duration_seconds):
        self.calls.append((role_arn, session_name, duration_seconds))
        n = len(self.calls)
        role = role_arn.rsplit("/", 1)[-1]
        return {
            "access_key_id": f"AKIA{role}{n}",
            "secret_access_key": f"secret-{role}-{n}",
            "session_token": f"token-{role}-{n}",
            "expiration_ms": int((self.clock() + self.lifetime_sec) * 1000),
        }


class Clock:
    def __init__(self, t=1_000_000.0):
        self.t = t

    def __call__(self):
        return self.t


class TestAssumeRoleProvider:
    def test_caches_until_refresh_window(self):
        clock = Clock()
        sts = FakeSts(clock, lifetime_sec=3600)
        p = AssumeRoleProvider(
            sts, "arn:aws:iam::1:role/etl", "ice-rest-catalog.etl",
            refresh_skew_seconds=300, clock=clock,
        )
        c1 = p.credentials()
        c2 = p.credentials()
        assert c1 == c2 and len(sts.calls) == 1
        # inside validity but within the 300s pre-expiry skew → refresh
        clock.t += 3600 - 299
        c3 = p.credentials()
        assert len(sts.calls) == 2 and c3["session_token"] != c1["session_token"]

    def test_no_refresh_before_skew(self):
        clock = Clock()
        sts = FakeSts(clock, lifetime_sec=3600)
        p = AssumeRoleProvider(
            sts, "arn:aws:iam::1:role/etl", "s", refresh_skew_seconds=300, clock=clock
        )
        p.credentials()
        clock.t += 3600 - 301  # still outside the skew window
        p.credentials()
        assert len(sts.calls) == 1

    def test_storage_config_keys(self):
        clock = Clock()
        sts = FakeSts(clock)
        p = AssumeRoleProvider(sts, "arn:aws:iam::1:role/x", "s", clock=clock)
        cfg = p.storage_config()
        assert set(cfg) == {
            "s3.access-key-id",
            "s3.secret-access-key",
            "s3.session-token",
            "s3.session-token-expires-at-ms",
        }
        assert cfg["s3.session-token-expires-at-ms"] == str(
            int((clock() + 3600) * 1000)
        )

    def test_concurrent_vends_single_refresh(self):
        clock = Clock()
        sts = FakeSts(clock)
        p = AssumeRoleProvider(sts, "arn:aws:iam::1:role/x", "s", clock=clock)
        results = []
        threads = [
            threading.Thread(target=lambda: results.append(p.credentials()))
            for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(sts.calls) == 1
        assert all(r == results[0] for r in results)

    def test_session_names(self):
        assert session_name_for_token("etl") == "ice-rest-catalog.etl"
        assert session_name_for_token("") == "ice-rest-catalog"


class TestProviderMap:
    def test_per_token_and_anonymous(self):
        clock = Clock()
        sts = FakeSts(clock)
        tokens = {
            "tok-a": {"name": "a", "aws_assume_role_arn": "arn:aws:iam::1:role/ra"},
            "tok-b": {"name": "b"},  # no ARN → static-cred path
        }
        provs = build_token_providers(
            tokens, sts, anonymous=True, anonymous_role_arn="arn:aws:iam::1:role/anon"
        )
        assert set(provs) == {"tok-a", ""}
        assert provs["tok-a"].session_name == "ice-rest-catalog.a"
        assert provs[""].session_name == "ice-rest-catalog.anonymous"
        # no sts client → no providers, regardless of config
        assert build_token_providers(tokens, None, True, "arn:x") == {}


class TestRestVending:
    def _server(self, tmp_path, clock):
        cat = SqliteCatalog(None, str(tmp_path / "wh"))
        sts = FakeSts(clock)
        cfg = ServerConfig(
            tokens={
                "tok-sts": {
                    "name": "etl",
                    "vend_credentials": True,
                    "aws_assume_role_arn": "arn:aws:iam::1:role/etl",
                },
                "tok-static": {"name": "plain", "vend_credentials": True},
                "tok-novend": {"name": "novend"},
            },
            storage_credentials={"s3.endpoint": "http://minio:9000"},
            sts_client=sts,
        )
        # the providers use the test clock for expiry decisions
        for p in cfg.token_providers.values():
            p._clock = clock
        srv = RestCatalogServer(cat, cfg).start()
        return cat, sts, srv

    def test_sts_token_gets_session_creds(self, tmp_path):
        clock = Clock()
        cat, sts, srv = self._server(tmp_path, clock)
        try:
            c = RestCatalogClient(srv.url, token="tok-sts")
            c.create_namespace("ns1")
            c.create_table("ns1.t1", SCHEMA.jsonValue())
            cfg = c.vended_storage_config("ns1.t1")
            # session creds layered over the static storage config
            assert cfg["s3.endpoint"] == "http://minio:9000"
            assert cfg["s3.access-key-id"] == "AKIAetl1"
            assert cfg["s3.session-token"] == "token-etl-1"
            assert "s3.session-token-expires-at-ms" in cfg
            assert sts.calls == [("arn:aws:iam::1:role/etl", "ice-rest-catalog.etl", 3600)]
            # second load within validity: cached, no second STS call
            c.vended_storage_config("ns1.t1")
            assert len(sts.calls) == 1
            # session expires → next load refreshes
            clock.t += 3600
            cfg2 = c.vended_storage_config("ns1.t1")
            assert cfg2["s3.session-token"] == "token-etl-2"
            assert len(sts.calls) == 2
        finally:
            srv.stop()

    def test_static_token_and_optout_unchanged(self, tmp_path):
        clock = Clock()
        cat, sts, srv = self._server(tmp_path, clock)
        try:
            c = RestCatalogClient(srv.url, token="tok-static")
            c.create_namespace("ns1")
            c.create_table("ns1.t1", SCHEMA.jsonValue())
            # opted-in token without a role ARN → static creds only
            assert c.vended_storage_config("ns1.t1") == {
                "s3.endpoint": "http://minio:9000"
            }
            # token that never opted in → nothing, and no STS call
            c2 = RestCatalogClient(srv.url, token="tok-novend")
            assert c2.vended_storage_config("ns1.t1") == {}
            assert sts.calls == []
        finally:
            srv.stop()
