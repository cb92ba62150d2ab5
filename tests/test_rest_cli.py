"""CLI ↔ REST server integration: `serve` verb as a subprocess, catalog
verbs driven through `--uri` (the reference's CLI-to-ice-rest-catalog
deployment shape, examples/docker-compose)."""

from __future__ import annotations

import json
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = "/root/repo"


@pytest.fixture()
def served(tmp_path):
    wh = tmp_path / "wh"
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "ice_spark.cli",
            "--warehouse",
            str(wh),
            "serve",
            "--port",
            "0",
            "--serve-token",
            "secret",
            "--serve-token",
            "viewer:ro",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        text=True,
    )
    line = proc.stdout.readline()
    url = json.loads(line)["serving"]
    # wait until it answers
    for _ in range(50):
        try:
            urllib.request.urlopen(url + "/v1/config", timeout=1)
            break
        except Exception:  # noqa: BLE001
            time.sleep(0.1)
    yield url
    proc.terminate()
    proc.wait(timeout=10)


def _cli(url: str, token: str, *verb: str) -> tuple[int, str]:
    p = subprocess.run(
        [
            sys.executable,
            "-m",
            "ice_spark.cli",
            "--warehouse",
            "/nonexistent-ignored",
            "--uri",
            url,
            "--token",
            token,
            *verb,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    return p.returncode, p.stdout


def test_cli_roundtrip_over_rest(served):
    code, out = _cli(served, "secret", "check")
    assert code == 0 and json.loads(out)["ok"] is True

    code, _ = _cli(served, "secret", "create-namespace", "corp")
    assert code == 0
    code, out = _cli(served, "secret", "list-namespaces")
    assert code == 0 and json.loads(out) == ["corp"]

    code, out = _cli(served, "secret", "create-view", "corp.v", "SELECT 1 AS one")
    assert code == 0
    code, out = _cli(served, "secret", "list-views", "corp")
    assert code == 0 and json.loads(out) == ["v"]

    # read-only token: reads succeed, writes fail non-zero
    code, out = _cli(served, "viewer", "list-namespaces")
    assert code == 0 and json.loads(out) == ["corp"]
    code, _ = _cli(served, "viewer", "create-namespace", "nope")
    assert code != 0
