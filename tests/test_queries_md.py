"""QUERIES.md is generated from the registry — pin that it can't go
stale (a new @register without a regen fails here, not at the judge)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def test_queries_md_up_to_date():
    r = subprocess.run(
        [sys.executable, "tools/gen_queries_md.py", "--check"],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert r.returncode == 0, r.stdout + r.stderr
