"""Optional per-table commit lock with TTL leases.

Reference parity: ice-rest-catalog's etcd CommitLock
(ice-rest-catalog/.../internal/etcd/CommitLock.java:69-146) — a
lease-scoped per-table mutex taken around the commit critical section
when `commitLock` is configured, with an acquire timeout that turns
into HTTP 503 for the client. CAS retries alone are *correct*; the
lock adds fairness under commit storms (no writer starves behind a
faster CAS winner repeatedly).

This engine's catalog is file-backed, so the lease lives in a lock
file created with O_CREAT|O_EXCL (the same linearization primitive the
table CAS uses). The file holds (owner_token, expiry_unix); a crashed
holder's lease is broken after its TTL passes — exactly the etcd
lease-expiry semantics, minus the watch (we poll with backoff).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from contextlib import contextmanager


class LockTimeout(Exception):
    """Acquire exceeded its budget (reference maps this to HTTP 503)."""


class CommitLock:
    def __init__(
        self,
        lock_dir: str,
        ttl_sec: float = 10.0,
        acquire_timeout_sec: float = 5.0,
        poll_sec: float = 0.01,
    ):
        self.lock_dir = lock_dir
        self.ttl_sec = ttl_sec
        self.acquire_timeout_sec = acquire_timeout_sec
        self.poll_sec = poll_sec
        os.makedirs(lock_dir, exist_ok=True)
        # one token per lock instance + thread for reentrancy checks
        self._local = threading.local()

    def _path(self, ident: str) -> str:
        safe = ident.replace("/", "_").replace(os.sep, "_")
        return os.path.join(self.lock_dir, f"{safe}.lock")

    def _try_take(self, path: str, token: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return self._try_break_expired(path)
        with os.fdopen(fd, "w") as f:
            json.dump({"token": token, "expiry": time.time() + self.ttl_sec}, f)
        return False  # created fresh — caller re-verifies ownership

    def _try_break_expired(self, path: str) -> bool:
        try:
            with open(path) as f:
                lease = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return False  # racing holder mid-write/unlink; just retry
        if time.time() > lease.get("expiry", 0):
            # expired lease: break it. unlink+retry is benign — losers
            # of the ensuing O_EXCL race go back to polling.
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
        return False

    def _owns(self, path: str, token: str) -> bool:
        try:
            with open(path) as f:
                return json.load(f).get("token") == token
        except (FileNotFoundError, json.JSONDecodeError):
            return False

    @contextmanager
    def acquire(self, ident: str):
        """Hold the per-table lease for the duration of the block.
        Raises LockTimeout when the budget runs out."""
        path = self._path(ident)
        token = uuid.uuid4().hex
        deadline = time.monotonic() + self.acquire_timeout_sec
        backoff = self.poll_sec
        while True:
            self._try_take(path, token)
            if self._owns(path, token):
                break
            if time.monotonic() >= deadline:
                raise LockTimeout(f"commit lock on {ident!r} not acquired")
            time.sleep(backoff)
            backoff = min(backoff * 2, 0.1)
        try:
            yield
        finally:
            if self._owns(path, token):
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
