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

While the lock is held, a daemon thread renews the lease every
ttl/3 (etcd's keepAlive), so a commit longer than ttl_sec keeps
mutual exclusion instead of silently falling back to CAS-only
behavior. Release re-reads the lease and unlinks only when BOTH the
token matches AND the lease is unexpired — a holder that somehow
lost its lease (e.g. the renewal thread died and the TTL passed) can
no longer unlink a new holder's lock file. The residual window
between that check and the unlink is benign: we just observed our
own unexpired lease, and breakers only unlink *expired* leases.
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

    def _read_lease(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _owns(self, path: str, token: str) -> bool:
        lease = self._read_lease(path)
        return lease is not None and lease.get("token") == token

    def _renew_loop(self, path: str, token: str, stop: threading.Event) -> None:
        """Extend the lease every ttl/3 while held (etcd keepAlive).
        Renewing at ttl/3 means the lease is always ≥2/3·ttl from
        expiry when we rewrite it, so no breaker races the replace
        under normal scheduling. The check-then-replace is NOT atomic,
        so mutual exclusion is best-effort under clock stalls: a
        renewer paused past the TTL (process freeze, slow disk) can
        overwrite a breaker's fresh lease. That's acceptable — this
        lock is an advisory throughput optimization layered over the
        commit CAS, which stays the true linearization point; two
        holders merely race the CAS like unlocked writers would."""
        while not stop.wait(self.ttl_sec / 3.0):
            if not self._owns(path, token):
                return  # lease lost (broken externally) — stop renewing
            tmp = f"{path}.renew-{token}"
            try:
                with open(tmp, "w") as f:
                    json.dump({"token": token, "expiry": time.time() + self.ttl_sec}, f)
                if self._owns(path, token):
                    os.replace(tmp, path)
                else:
                    os.unlink(tmp)
                    return
            except OSError:
                # renewal is best-effort; holder falls back to TTL —
                # but never leak the temp file
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                return

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
        stop = threading.Event()
        renewer = threading.Thread(
            target=self._renew_loop, args=(path, token, stop), daemon=True
        )
        renewer.start()
        try:
            yield
        finally:
            stop.set()
            renewer.join(timeout=self.ttl_sec)
            # Release only a lease we verifiably still hold: token must
            # match AND the lease must be unexpired. An expired lease may
            # already have been broken and re-taken — unlinking on a bare
            # token match could delete the new holder's file (ADVICE r6).
            lease = self._read_lease(path)
            if (
                lease is not None
                and lease.get("token") == token
                and time.time() <= lease.get("expiry", 0)
            ):
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
