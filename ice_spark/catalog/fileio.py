"""FileIO seam for the catalog's METADATA plane.

The reference routes all table IO through a scheme-dispatching FileIO
(`ice/.../internal/iceberg/io/SchemeFileIO.java:61-197`, local impl
`LocalFileIO.java:36-283`). This module is the same seam for the
Python control plane: every metadata read/write/commit in
`catalog/table.py` goes through a `FileIO`, so an object-store
implementation can slot in without touching commit logic.

The DATA plane (parquet) is deliberately NOT behind this seam: data
files are read and written by Spark executors through Hadoop's own
FileSystem abstraction — putting a Python driver-side interface in
that path would serialize 100 TB through one process. The seam covers
exactly what the driver owns: metadata.json, manifest lists, manifest
shards, version hints, and control-plane deletes.

CAS mapping per backend:

- Local (`LocalFileIO`): `create_exclusive` = write temp + `os.link`
  (atomic create; first committer wins), `write_atomic` = temp +
  `os.replace`.
- S3 (documented, not shipped — no creds/network in the sandbox):
  `create_exclusive` = conditional `PutObject` with `If-None-Match: *`
  (S3 has supported atomic conditional writes since 2024-08);
  `write_atomic` = plain `PutObject` (single-key PUTs are atomic).
  The commit protocol in `table.py` needs nothing else.
- In-memory (`InMemoryFileIO`): dict behind one lock; used by the
  concurrency tests to prove the commit protocol depends only on this
  interface, and it counts ops so scale tests can assert commit cost
  is O(delta), not O(table).
"""

from __future__ import annotations

import os
import posixpath
import threading


class FileIO:
    """Metadata-plane file IO. Paths are plain strings; local paths
    for LocalFileIO, any key-like string for other impls."""

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_atomic(self, path: str, text: str) -> None:
        """Full-content atomic write (last writer wins)."""
        raise NotImplementedError

    def create_exclusive(self, path: str, text: str) -> None:
        """Atomic create-if-absent; raises FileExistsError if present.
        This is the commit linearization point."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Names (not paths) of entries directly under `path`."""
        raise NotImplementedError

    def walk_files(self, root: str) -> list[str]:
        """All file paths under `root`, recursively."""
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Last-modified time in SECONDS SINCE THE EPOCH. Part of the
        interface contract: retention windows (orphan/manifest GC)
        compare this against wall-clock cutoffs, so an impl returning
        logical counters would silently void every age guard."""
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX impl — exactly the calls table.py used to make inline."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_atomic(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, path)  # atomic create-exclusive
        except FileExistsError:
            raise
        except OSError:
            # filesystems without hard links (some NFS/overlay/FAT):
            # O_EXCL create is still atomic there; only the
            # write-then-link two-step is lost, and the content is
            # small metadata written in one call.
            with open(path, "x") as f:
                f.write(text)
        finally:
            os.unlink(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_dir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def walk_files(self, root: str) -> list[str]:
        out: list[str] = []
        for r, _d, fnames in os.walk(root):
            for fn in fnames:
                out.append(os.path.join(r, fn))
        return out

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


class InMemoryFileIO(FileIO):
    """Thread-safe dict-backed IO with op counters.

    `counts` keys: reads / writes / cas / deletes / lists. Scale tests
    use these to assert a bounded-partition commit touches O(1) files
    regardless of table size.
    """

    def __init__(self) -> None:
        self._files: dict[str, str] = {}
        self._mtimes: dict[str, float] = {}
        self._lock = threading.Lock()
        self.counts = {"reads": 0, "writes": 0, "cas": 0, "deletes": 0, "lists": 0}
        #: bytes of text handed to write_atomic/create_exclusive since
        #: the last reset — the metadata-plane probe's per-commit cost
        self.bytes_written = 0
        self._clock = 0.0  # last issued mtime; keeps epoch times strictly increasing

    def _norm(self, path: str) -> str:
        return posixpath.normpath(path.replace(os.sep, "/"))

    def reset_counts(self) -> None:
        for k in self.counts:
            self.counts[k] = 0
        self.bytes_written = 0

    def read_text(self, path: str) -> str:
        with self._lock:
            self.counts["reads"] += 1
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            return self._files[p]

    def _touch(self, p: str) -> None:
        # epoch seconds (interface contract), strictly increasing so
        # ordering asserts stay deterministic within a test
        import time

        self._clock = max(self._clock + 1e-6, time.time())
        self._mtimes[p] = self._clock

    def write_atomic(self, path: str, text: str) -> None:
        with self._lock:
            self.counts["writes"] += 1
            self.bytes_written += len(text)
            p = self._norm(path)
            self._files[p] = text
            self._touch(p)

    def create_exclusive(self, path: str, text: str) -> None:
        with self._lock:
            self.counts["cas"] += 1
            self.bytes_written += len(text)
            p = self._norm(path)
            if p in self._files:
                raise FileExistsError(path)
            self._files[p] = text
            self._touch(p)

    def exists(self, path: str) -> bool:
        with self._lock:
            return self._norm(path) in self._files

    def delete(self, path: str) -> None:
        with self._lock:
            self.counts["deletes"] += 1
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            del self._files[p]
            self._mtimes.pop(p, None)

    def mkdirs(self, path: str) -> None:
        pass  # keys are flat; directories are implicit

    def list_dir(self, path: str) -> list[str]:
        with self._lock:
            self.counts["lists"] += 1
            prefix = self._norm(path).rstrip("/") + "/"
            names = {
                p[len(prefix) :].split("/", 1)[0]
                for p in self._files
                if p.startswith(prefix)
            }
            return sorted(names)

    def walk_files(self, root: str) -> list[str]:
        with self._lock:
            self.counts["lists"] += 1
            prefix = self._norm(root).rstrip("/") + "/"
            return sorted(p for p in self._files if p.startswith(prefix))

    def mtime(self, path: str) -> float:
        with self._lock:
            p = self._norm(path)
            if p not in self._mtimes:
                raise FileNotFoundError(path)
            return self._mtimes[p]

    def size(self, path: str) -> int:
        with self._lock:
            p = self._norm(path)
            if p not in self._files:
                raise FileNotFoundError(path)
            return len(self._files[p])


DEFAULT_IO = LocalFileIO()
