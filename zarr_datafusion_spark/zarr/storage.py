"""Storage locations for Zarr stores — local FS, ``s3://``, ``gs://``,
``http(s)://``.

Mirrors the reference's ``StorageLocation`` (``src/reader/storage.rs:63-131``):
URL parsing into (scheme, bucket, prefix), remote detection
(``storage.rs:191-193``), and a store-opening factory.  The reference
builds object-store clients (S3 ``storage.rs:134-151``, GCS with an
anonymous-then-credentials fallback ``storage.rs:155-188``); the Spark
analog is per-task filesystem adapters — each executor opens its own
client, so a 1000-task scan fans out across the object store with no
driver bottleneck.

This container ships no ``fsspec``/``s3fs``/``gcsfs``, so the s3/gs
path is imported lazily and raises a clear error when absent; the
``http(s)`` adapter is pure stdlib (urllib) and fully live — it is
both a real capability (any store published over HTTP: a static file
host, an object-store public endpoint) and the environment-independent
proof of the remote read path (socket-crossing tests in
``tests/test_zarr_source.py``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class StorageLocation:
    """Parsed store location (reference ``StorageLocation::parse``,
    ``storage.rs:63-89``)."""

    scheme: str  # 'file' | 's3' | 'gs' | 'http' | 'https'
    bucket: str  # empty for local; host[:port] for http(s)
    path: str  # local path, or key prefix within the bucket/host

    @property
    def is_remote(self) -> bool:
        """``storage.rs:191-193``."""
        return self.scheme != "file"

    @classmethod
    def parse(cls, location: str) -> "StorageLocation":
        if location.startswith("file://"):
            return cls("file", "", location[len("file://") :])
        for scheme in ("s3", "gs", "http", "https"):
            prefix = f"{scheme}://"
            if location.startswith(prefix):
                rest = location[len(prefix) :]
                if not rest:
                    raise ValueError(f"missing bucket in {location!r}")
                bucket, _, path = rest.partition("/")
                return cls(scheme, bucket, path.rstrip("/"))
        if "://" in location:
            raise ValueError(
                f"unsupported storage scheme in {location!r} "
                "(supported: local paths, file://, s3://, gs://, "
                "http://, https://)"
            )
        return cls("file", "", location)

    def url(self) -> str:
        if self.scheme == "file":
            return self.path
        return f"{self.scheme}://{self.bucket}/{self.path}"


class LocalStoreFS:
    """Filesystem adapter for local stores (sync reads, like the
    reference's local path ``zarr_reader.rs:61-64``)."""

    def exists(self, p: str) -> bool:
        import os

        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        import os

        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        import os

        return os.listdir(p)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def read_bytes(self, p: str) -> bytes:
        with open(p, "rb") as f:
            return f.read()


class FsspecStoreFS:
    """Filesystem adapter over an fsspec filesystem (S3/GCS) — each
    executor task constructs its own client, fanning object-store reads
    across the cluster (the reference reads remote stores through one
    async client, ``storage.rs:112-188``)."""

    def __init__(self, fs):
        self.fs = fs

    def exists(self, p: str) -> bool:
        return self.fs.exists(p)

    def isdir(self, p: str) -> bool:
        return self.fs.isdir(p)

    def listdir(self, p: str) -> list[str]:
        return [
            x.rstrip("/").rsplit("/", 1)[-1]
            for x in self.fs.ls(p, detail=False)
        ]

    def read_text(self, p: str) -> str:
        return self.fs.cat(p).decode()

    def read_bytes(self, p: str) -> bytes:
        return self.fs.cat(p)


class HttpStoreFS:
    """Stdlib filesystem adapter for stores served over HTTP(S) — no
    fsspec needed.  Works against any server exposing the store tree as
    plain GET-able paths with directory index pages (``http.server``,
    nginx autoindex, most static hosts); consolidated-metadata stores
    (``.zmetadata``) never hit the listing path at all, which is also
    the low-round-trip layout for real object stores.

    Each Spark task constructs its own instance (the adapter ships in
    the partition closure by store URL, not by connection), so a
    1000-task scan fans requests out without a shared client — the
    Spark analog of the reference's per-store object-store client
    (``storage.rs:112-188``)."""

    _TIMEOUT = 10.0

    def _get(self, url: str, method: str = "GET"):
        import urllib.request

        req = urllib.request.Request(url, method=method)
        return urllib.request.urlopen(req, timeout=self._TIMEOUT)

    def _ok(self, url: str, method: str = "GET") -> bool:
        import urllib.error

        try:
            with self._get(url, method=method):
                return True
        except (urllib.error.URLError, OSError, ValueError):
            return False

    def exists(self, p: str) -> bool:
        # files answer HEAD directly; dir URLs redirect to p/ and then
        # serve an index page — both count (urllib follows redirects)
        return self._ok(p, method="HEAD") or self._ok(p.rstrip("/") + "/")

    def isdir(self, p: str) -> bool:
        # only directories serve an index at the trailing-slash URL;
        # file paths with a trailing slash 404
        return self._ok(p.rstrip("/") + "/")

    def listdir(self, p: str) -> list[str]:
        from html.parser import HTMLParser
        from urllib.parse import unquote, urlparse

        with self._get(p.rstrip("/") + "/") as resp:
            page = resp.read().decode("utf-8", "replace")

        class _Hrefs(HTMLParser):
            def __init__(self) -> None:
                super().__init__()
                self.names: list[str] = []

            def handle_starttag(self, tag, attrs):
                if tag != "a":
                    return
                href = dict(attrs).get("href")
                if not href or href.startswith(("?", "#")):
                    return
                path = urlparse(href).path.rstrip("/")
                name = unquote(path.rsplit("/", 1)[-1])
                # index pages link '..' / absolute parents; keep plain
                # child entries only
                if name and name not in ("..", "."):
                    self.names.append(name)

        parser = _Hrefs()
        parser.feed(page)
        return sorted(set(parser.names))

    def read_bytes(self, p: str) -> bytes:
        with self._get(p) as resp:
            return resp.read()

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode()


def store_fs(store_path: str):
    """(adapter, normalized path) for a store location — the dispatch
    point between local, HTTP, and object-store reads."""
    loc = StorageLocation.parse(store_path)
    if loc.scheme in ("http", "https"):
        return HttpStoreFS(), loc.url()
    if loc.is_remote:
        return FsspecStoreFS(open_filesystem(loc)), loc.url()
    return LocalStoreFS(), loc.path


def open_filesystem(loc: StorageLocation):
    """fsspec filesystem for a remote location (the ``build_s3_store`` /
    ``build_gcs_store`` analog, ``storage.rs:134-188``).  Anonymous
    access is attempted first for GCS, like the reference's fallback
    chain."""
    if not loc.is_remote:
        raise ValueError("open_filesystem is for remote locations")
    try:
        import fsspec
    except ImportError as e:
        raise NotImplementedError(
            f"remote Zarr store {loc.url()!r} requires the 'fsspec' package "
            "(plus s3fs for s3:// or gcsfs for gs://), which is not "
            "installed in this environment"
        ) from e
    if loc.scheme == "gs":
        try:
            fs = fsspec.filesystem("gs", token="anon")
            fs.ls(loc.bucket, detail=False)
            return fs
        except Exception:
            return fsspec.filesystem("gs")  # credentialed fallback
    return fsspec.filesystem("s3")
