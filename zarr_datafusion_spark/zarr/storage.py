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

This container ships no ``fsspec``/``s3fs``/``gcsfs``, so the
credentialed s3/gs path is imported lazily and raises a clear error
when absent.  Two adapters are pure stdlib (urllib) and fully live:
the ``http(s)`` adapter (any store published over HTTP), and the
``s3://`` path-style adapter (unsigned GET + ListObjectsV2 against
any S3-compatible endpoint — the reference's public-bucket mode) —
both proven by socket-crossing tests in ``tests/test_zarr_source.py``.
"""

from __future__ import annotations

from dataclasses import dataclass


def _probe_404(open_fn, url: str, method: str = "GET") -> bool:
    """Existence probe with a strict absence contract: ``True`` when the
    URL serves, ``False`` ONLY on a definitive HTTP 404 (the object-store
    "no such key" answer).  Every other failure — timeout, connection
    error, 5xx, 403 throttling/auth — RE-RAISES.

    Why strict: the Zarr chunk contract maps "chunk absent" to the
    array's fill value (``chunkio.read_chunk``), so an existence probe
    that swallowed a transient network error as ``False`` would silently
    substitute fill values for a chunk that exists — wrong query results
    with no error (ADVICE r7).  At fan-out scale object-store throttling
    (503/SlowDown) is routine; a scan must fail loudly and retry at the
    task level, never degrade to fabricated data.
    """
    import urllib.error

    try:
        with open_fn(url, method=method):
            return True
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return False
        raise


def _head_last_modified(open_fn, url: str) -> float | None:
    """Epoch seconds from one HEAD's ``Last-Modified`` header, or
    ``None`` when the object is definitively absent (404) or the
    server sends no stamp.  The age probe behind ``gc_repo``'s grace
    window — real object stores (S3/GCS/Azure) always stamp objects;
    ``None`` therefore means "age unknown" and the caller decides
    (gc treats it as old, documented there)."""
    import urllib.error
    from email.utils import parsedate_to_datetime

    try:
        with open_fn(url, method="HEAD") as resp:
            stamp = resp.headers.get("Last-Modified")
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise
    if not stamp:
        return None
    try:
        return parsedate_to_datetime(stamp).timestamp()
    except (TypeError, ValueError):
        return None


def tmp_name(path: str) -> str:
    """Private tmp filename for an atomic write targeting ``path``.

    The pid component keeps cross-PROCESS writers apart; the per-call
    uuid keeps two THREADS of one process apart (ADVICE r12: pid-only
    names let racing threads link torn/foreign bytes).  The ``.tmp``
    substring is a CONTRACT: debris recovery, ``prune_stale_siblings``,
    and the chunk walks all filter on it — one helper so the next
    change to tmp-name semantics happens in exactly one place
    (r13 review: the pattern had been copy-pasted four times)."""
    import os
    import uuid

    return f"{path}.tmp{os.getpid()}-{uuid.uuid4().hex[:8]}"


@dataclass(frozen=True)
class StorageLocation:
    """Parsed store location (reference ``StorageLocation::parse``,
    ``storage.rs:63-89``)."""

    scheme: str  # 'file' | 's3' | 'gs' | 'az' | 'http' | 'https'
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
        if location.startswith("reference://"):
            # kerchunk virtual store: the "path" is the refs JSON
            # document (itself a local path or URL), kept verbatim
            rest = location[len("reference://") :]
            if not rest:
                raise ValueError(f"missing refs path in {location!r}")
            return cls("reference", "", rest)
        if location.startswith("icechunk://"):
            # transactional snapshot repo: "<repo>[@<ref>]", verbatim
            rest = location[len("icechunk://") :]
            if not rest:
                raise ValueError(f"missing repository path in {location!r}")
            return cls("icechunk", "", rest)
        for scheme in ("s3", "gs", "az", "http", "https"):
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
                "(supported: local paths, file://, s3://, gs://, az://, "
                "http://, https://)"
            )
        return cls("file", "", location)

    def url(self) -> str:
        if self.scheme == "file":
            return self.path
        if self.scheme == "reference":
            return f"reference://{self.path}"
        if self.scheme == "icechunk":
            return f"icechunk://{self.path}"
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

    def try_read_bytes(self, p: str) -> bytes | None:
        """One-round-trip read: None ONLY on definitive absence (the
        chunk-is-fill case); every other failure raises (the strict
        ADVICE r7 contract, same as the exists probes)."""
        try:
            with open(p, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None
        except NotADirectoryError:
            return None  # a path component is a file: definitively absent

    # -- write surface (transactional commits) ------------------------
    def obj_exists(self, p: str) -> bool:
        """Object-granular existence (no directory semantics) — the
        cheap skip probe for immutable content-addressed writes."""
        import os

        return os.path.isfile(p)

    def write_bytes(
        self, p: str, payload: bytes, *, if_none_match: bool = False
    ) -> None:
        """Atomic object write.  ``if_none_match`` is the conditional
        CREATE (HTTP ``If-None-Match: *`` semantics): the write
        succeeds only if no object exists at ``p``, else
        ``FileExistsError`` — fsync'd-tmp + ``os.link`` locally, so the
        object appears only with its complete bytes and exactly one
        concurrent creator wins."""
        import os

        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        # pid+uuid tmp (tmp_name): two threads racing the same ref must
        # never share a tmp file (ADVICE r12)
        tmp = tmp_name(p)
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            if if_none_match:
                os.link(tmp, p)  # O_EXCL race semantics, atomic content
            else:
                os.replace(tmp, p)
                return
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def delete_object(self, p: str) -> None:
        import os

        try:
            os.unlink(p)
        except FileNotFoundError:
            pass

    def mtime(self, p: str) -> float | None:
        """Object age for gc's grace window; None on absence."""
        import os

        try:
            return os.path.getmtime(p)
        except (FileNotFoundError, NotADirectoryError):
            return None


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

    def try_read_bytes(self, p: str) -> bytes | None:
        """Single-request read; None only on the filesystem's own
        definitive not-found (fsspec maps object-store 404/NoSuchKey to
        FileNotFoundError; throttling/auth/timeouts re-raise)."""
        try:
            return self.fs.cat(p)
        except FileNotFoundError:
            return None


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
        return _probe_404(self._get, url, method)

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

    def try_read_bytes(self, p: str) -> bytes | None:
        """ONE GET per chunk instead of HEAD-then-GET (halves the
        round trips of a remote scan); None only on a definitive 404
        — any other failure re-raises (strict ADVICE r7 contract)."""
        import urllib.error

        try:
            with self._get(p) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode()


def _sigv4_headers(
    method: str,
    url: str,
    access_key: str,
    secret_key: str,
    session_token: str | None,
    region: str,
    amzdate: str | None = None,
    payload: bytes = b"",
) -> dict[str, str]:
    """AWS Signature Version 4 request headers for an S3 request —
    ``payload`` is the request body (empty for GET/HEAD; the PUT body
    for writes — its SHA256 rides in ``x-amz-content-sha256`` and the
    canonical request, so a tampered body fails verification).
    Pure stdlib (``hmac``/``hashlib``), implementing the
    public SigV4 algorithm (canonical request → string-to-sign → HMAC
    key derivation chain), the credentialed request path the reference
    builds through the AWS SDK credential chain (``storage.rs:134-151``).

    Returns ``x-amz-date``, ``x-amz-content-sha256`` (empty-payload
    SHA256 — GET/HEAD only), optional ``x-amz-security-token``, and
    the ``Authorization`` header.  The canonical URI is the request
    path exactly as sent (S3 signs the single-encoded path, no
    normalization) — callers must pass the URL in its wire form, i.e.
    with the key already RFC-3986-encoded, which
    :meth:`S3HttpStoreFS._obj_url` does (``quote(key)``); keys needing
    encoding (space, '+', unicode, '%') therefore sign correctly —
    proven live in ``test_s3_sigv4_adapter_live`` against the
    signature-verifying server (ADVICE r8).  The canonical query
    re-encodes each decoded name/value RFC-3986-style and sorts —
    :meth:`S3HttpStoreFS._list` emits its query in exactly that
    canonical form, so what is signed is byte-for-byte what is sent."""
    import hashlib
    import hmac
    import time as _time
    from urllib.parse import parse_qsl, quote, urlsplit

    parts = urlsplit(url)
    if amzdate is None:
        amzdate = _time.strftime("%Y%m%dT%H%M%SZ", _time.gmtime())
    datestamp = amzdate[:8]

    def enc(s: str) -> str:
        return quote(s, safe="-_.~")

    canonical_query = "&".join(
        f"{k}={v}"
        for k, v in sorted(
            (enc(k), enc(v))
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
        )
    )
    payload_hash = hashlib.sha256(payload).hexdigest()
    headers = {
        "host": parts.netloc,
        "x-amz-content-sha256": payload_hash,
        "x-amz-date": amzdate,
    }
    if session_token:
        headers["x-amz-security-token"] = session_token
    signed = ";".join(sorted(headers))
    canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
    creq = "\n".join(
        [
            method,
            parts.path or "/",
            canonical_query,
            canonical_headers,
            signed,
            payload_hash,
        ]
    )
    scope = f"{datestamp}/{region}/s3/aws4_request"
    sts = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amzdate,
            scope,
            hashlib.sha256(creq.encode()).hexdigest(),
        ]
    )

    def _hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _hm(("AWS4" + secret_key).encode(), datestamp)
    k = _hm(k, region)
    k = _hm(k, "s3")
    k = _hm(k, "aws4_request")
    signature = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
    out = {h: v for h, v in headers.items() if h != "host"}
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={signature}"
    )
    return out


def _s3_env_credentials() -> tuple[str, str, str | None, str] | None:
    """(access_key, secret_key, session_token, region) from the
    standard AWS environment variables, or None when no key pair is
    present (anonymous/public-bucket mode)."""
    import os

    ak = os.environ.get("AWS_ACCESS_KEY_ID")
    sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
    if not (ak and sk):
        return None
    region = (
        os.environ.get("AWS_REGION")
        or os.environ.get("AWS_DEFAULT_REGION")
        or "us-east-1"
    )
    return (ak, sk, os.environ.get("AWS_SESSION_TOKEN"), region)


class S3HttpStoreFS:
    """Path-style S3 adapter over stdlib urllib — the reference's S3
    store semantics (``storage.rs:134-151``) with zero package
    dependencies, in both of the reference's modes: ANONYMOUS
    (public buckets, unsigned requests) and CREDENTIALED (SigV4-signed
    requests from the standard ``$AWS_ACCESS_KEY_ID`` /
    ``$AWS_SECRET_ACCESS_KEY`` / ``$AWS_SESSION_TOKEN`` environment
    chain — ship to executors via ``spark.executorEnv.*``).  Signing
    is per-request (:func:`_sigv4_headers`), proven live against a
    local server that VERIFIES each signature before serving.

    Requests go path-style to an S3-compatible endpoint:
    ``{endpoint}/{bucket}/{key}`` for objects, ListObjectsV2
    (``?list-type=2&prefix=...&delimiter=/``) for listings — the
    protocol every S3-compatible server (AWS, MinIO, Ceph RGW,
    localstack) speaks.  The endpoint comes from the AWS SDK's
    standard ``$AWS_ENDPOINT_URL_S3`` / ``$AWS_ENDPOINT_URL``
    environment variables (default ``https://s3.amazonaws.com``); on a
    cluster, ship it to executors via ``spark.executorEnv.*``.  No
    request signing: this path serves PUBLIC buckets (the reference's
    no-credential mode); credentialed access goes through the fsspec
    adapter when s3fs is installed.

    Like :class:`HttpStoreFS`, each Spark task constructs its own
    instance from the store URL — a 1000-task scan fans GETs across
    the object store with no shared client or driver bottleneck.
    Listings paginate with continuation tokens, so stores with >1000
    keys per level list completely.
    """

    _TIMEOUT = 10.0

    def __init__(
        self,
        endpoint: str | None = None,
        credentials: tuple | str | None = "auto",
    ):
        import os

        self.endpoint = (
            endpoint
            or os.environ.get("AWS_ENDPOINT_URL_S3")
            or os.environ.get("AWS_ENDPOINT_URL")
            or "https://s3.amazonaws.com"
        ).rstrip("/")
        # credentials: "auto" -> read the AWS env chain; None -> force
        # unsigned (public-bucket mode); or an explicit
        # (access_key, secret_key, session_token, region) tuple
        self.credentials = (
            _s3_env_credentials() if credentials == "auto" else credentials
        )

    @staticmethod
    def _split(p: str) -> tuple[str, str]:
        """``s3://bucket/key`` -> (bucket, key)."""
        loc = StorageLocation.parse(p)
        return loc.bucket, loc.path.strip("/")

    def _obj_url(self, p: str) -> str:
        from urllib.parse import quote

        bucket, key = self._split(p)
        return f"{self.endpoint}/{bucket}/{quote(key)}"

    def _open(self, url: str, method: str = "GET"):
        import urllib.request

        req = urllib.request.Request(url, method=method)
        if self.credentials:
            ak, sk, token, region = self.credentials
            for h, v in _sigv4_headers(method, url, ak, sk, token, region).items():
                req.add_header(h, v)
        return urllib.request.urlopen(req, timeout=self._TIMEOUT)

    def _ok(self, url: str, method: str = "GET") -> bool:
        return _probe_404(self._open, url, method)

    def _list(self, p: str) -> tuple[list[str], list[str]]:
        """ListObjectsV2 under ``key/`` with ``delimiter=/`` →
        (direct child object keys, child "directory" prefixes),
        following continuation tokens.  The query string is emitted in
        SigV4 CANONICAL form (RFC-3986 encoding, sorted) so the signed
        canonical query is byte-identical to the wire bytes."""
        import urllib.parse
        import xml.etree.ElementTree as ET

        bucket, key = self._split(p)
        prefix = f"{key}/" if key else ""
        contents: list[str] = []
        prefixes: list[str] = []
        token: str | None = None
        while True:
            q = {"list-type": "2", "prefix": prefix, "delimiter": "/"}
            if token:
                q["continuation-token"] = token

            def _enc(s: str) -> str:
                return urllib.parse.quote(s, safe="-_.~")

            qs = "&".join(
                f"{k}={v}" for k, v in sorted((_enc(k), _enc(v)) for k, v in q.items())
            )
            url = f"{self.endpoint}/{bucket}?{qs}"
            with self._open(url) as resp:
                doc = ET.fromstring(resp.read())

            def _tag(el) -> str:  # strip the S3 XML namespace
                return el.tag.rsplit("}", 1)[-1]

            token = None
            truncated = False
            for el in doc:
                t = _tag(el)
                if t == "Contents":
                    for sub in el:
                        if _tag(sub) == "Key":
                            contents.append(sub.text or "")
                elif t == "CommonPrefixes":
                    for sub in el:
                        if _tag(sub) == "Prefix":
                            prefixes.append(sub.text or "")
                elif t == "IsTruncated":
                    truncated = (el.text or "").strip() == "true"
                elif t == "NextContinuationToken":
                    token = (el.text or "").strip() or None
            if not (truncated and token):
                break
        return contents, prefixes

    def exists(self, p: str) -> bool:
        if self._ok(self._obj_url(p), method="HEAD"):
            return True
        return self.isdir(p)

    def isdir(self, p: str) -> bool:
        # S3 has no directories: a "directory" exists iff the prefix
        # has at least one key under it
        contents, prefixes = self._list(p)
        return bool(contents or prefixes)

    def listdir(self, p: str) -> list[str]:
        _, key = self._split(p)
        plen = len(f"{key}/" if key else "")
        contents, prefixes = self._list(p)
        names = {c[plen:] for c in contents}
        names |= {x[plen:].rstrip("/") for x in prefixes}
        return sorted(n for n in names if n)

    def read_bytes(self, p: str) -> bytes:
        with self._open(self._obj_url(p)) as resp:
            return resp.read()

    def try_read_bytes(self, p: str) -> bytes | None:
        """One signed GET per chunk (no HEAD pre-probe); None only on
        the object store's definitive 404, everything else raises."""
        import urllib.error

        try:
            with self._open(self._obj_url(p)) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode()

    # -- write surface (transactional commits) ------------------------
    def obj_exists(self, p: str) -> bool:
        """One HEAD — object-granular, no prefix-listing fallback."""
        return self._ok(self._obj_url(p), method="HEAD")

    def write_bytes(
        self, p: str, payload: bytes, *, if_none_match: bool = False
    ) -> None:
        """PUT an object (SigV4-signed over the body hash when
        credentialed).  ``if_none_match`` sends ``If-None-Match: *`` —
        S3's conditional-write CREATE: the store answers 412 (or 409
        for an in-flight concurrent create) when the key exists, which
        maps to ``FileExistsError``.  S3 PUTs are atomic per key, so a
        reader never sees partial bytes."""
        import urllib.error
        import urllib.request

        url = self._obj_url(p)
        req = urllib.request.Request(url, data=payload, method="PUT")
        if if_none_match:
            req.add_header("If-None-Match", "*")
        if self.credentials:
            ak, sk, token, region = self.credentials
            for h, v in _sigv4_headers(
                "PUT", url, ak, sk, token, region, payload=payload
            ).items():
                req.add_header(h, v)
        try:
            with urllib.request.urlopen(req, timeout=self._TIMEOUT):
                pass
        except urllib.error.HTTPError as e:
            if if_none_match and e.code in (409, 412):
                raise FileExistsError(p) from None
            raise

    def delete_object(self, p: str) -> None:
        import urllib.error

        try:
            with self._open(self._obj_url(p), method="DELETE"):
                pass
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise

    def mtime(self, p: str) -> float | None:
        return _head_last_modified(self._open, self._obj_url(p))


def _b64url(b: bytes) -> str:
    import base64

    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _der_read(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV: (tag, value, next_pos) — the minimal ASN.1 walk
    RSA key parsing needs (definite lengths only, which is what PEM
    keys use)."""
    tag = data[pos]
    pos += 1
    ln = data[pos]
    pos += 1
    if ln & 0x80:
        nb = ln & 0x7F
        ln = int.from_bytes(data[pos : pos + nb], "big")
        pos += nb
    return tag, data[pos : pos + ln], pos + ln


def _rsa_private_from_der(der: bytes) -> tuple[int, int]:
    """(n, d) from a DER-encoded RSA private key — PKCS#1
    ``RSAPrivateKey`` (SEQUENCE of INTEGERs) or PKCS#8
    ``PrivateKeyInfo`` (which wraps a PKCS#1 blob in an OCTET
    STRING).  Pure stdlib; only the modulus and private exponent are
    needed for RSASSA-PKCS1-v1_5 signing via ``pow``."""
    _tag, body, _end = _der_read(der, 0)  # outer SEQUENCE
    elems: list[tuple[int, bytes]] = []
    pos = 0
    while pos < len(body):
        t, v, pos = _der_read(body, pos)
        elems.append((t, v))
    # PKCS#8: version INTEGER, AlgorithmIdentifier SEQUENCE, OCTET STRING
    if len(elems) >= 3 and elems[1][0] == 0x30 and elems[2][0] == 0x04:
        return _rsa_private_from_der(elems[2][1])
    ints = [int.from_bytes(v, "big") for t, v in elems if t == 0x02]
    if len(ints) < 4:
        raise ValueError("not an RSA private key (too few INTEGER fields)")
    _version, n, _e, d = ints[0], ints[1], ints[2], ints[3]
    return n, d


def _rsa_key_from_pem(pem: str) -> tuple[int, int]:
    import base64
    import re as _re

    m = _re.search(
        r"-----BEGIN (?:RSA )?PRIVATE KEY-----(.*?)-----END",
        pem,
        _re.DOTALL,
    )
    if not m:
        raise ValueError("no PEM private key block found")
    der = base64.b64decode("".join(m.group(1).split()))
    return _rsa_private_from_der(der)


#: DigestInfo prefix for SHA-256 (EMSA-PKCS1-v1_5, RFC 8017 §9.2)
_SHA256_DIGESTINFO = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)


def _rsassa_pkcs1_sha256(message: bytes, n: int, d: int) -> bytes:
    """RSASSA-PKCS1-v1_5 over stdlib ``pow`` — the RS256 signature a
    GCS service-account JWT needs (public algorithm, RFC 8017 §8.2):
    EMSA-PKCS1-v1_5 encoding (00 01 FF.. 00 DigestInfo ‖ SHA-256),
    then the private-key power ``m^d mod n``."""
    import hashlib

    h = hashlib.sha256(message).digest()
    k = (n.bit_length() + 7) // 8
    pad_len = k - len(_SHA256_DIGESTINFO) - len(h) - 3
    if pad_len < 8:
        raise ValueError("RSA modulus too small for SHA-256 PKCS#1 v1.5")
    em = b"\x00\x01" + b"\xff" * pad_len + b"\x00" + _SHA256_DIGESTINFO + h
    return pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")


#: scope the read-side adapter requests (the reference's GCS store is
#: read-only too, storage.rs:155-188)
_GCS_SCOPE = "https://www.googleapis.com/auth/devstorage.read_only"

#: process-wide token cache: creds path -> (access_token, expiry_unix).
#: Each Spark Python worker process fetches at most one token per key
#: file and reuses it until 60 s before expiry.
_GCS_TOKEN_CACHE: dict[str, tuple[str, float]] = {}


def _gcs_access_token(creds_path: str, force: bool = False) -> str:
    """OAuth2 access token via the service-account JWT-bearer flow —
    pure stdlib, the credentialed half of the reference's GCS client
    (``storage.rs:155-188``, which delegates to the cloud SDK's same
    flow): build a RS256-signed JWT from the key file
    (``client_email`` / ``private_key`` / ``token_uri``), POST it as a
    ``jwt-bearer`` assertion grant, cache the returned token to
    expiry.  Proven live against a server that independently verifies
    the JWT signature before issuing (``tests/test_zarr_source.py``,
    the SigV4-verifier pattern).  ``force=True`` bypasses the cache
    (a server-side 401/403 on a cached token means it was revoked or
    the issuer rotated — refresh once and retry)."""
    import json as _json
    import time as _time
    import urllib.parse
    import urllib.request

    hit = _GCS_TOKEN_CACHE.get(creds_path)
    if not force and hit and hit[1] - 60 > _time.time():
        return hit[0]
    with open(creds_path) as f:
        info = _json.load(f)
    n, d = _rsa_key_from_pem(info["private_key"])
    now = int(_time.time())
    header = _b64url(_json.dumps({"alg": "RS256", "typ": "JWT"}).encode())
    claims = _b64url(
        _json.dumps(
            {
                "iss": info["client_email"],
                "scope": _GCS_SCOPE,
                "aud": info["token_uri"],
                "iat": now,
                "exp": now + 3600,
            }
        ).encode()
    )
    signing_input = f"{header}.{claims}".encode()
    sig = _rsassa_pkcs1_sha256(signing_input, n, d)
    assertion = f"{header}.{claims}.{_b64url(sig)}"
    body = urllib.parse.urlencode(
        {
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": assertion,
        }
    ).encode()
    req = urllib.request.Request(
        info["token_uri"],
        data=body,
        method="POST",
        headers={"Content-Type": "application/x-www-form-urlencoded"},
    )
    with urllib.request.urlopen(req, timeout=10.0) as resp:
        payload = _json.loads(resp.read())
    token = payload["access_token"]
    expiry = _time.time() + float(payload.get("expires_in", 3600))
    _GCS_TOKEN_CACHE[creds_path] = (token, expiry)
    return token


class GcsHttpStoreFS:
    """GCS adapter over stdlib urllib — the reference's full GCS
    fallback chain (``storage.rs:155-188``): ANONYMOUS first (public
    buckets), then CREDENTIALED via the service-account OAuth2
    JWT-bearer flow when the bucket refuses anonymous access and
    ``$GOOGLE_APPLICATION_CREDENTIALS`` names a key file.  Zero
    package dependencies: the RS256 JWT is signed with the stdlib
    RSA primitives above (:func:`_gcs_access_token`), and each request
    retries once with ``Authorization: Bearer`` after a 401/403 —
    so public stores never pay a token round-trip, exactly the
    reference's anonymous-then-credentialed order.

    Objects download path-style (``{endpoint}/{bucket}/{key}``, the
    GCS XML API GET — anonymous for public objects); listings use the
    JSON API (``{endpoint}/storage/v1/b/{bucket}/o?prefix=...&
    delimiter=/``) with ``nextPageToken`` pagination.  The endpoint
    honors ``$STORAGE_EMULATOR_HOST`` (the GCS client-library emulator
    convention; fake-gcs-server, local test servers), defaulting to
    ``https://storage.googleapis.com``; on a cluster, ship the
    override via ``spark.executorEnv.*``.  Credentialed access goes
    through the fsspec adapter when gcsfs is installed.  Per-task
    construction fans reads across executors like the other stdlib
    adapters."""

    _TIMEOUT = 10.0

    def __init__(
        self,
        endpoint: str | None = None,
        credentials_path: str | None = "auto",
    ):
        import os

        ep = endpoint or os.environ.get("STORAGE_EMULATOR_HOST") or (
            "https://storage.googleapis.com"
        )
        if "://" not in ep:
            ep = f"http://{ep}"  # emulator convention: bare host:port
        self.endpoint = ep.rstrip("/")
        # "auto" -> the standard env chain; None -> force anonymous
        # (negative tests); else an explicit key-file path
        self.credentials_path = (
            os.environ.get("GOOGLE_APPLICATION_CREDENTIALS")
            if credentials_path == "auto"
            else credentials_path
        )

    @staticmethod
    def _split(p: str) -> tuple[str, str]:
        loc = StorageLocation.parse(p)
        return loc.bucket, loc.path.strip("/")

    def _obj_url(self, p: str) -> str:
        from urllib.parse import quote

        bucket, key = self._split(p)
        return f"{self.endpoint}/{bucket}/{quote(key)}"

    def _open(self, url: str, method: str = "GET"):
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, method=method)
        try:
            return urllib.request.urlopen(req, timeout=self._TIMEOUT)
        except urllib.error.HTTPError as e:
            # anonymous-first, credentialed on refusal — the
            # reference's fallback order (storage.rs:155-188); a
            # 401/403 with no key file (or one that still fails)
            # propagates under the strict probe contract
            if e.code not in (401, 403) or not self.credentials_path:
                raise

            def bearer(token: str):
                r = urllib.request.Request(
                    url,
                    method=method,
                    headers={"Authorization": f"Bearer {token}"},
                )
                return urllib.request.urlopen(r, timeout=self._TIMEOUT)

            try:
                return bearer(_gcs_access_token(self.credentials_path))
            except urllib.error.HTTPError as e2:
                # a cached token the server no longer accepts (revoked,
                # issuer restarted) — refresh ONCE, then propagate
                if e2.code not in (401, 403):
                    raise
                return bearer(
                    _gcs_access_token(self.credentials_path, force=True)
                )

    def _ok(self, url: str, method: str = "GET") -> bool:
        return _probe_404(self._open, url, method)

    def _list(self, p: str) -> tuple[list[str], list[str]]:
        """JSON-API listing under ``key/`` with ``delimiter=/`` →
        (direct child object names, child prefixes), following
        ``nextPageToken``."""
        import json as _json
        import urllib.parse

        bucket, key = self._split(p)
        prefix = f"{key}/" if key else ""
        items: list[str] = []
        prefixes: list[str] = []
        token: str | None = None
        while True:
            q = {"prefix": prefix, "delimiter": "/"}
            if token:
                q["pageToken"] = token
            url = (
                f"{self.endpoint}/storage/v1/b/{bucket}/o?"
                f"{urllib.parse.urlencode(q)}"
            )
            with self._open(url) as resp:
                doc = _json.loads(resp.read())
            items += [it["name"] for it in doc.get("items", []) if "name" in it]
            prefixes += doc.get("prefixes", [])
            token = doc.get("nextPageToken")
            if not token:
                break
        return items, prefixes

    def exists(self, p: str) -> bool:
        if self._ok(self._obj_url(p), method="HEAD"):
            return True
        return self.isdir(p)

    def isdir(self, p: str) -> bool:
        items, prefixes = self._list(p)
        return bool(items or prefixes)

    def listdir(self, p: str) -> list[str]:
        _, key = self._split(p)
        plen = len(f"{key}/" if key else "")
        items, prefixes = self._list(p)
        names = {it[plen:] for it in items}
        names |= {x[plen:].rstrip("/") for x in prefixes}
        return sorted(n for n in names if n)

    def read_bytes(self, p: str) -> bytes:
        with self._open(self._obj_url(p)) as resp:
            return resp.read()

    def try_read_bytes(self, p: str) -> bytes | None:
        """One signed GET per chunk (no HEAD pre-probe); None only on
        the object store's definitive 404, everything else raises."""
        import urllib.error

        try:
            with self._open(self._obj_url(p)) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode()

    # -- write surface (transactional commits) ------------------------
    def obj_exists(self, p: str) -> bool:
        return self._ok(self._obj_url(p), method="HEAD")

    def write_bytes(
        self, p: str, payload: bytes, *, if_none_match: bool = False
    ) -> None:
        """XML-API PUT; ``if_none_match`` sends
        ``x-goog-if-generation-match: 0`` — GCS's conditional CREATE
        (generation 0 = "no live object"), 412 when the object exists
        → ``FileExistsError``.  Anonymous-first with the same one-shot
        bearer retry as reads."""
        import urllib.error
        import urllib.request

        url = self._obj_url(p)
        base_headers: dict[str, str] = {}
        if if_none_match:
            base_headers["x-goog-if-generation-match"] = "0"

        def attempt(headers: dict[str, str]):
            req = urllib.request.Request(
                url, data=payload, method="PUT", headers=headers
            )
            return urllib.request.urlopen(req, timeout=self._TIMEOUT)

        try:
            try:
                with attempt(base_headers):
                    return
            except urllib.error.HTTPError as e:
                if e.code not in (401, 403) or not self.credentials_path:
                    raise
                tok = _gcs_access_token(self.credentials_path)
                try:
                    with attempt(
                        {**base_headers, "Authorization": f"Bearer {tok}"}
                    ):
                        return
                except urllib.error.HTTPError as e2:
                    if e2.code not in (401, 403):
                        raise
                    tok = _gcs_access_token(self.credentials_path, force=True)
                    with attempt(
                        {**base_headers, "Authorization": f"Bearer {tok}"}
                    ):
                        return
        except urllib.error.HTTPError as e:
            if if_none_match and e.code in (409, 412):
                raise FileExistsError(p) from None
            raise

    def delete_object(self, p: str) -> None:
        import urllib.error

        try:
            with self._open(self._obj_url(p), method="DELETE"):
                pass
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise

    def mtime(self, p: str) -> float | None:
        return _head_last_modified(self._open, self._obj_url(p))


class AzureHttpStoreFS:
    """Azure Blob Storage adapter over stdlib urllib — the one storage
    scheme on the reference's roadmap (``README.md:322`` names
    S3/GCS/Azure) its code never implemented (``storage.rs:63-89`` has
    only local/s3/gs).  Public-container (anonymous) reads plus
    optional SAS-token auth: a SAS rides as a query string on every
    request (the standard delegation mechanism Azure tooling emits),
    from ``$AZURE_STORAGE_SAS_TOKEN``.  Shared-key signing is
    deliberately not implemented — SAS covers the credentialed cases
    without key custody.

    Objects are path-style ``{endpoint}/{container}/{key}``; listings
    use the List Blobs XML API (``?restype=container&comp=list&
    prefix=...&delimiter=/``) with ``NextMarker`` pagination.  The
    endpoint comes from ``$AZURE_STORAGE_ENDPOINT`` (Azurite/emulator
    or a custom domain) or ``https://{$AZURE_STORAGE_ACCOUNT}.blob.
    core.windows.net``.  The write surface matches the other object
    stores: atomic per-blob PUTs (``x-ms-blob-type: BlockBlob``), and
    ``If-None-Match: *`` is Azure's conditional CREATE (409
    BlobAlreadyExists / 412 both map to ``FileExistsError``) — so
    icechunk transactional commits work on ``az://`` repos through the
    same capability probe.  Per-task construction fans reads across
    executors like the other stdlib adapters."""

    _TIMEOUT = 10.0

    def __init__(self, endpoint: str | None = None, sas: str | None = "auto"):
        import os

        ep = endpoint or os.environ.get("AZURE_STORAGE_ENDPOINT")
        if not ep:
            account = os.environ.get("AZURE_STORAGE_ACCOUNT")
            if not account:
                raise ValueError(
                    "az:// stores need $AZURE_STORAGE_ENDPOINT or "
                    "$AZURE_STORAGE_ACCOUNT"
                )
            ep = f"https://{account}.blob.core.windows.net"
        if "://" not in ep:
            ep = f"http://{ep}"  # emulator convention: bare host:port
        self.endpoint = ep.rstrip("/")
        self.sas = (
            os.environ.get("AZURE_STORAGE_SAS_TOKEN") if sas == "auto" else sas
        )
        if self.sas:
            self.sas = self.sas.lstrip("?")

    @staticmethod
    def _split(p: str) -> tuple[str, str]:
        loc = StorageLocation.parse(p)
        return loc.bucket, loc.path.strip("/")

    def _url(self, base: str, query: str = "") -> str:
        parts = [q for q in (query, self.sas) if q]
        return f"{base}?{'&'.join(parts)}" if parts else base

    def _obj_url(self, p: str) -> str:
        from urllib.parse import quote

        container, key = self._split(p)
        return self._url(f"{self.endpoint}/{container}/{quote(key)}")

    def _open(self, url: str, method: str = "GET"):
        import urllib.request

        req = urllib.request.Request(url, method=method)
        return urllib.request.urlopen(req, timeout=self._TIMEOUT)

    def _ok(self, url: str, method: str = "GET") -> bool:
        return _probe_404(self._open, url, method)

    def _list(self, p: str) -> tuple[list[str], list[str]]:
        """List Blobs under ``key/`` with ``delimiter=/`` → (direct
        child blob names, child prefixes), following NextMarker."""
        import urllib.parse
        import xml.etree.ElementTree as ET

        container, key = self._split(p)
        prefix = f"{key}/" if key else ""
        blobs: list[str] = []
        prefixes: list[str] = []
        marker: str | None = None
        while True:
            q = {
                "restype": "container",
                "comp": "list",
                "prefix": prefix,
                "delimiter": "/",
            }
            if marker:
                q["marker"] = marker
            url = self._url(
                f"{self.endpoint}/{container}", urllib.parse.urlencode(q)
            )
            with self._open(url) as resp:
                doc = ET.fromstring(resp.read())
            # every child lookup strips namespaces the same way the
            # Blob/BlobPrefix dispatch does: a namespaced response must
            # not silently stop pagination after one 5000-blob page —
            # gc_repo's live set is built from these listings, and a
            # truncated refs listing would delete live snapshots
            # (ADVICE r12)
            def _child_text(el, want: str) -> str | None:
                for c in el:
                    if c.tag.rsplit("}", 1)[-1] == want:
                        return c.text
                return None

            marker = None
            for el in doc.iter():
                tag = el.tag.rsplit("}", 1)[-1]
                if tag == "Blob":
                    name = _child_text(el, "Name")
                    if name:
                        blobs.append(name)
                elif tag == "BlobPrefix":
                    name = _child_text(el, "Name")
                    if name:
                        prefixes.append(name)
                elif tag == "NextMarker" and el.text:
                    marker = el.text.strip() or None
            if not marker:
                break
        return blobs, prefixes

    def exists(self, p: str) -> bool:
        if self._ok(self._obj_url(p), method="HEAD"):
            return True
        return self.isdir(p)

    def isdir(self, p: str) -> bool:
        blobs, prefixes = self._list(p)
        return bool(blobs or prefixes)

    def listdir(self, p: str) -> list[str]:
        _, key = self._split(p)
        plen = len(f"{key}/" if key else "")
        blobs, prefixes = self._list(p)
        names = {b[plen:] for b in blobs}
        names |= {x[plen:].rstrip("/") for x in prefixes}
        return sorted(n for n in names if n)

    def read_bytes(self, p: str) -> bytes:
        with self._open(self._obj_url(p)) as resp:
            return resp.read()

    def try_read_bytes(self, p: str) -> bytes | None:
        """One GET per chunk; None only on the definitive 404."""
        import urllib.error

        try:
            with self._open(self._obj_url(p)) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode()

    # -- write surface (transactional commits) ------------------------
    def obj_exists(self, p: str) -> bool:
        return self._ok(self._obj_url(p), method="HEAD")

    def write_bytes(
        self, p: str, payload: bytes, *, if_none_match: bool = False
    ) -> None:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self._obj_url(p), data=payload, method="PUT"
        )
        req.add_header("x-ms-blob-type", "BlockBlob")
        if if_none_match:
            req.add_header("If-None-Match", "*")
        try:
            with urllib.request.urlopen(req, timeout=self._TIMEOUT):
                pass
        except urllib.error.HTTPError as e:
            # Azure answers 409 BlobAlreadyExists or 412 per API version
            if if_none_match and e.code in (409, 412):
                raise FileExistsError(p) from None
            raise

    def delete_object(self, p: str) -> None:
        import urllib.error

        try:
            with self._open(self._obj_url(p), method="DELETE"):
                pass
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise

    def mtime(self, p: str) -> float | None:
        return _head_last_modified(self._open, self._obj_url(p))


#: per-process writer-adapter cache: one (fs, norm) per location so
#: per-chunk writes on executors don't re-dispatch (and re-read env
#: credentials) for every object.  Entries expire after
#: ``_WRITABLE_TTL_S`` so expiring credentials (STS session tokens,
#: short-lived SAS) captured at construction are re-read from the
#: environment within minutes instead of 403-ing until process
#: restart (ADVICE r12); 4 minutes amortizes construction over many
#: chunk writes while staying far inside any token lifetime.
_WRITABLE_TTL_S = 240.0
_WRITABLE_CACHE: dict[str, tuple] = {}


def writable_store_fs(path: str):
    """(adapter, normalized path) with a WRITE-capable adapter — the
    write-side twin of :func:`store_fs`, shared by the transactional
    layer (icechunk commits) and the distributed sink.  Local paths use
    :class:`LocalStoreFS`; ``s3://``/``gs://``/``az://`` dispatch
    DIRECTLY to the stdlib adapters, whose atomic per-key PUT and
    conditional create (``If-None-Match``) are what make remote writes
    safe — deliberately NOT through :func:`store_fs`, whose read-side
    preference for a credentialed fsspec client (when s3fs/gcsfs are
    installed) would hand back an adapter with no write path and refuse
    writes in exactly the environments the read path prefers.  Backends
    without an atomic write path (plain http, fsspec) refuse loudly."""
    import time

    cached = _WRITABLE_CACHE.get(path)
    if cached is not None:
        stamp, out = cached
        if time.monotonic() - stamp < _WRITABLE_TTL_S:
            return out
        # pop, not del: two threads racing the same expired entry must
        # both fall through to a rebuild, not KeyError (r13 review)
        _WRITABLE_CACHE.pop(path, None)
    loc = StorageLocation.parse(path)
    if loc.scheme == "file":
        out = (LocalStoreFS(), loc.path)
    elif loc.scheme == "s3":
        out = (S3HttpStoreFS(), loc.url())
    elif loc.scheme == "gs":
        out = (GcsHttpStoreFS(), loc.url())
    elif loc.scheme == "az":
        out = (AzureHttpStoreFS(), loc.url())
    else:
        fs, _norm = store_fs(path)
        raise NotImplementedError(
            f"writes to {path!r}: the {type(fs).__name__} backend has "
            "no atomic conditional-create (If-None-Match) write path; "
            "writable stores are local paths, s3://, gs://, and az://"
        )
    _WRITABLE_CACHE[path] = (time.monotonic(), out)
    return out


def store_fs(store_path: str):
    """(adapter, normalized path) for a store location — the dispatch
    point between local, HTTP, and object-store reads.  ``s3://`` and
    ``gs://`` prefer a credential-capable fsspec client and fall back
    to the unsigned/anonymous stdlib adapters (public-bucket
    semantics, the reference's no-credential modes) when the packages
    are absent."""
    loc = StorageLocation.parse(store_path)
    if loc.scheme == "reference":
        from zarr_datafusion_spark.zarr.kerchunk import ReferenceStoreFS

        fs = ReferenceStoreFS(loc.path)
        return fs, fs.root
    if loc.scheme == "icechunk":
        from zarr_datafusion_spark.zarr.icechunk import (
            IcechunkStoreFS,
            parse_icechunk_url,
        )

        repo, ref = parse_icechunk_url(store_path)
        fs = IcechunkStoreFS(repo, ref, requested=store_path)
        return fs, fs.root
    if loc.scheme in ("http", "https"):
        return HttpStoreFS(), loc.url()
    if loc.scheme == "s3":
        try:
            return FsspecStoreFS(open_filesystem(loc)), loc.url()
        except (NotImplementedError, ImportError):
            return S3HttpStoreFS(), loc.url()
    if loc.scheme == "gs":
        try:
            return FsspecStoreFS(open_filesystem(loc)), loc.url()
        except (NotImplementedError, ImportError):
            return GcsHttpStoreFS(), loc.url()
    if loc.scheme == "az":
        return AzureHttpStoreFS(), loc.url()
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
