"""Transactional Zarr reads — snapshots, branches, tags, time travel
(reference roadmap ``/root/reference/README.md:330``: "Integrate
icechunk for transactional Zarr reads", an UNCHECKED row the reference
never built).

The icechunk package itself is not available in this environment, so
this module implements the transactional SEMANTICS natively, following
the shape of icechunk's published on-disk design (content-addressed
chunk objects, immutable snapshot + manifest documents, branch refs as
generation files whose names sort latest-first so "resolve head" is
one LIST, tags as write-once refs — see the public icechunk spec).
Documents are JSON rather than icechunk's flatbuffers/msgpack, i.e.
this is an icechunk-STYLE repository format, not byte-compatible with
the icechunk crate; what is preserved is the transactional contract:

- **Atomic commits.** A commit stages only immutable content-addressed
  objects (chunks, manifest, snapshot) and becomes visible in ONE
  atomic step: create-exclusive of the branch's next generation file.
  Readers see the old snapshot or the new one, never a mix.
- **Optimistic concurrency.** Two writers committing on the same
  parent race on the same generation filename; ``O_EXCL`` makes
  exactly one win and the loser raises :class:`IcechunkConflictError`
  (its staged objects are garbage, collectable by :func:`gc_repo`).
- **Snapshot isolation / repeatable reads.** ``read_zarr`` pins a
  branch ref to its snapshot id at DataFrame construction
  (:func:`pin_snapshot`), so a query plans and executes against ONE
  immutable snapshot even if the branch advances mid-query.
- **Time travel.** Any historical snapshot stays addressable —
  ``icechunk://repo@snap:<id>``, ``@tag:<name>``, ``@branch:<name>``,
  and ``@branch:<name>~N`` (N commits back) all resolve through the
  same immutable documents.
- **Structural sharing.** Chunk payloads are stored once under their
  sha256; an append-one-slab commit writes only the new slab's chunks
  and a new manifest/snapshot — the rest of the image is shared with
  the parent, which is what makes per-commit cost proportional to the
  CHANGE at 100 TB scale, not to the store size.

Read integration: :class:`IcechunkStoreFS` serves the ordinary Zarr
key space (``.zgroup``/``.zarray``/``zarr.json`` metadata inline from
the snapshot document, chunk keys through the manifest) behind the
same adapter protocol as every other backend, so schema inference,
projection/filter/limit pushdown, chunk-statistics pruning, the LRU
chunk cache, and the SQL engine all run UNCHANGED over a snapshot.
The repository itself may live on any supported backend (local, s3,
gs, http) — reads go through :func:`~zarr_datafusion_spark.zarr.
storage.store_fs`.  COMMITS work on local, ``s3://``, and ``gs://``
repos: content-addressed objects are plain PUTs (immutable keys), and
the generation-ref create-exclusive maps to the stores' conditional
PUT (``If-None-Match: *`` / ``x-goog-if-generation-match: 0``),
verified live per endpoint by :func:`_verify_conditional_put` —
backends without an atomic conditional create refuse loudly
(``http://``, plain fsspec), because an unserialized ref publication
is not transactional.  This is the 100 TB posture item: the
transactional layer's value is highest exactly where stores are
remote.  ``append_snapshot`` works remotely too (sparse staging + a
parent-manifest merge — cost ∝ the append), and ``gc_repo`` sweeps
remote repos through the same adapters (listings + per-object
DELETEs) — the whole transactional surface is storage-independent.

Scale posture: resolving a ref costs one small LIST + two small GETs
(ref file, snapshot doc) on the driver; each executor task then reads
exactly its own chunks' content-addressed objects (no central lock, no
read amplification), and snapshot pinning means zero coordination
between tasks.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import re
import urllib.error

from zarr_datafusion_spark.zarr.storage import tmp_name as _tmp_name

__all__ = [
    "IcechunkConflictError",
    "IcechunkStoreFS",
    "append_snapshot",
    "commit_store",
    "commit_zarr",
    "create_branch",
    "create_tag",
    "gc_repo",
    "history",
    "init_repo",
    "list_refs",
    "parse_icechunk_url",
    "pin_snapshot",
    "resolve_ref",
]

_MARKER = "icechunk.json"
_FORMAT = {"format": "zds-icechunk", "spec_version": 1}
#: generation filenames sort LATEST-FIRST (icechunk's ref trick): the
#: head of a branch is the lexicographically smallest name, so one
#: sorted LIST resolves it without reading every generation.
_GEN_MAX = 10**12
#: zarr metadata basenames held inline in the snapshot document
_META_NAMES = {".zgroup", ".zarray", ".zattrs", ".zmetadata", "zarr.json"}


class IcechunkConflictError(RuntimeError):
    """A concurrent commit advanced the branch first (the optimistic-
    concurrency loss); retry by recommitting on the new head."""


_REF_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _check_ref_name(kind: str, name: str) -> str:
    """Branch/tag names must stay inside one refs-directory level and
    outside the ref grammar: ``/`` or ``..`` would escape or nest the
    refs dir, ``~`` collides with the ancestry operator, ``:``/``@``
    with the URL ref syntax — any of which makes a committed snapshot
    unreachable or worse (r11 review finding: BRANCH 'v~1' committed
    fine but could never be resolved)."""
    if not _REF_NAME_RE.match(name) or ".." in name:
        raise ValueError(
            f"invalid {kind} name {name!r}: use letters, digits, and "
            "[._-] (no leading separator, no '/', '~', ':', '@')"
        )
    return name


def _gen_name(seq: int) -> str:
    return f"gen-{_GEN_MAX - seq:012d}.json"


def _gen_seq(name: str) -> int:
    return _GEN_MAX - int(name[len("gen-") : -len(".json")])


def _digest(payload: bytes) -> str:
    return hashlib.sha256(payload).hexdigest()


def _chunk_rel(digest: str) -> str:
    # two-level fanout keeps directory listings bounded on filesystems
    return f"chunks/{digest[:2]}/{digest}"


def _require_local(repo: str, op: str) -> str:
    if "://" in repo and not repo.startswith("file://"):
        raise NotImplementedError(
            f"icechunk {op} requires a local repository path; got {repo!r}"
        )
    return repo[len("file://") :] if repo.startswith("file://") else repo


def _is_local(repo: str) -> bool:
    return "://" not in repo or repo.startswith("file://")


def _repo_writer(repo: str):
    """(fs, norm) with a WRITE-capable adapter for the repo, or a loud
    refusal — a commit whose ref publication can silently
    last-writer-win is not transactional.  Shared resolution (and
    per-process cache) with the distributed sink:
    :func:`~zarr_datafusion_spark.zarr.storage.writable_store_fs`."""
    from zarr_datafusion_spark.zarr.storage import writable_store_fs

    return writable_store_fs(repo)


def _writer_cache() -> dict:
    """The shared writer-adapter cache (tests clear it when re-pointing
    an endpoint env var at a fresh fixture server)."""
    from zarr_datafusion_spark.zarr.storage import _WRITABLE_CACHE

    return _WRITABLE_CACHE


#: endpoint-level conditional-PUT verification cache: None = unprobed,
#: True = verified, False = the backend IGNORES the precondition (the
#: silent-last-writer-wins failure mode some S3-compatibles have) —
#: refuse loudly rather than publish unserialized refs.
_COND_PUT_OK: dict[str, bool] = {}


def _verify_conditional_put(fs, norm: str) -> None:
    """One-time-per-endpoint live probe: create-exclusive the same key
    twice; the second create MUST fail with FileExistsError or the
    backend ignored the precondition and cannot host transactional
    refs.  Costs two PUTs + one DELETE per process per endpoint."""
    import uuid

    key = getattr(fs, "endpoint", None) or norm
    ok = _COND_PUT_OK.get(key)
    if ok is None:
        probe = f"{norm}/refs/.condprobe-{uuid.uuid4().hex}"
        fs.write_bytes(probe, b"{}", if_none_match=True)
        try:
            fs.write_bytes(probe, b"{}", if_none_match=True)
            ok = False
        except FileExistsError:
            ok = True
        finally:
            try:
                fs.delete_object(probe)
            except Exception:
                pass  # a stranded 2-byte probe object is harmless
        _COND_PUT_OK[key] = ok
    if not ok:
        raise NotImplementedError(
            f"object store at {key!r} ignores conditional-create "
            "preconditions (If-None-Match); refusing non-atomic ref "
            "publication"
        )


def init_repo(repo: str) -> str:
    """Create an empty repository (idempotent).  Remote object-store
    repos have no directories to create — only the format marker."""
    if _is_local(repo):
        repo = _require_local(repo, "init")
        os.makedirs(os.path.join(repo, "refs"), exist_ok=True)
        for d in ("snapshots", "manifests", "chunks"):
            os.makedirs(os.path.join(repo, d), exist_ok=True)
        marker = os.path.join(repo, _MARKER)
        if not os.path.exists(marker):
            tmp = _tmp_name(marker)
            with open(tmp, "w") as f:
                json.dump(_FORMAT, f)
            os.replace(tmp, marker)
        return repo
    fs, norm = _repo_writer(repo)
    _verify_conditional_put(fs, norm)
    if fs.try_read_bytes(f"{norm}/{_MARKER}") is None:
        fs.write_bytes(f"{norm}/{_MARKER}", _canon(_FORMAT))
    return repo


def _write_object(repo: str, rel: str, payload: bytes) -> None:
    """Immutable-object write: content under ``rel`` never changes, so
    an existing object is already correct and a concurrent writer
    racing us produces identical bytes (atomic tmp+rename locally; a
    HEAD-then-PUT on object stores, where per-key PUTs are atomic)."""
    if _is_local(repo):
        path = os.path.join(repo, rel)
        if os.path.exists(path):
            return
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = _tmp_name(path)
        with open(tmp, "wb") as f:
            f.write(payload)
        try:
            os.replace(tmp, path)
        except OSError:
            if not os.path.exists(path):
                raise
            os.unlink(tmp)
        return
    fs, norm = _repo_writer(repo)
    p = f"{norm}/{rel}"
    if fs.obj_exists(p):  # structural sharing: one HEAD beats a re-PUT
        return
    fs.write_bytes(p, payload)


def _canon(doc: dict) -> bytes:
    return json.dumps(doc, sort_keys=True, separators=(",", ":")).encode()


# ---------------------------------------------------------------------------
# refs
# ---------------------------------------------------------------------------


def _has_generation(fs, bdir: str) -> bool:
    """True when a branch directory/prefix holds a published generation
    file.  One without is crash debris — a writer died between the
    creation token and the generation publication — and must be
    treated as 'no branch' or the name is wedged forever: every later
    commit/fork would report a conflict whose 'rebase on the head'
    advice can never succeed (ADVICE r11)."""
    try:
        names = fs.listdir(bdir)
    except (FileNotFoundError, NotADirectoryError):
        return False
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return False
        raise
    return any(
        n.startswith("gen-") and n.endswith(".json") for n in names
    )


def _branch_head(fs, repo: str, branch: str) -> tuple[str, int] | None:
    """(snapshot_id, sequence) of the branch head, or None."""
    bdir = f"{repo}/refs/branch.{branch}"
    try:
        # exact gen-*.json only: in-flight ".tmp<pid>" publication
        # files must never be taken for a head (their content may be
        # mid-write)
        names = [
            n for n in fs.listdir(bdir)
            if n.startswith("gen-") and n.endswith(".json")
        ]
    except (FileNotFoundError, NotADirectoryError):
        # definitive not-found ONLY: a transient I/O failure (throttle,
        # network) must raise, not masquerade as 'branch not found' and
        # silently drop branches from resolve_ref/list_refs (ADVICE r11)
        return None
    except urllib.error.HTTPError as e:
        if e.code == 404:  # the http adapter's definitive not-found
            return None
        raise
    if not names:
        return None
    head = sorted(names)[0]  # latest-first naming
    doc = json.loads(fs.read_text(f"{bdir}/{head}"))
    return doc["snapshot"], _gen_seq(head)


def resolve_ref(repo: str, ref: str | None) -> str:
    """Resolve a ref spec to an immutable snapshot id.

    ``None``/'' → head of ``main``; ``snap:<id>`` or a bare id → that
    snapshot; ``tag:<name>`` → the tag; ``branch:<name>[~N]`` → the
    branch head (N commits back)."""
    from zarr_datafusion_spark.zarr.storage import store_fs

    fs, norm = store_fs(repo)
    ref = ref or "branch:main"
    if ref.startswith("snap:"):
        return ref[len("snap:") :]
    if ref.startswith("tag:"):
        name = ref[len("tag:") :]
        path = f"{norm}/refs/tag.{name}/ref.json"
        data = fs.try_read_bytes(path)
        if data is None:
            raise FileNotFoundError(f"icechunk tag {name!r} in {repo!r}")
        return json.loads(data.decode())["snapshot"]
    if ref.startswith("branch:"):
        spec = ref[len("branch:") :]
        name, _, back = spec.partition("~")
        head = _branch_head(fs, norm, name)
        if head is None:
            raise FileNotFoundError(f"icechunk branch {name!r} in {repo!r}")
        sid = head[0]
        for _ in range(int(back) if back else 0):
            snap = _load_snapshot(fs, norm, sid)
            sid = snap.get("parent")
            if sid is None:
                raise FileNotFoundError(
                    f"icechunk ref {ref!r}: ancestry of branch {name!r} "
                    "is shorter than requested"
                )
        return sid
    return ref  # bare snapshot id


def _load_snapshot(fs, repo: str, sid: str) -> dict:
    data = fs.try_read_bytes(f"{repo}/snapshots/{sid}.json")
    if data is None:
        raise FileNotFoundError(f"icechunk snapshot {sid!r} in {repo!r}")
    return json.loads(data.decode())


def _publish_ref_exclusive(path: str, doc: dict) -> None:
    """Create-exclusive ref publication with ATOMIC content: the
    document is fully written (and flushed) to a private tmp file,
    then ``os.link``ed into place — link both fails on an existing
    target (the O_EXCL race semantics) and exposes the file only with
    its complete bytes.  A bare ``O_EXCL`` open + buffered write has a
    window where the ref exists empty: a concurrent resolve would see
    a torn head, and a crash there would wedge the branch forever
    (r11 review finding).  The tmp name carries a per-call uuid
    besides the pid: two THREADS of one process racing the same ref
    must not share a tmp file (ADVICE r12)."""
    tmp = _tmp_name(path)
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _publish_ref(repo: str, rel: str, doc: dict) -> None:
    """Create-exclusive ref publication: fsync'd-tmp + ``os.link``
    locally; conditional PUT (``If-None-Match: *``) on object stores —
    both are the same contract: the ref appears atomically with its
    complete bytes and exactly one concurrent creator wins."""
    if _is_local(repo):
        _publish_ref_exclusive(os.path.join(repo, *rel.split("/")), doc)
        return
    fs, norm = _repo_writer(repo)
    fs.write_bytes(f"{norm}/{rel}", _canon(doc), if_none_match=True)


def _fence_branch_creation(
    repo: str, branch: str, seq: int, sid: str
) -> None:
    """Post-publish fence for branch CREATION (ADVICE r12).

    A debris recoverer that retook a LIVE creator's token makes two
    writers publish first generations at DIFFERENT filenames (their
    sequences differ), each create-exclusive publish succeeding — a
    silent lost update, since ``_branch_head`` keeps only the highest
    sequence.  Listing the generations AFTER publishing turns that
    silence into a loud :class:`IcechunkConflictError` on both sides.

    A coexisting generation is benign only when it is a legitimate
    SUCCESSOR of ours — a commit made on top of our just-published
    head, whose snapshot ancestry therefore contains our snapshot id
    at exactly our sequence.  Anything else (lower sequence, or higher
    sequence whose chain bypasses us) is the creation race.  Callers
    must treat the raise as a LOST creation: the branch exists with a
    head that may not be theirs — rebase on that head and retry, or
    pick another name.  Cost: one LIST per branch creation (and a
    snapshot read only in the already-raced case)."""
    from zarr_datafusion_spark.zarr.storage import store_fs

    fs, norm = store_fs(repo)
    bdir = f"{norm}/refs/branch.{branch}"
    others = sorted(
        n
        for n in _listdir_or_empty(fs, bdir)
        if n.startswith("gen-")
        and n.endswith(".json")
        and _gen_seq(n) != seq
    )
    for name in others:
        oseq = _gen_seq(name)
        raced = True
        try:
            if oseq > seq:
                # walk the other head's ancestry down to our sequence: a
                # legitimate successor passes through our snapshot exactly
                cur = json.loads(fs.read_text(f"{bdir}/{name}"))["snapshot"]
                while cur is not None:
                    snap = _load_snapshot(fs, norm, cur)
                    s = int(snap["sequence"])
                    if s <= seq:
                        raced = not (s == seq and cur == sid)
                        break
                    cur = snap.get("parent")
        except FileNotFoundError:
            # the rival's generation or a snapshot on its chain vanished
            # between our list and the read — a concurrent gc_repo or
            # debris prune collected it (ADVICE r13: this surfaced as a
            # raw crash).  Re-list ONCE: a rival that no longer appears
            # is no-longer-coexisting (benign — continue); one that
            # still appears has an unprovable ancestry, which stays the
            # conservative raise below (we cannot show it descends from
            # our head, so report the creation as possibly lost).
            if name not in _listdir_or_empty(fs, bdir):
                continue
        if raced:
            raise IcechunkConflictError(
                f"branch {branch!r} creation raced another writer: "
                f"generation {name!r} coexists with ours (seq {seq}) "
                "and does not descend from it; treat this creation as "
                "lost — rebase on the branch head and retry"
            )


def _acquire_branch_token(repo: str, branch: str) -> bool:
    """Exclusive branch-CREATION token — True to proceed publishing the
    first generation, False when the branch already exists (or another
    writer holds the creation right).  Two concurrent forks (or a fork
    racing a first commit) publish at DIFFERENT generation filenames
    when their snapshots' sequences differ, so a head check + gen
    O_EXCL cannot close the race — an exclusive creation token can
    (r11 review finding).  Local repos use the branch-directory mkdir;
    object stores (no directories) a conditional PUT of a ``.created``
    marker.

    A token that exists with NO published generation is crash debris
    (ADVICE r11) — but recovery must itself be EXCLUSIVE, or two
    recoverers forking at different sequences would both proceed and
    both publish (the race the token closes).  So the debris token is
    REMOVED and retaken: locally ``os.rmdir`` (fails on a non-empty
    dir, i.e. a racing publisher's generation landed) + a fresh mkdir;
    remotely a DELETE + a fresh conditional PUT.  Exactly one recoverer
    wins the retake; losers report a conflict and a later retry finds
    either a real branch or the debris again.  Residual window: a LIVE
    creator between its token and its generation publish is
    indistinguishable from debris, so a recoverer in exactly those
    microseconds can retake it and BOTH writers then publish different
    generation files, each conditional PUT succeeding at its own name —
    without a second check that is a silent lost update (ADVICE r12).
    :func:`_fence_branch_creation` closes it: every branch-creating
    publish re-lists the generations afterwards and raises
    ``IcechunkConflictError`` on BOTH sides when a non-descendant
    generation coexists, so the race is loud, never silent."""
    if _is_local(repo):
        from zarr_datafusion_spark.zarr.storage import LocalStoreFS

        bdir = os.path.join(repo, "refs", f"branch.{branch}")
        os.makedirs(os.path.dirname(bdir), exist_ok=True)
        try:
            os.mkdir(bdir)
            return True
        except FileExistsError:
            if _has_generation(LocalStoreFS(), bdir):
                return False
            # crash leftovers of the dead publisher's atomic write can
            # hold rmdir open; removing a LIVE publisher's tmp makes its
            # os.link fail loudly (ENOENT -> its commit errors and
            # retries) — never silently wrong, and debris is rare
            for name in _listdir_or_empty(LocalStoreFS(), bdir):
                if ".tmp" in name:
                    try:
                        os.unlink(os.path.join(bdir, name))
                    except OSError:
                        pass
            try:
                os.rmdir(bdir)  # refuses (ENOTEMPTY) if a gen landed
            except OSError:
                pass
            try:
                os.mkdir(bdir)
                return True
            except FileExistsError:
                return False  # lost the recovery race
    fs, norm = _repo_writer(repo)
    marker = f"{norm}/refs/branch.{branch}/.created"
    try:
        fs.write_bytes(marker, b"{}", if_none_match=True)
        return True
    except FileExistsError:
        if _has_generation(fs, f"{norm}/refs/branch.{branch}"):
            return False
        fs.delete_object(marker)
        try:
            fs.write_bytes(marker, b"{}", if_none_match=True)
            return True
        except FileExistsError:
            return False  # lost the recovery race


def create_branch(repo: str, name: str, snapshot_id: str) -> None:
    """Fork a new branch at an existing snapshot (``git branch``): the
    branch's first generation file points at the snapshot, carrying
    its ancestry depth, so later commits continue the chain with
    correct ``~N`` time travel.  Create-exclusive: forking an existing
    branch name conflicts.  Works on local and object-store repos."""
    _check_ref_name("branch", name)
    if not _is_local(repo):
        init_repo(repo)  # capability probe before any publication
    from zarr_datafusion_spark.zarr.storage import store_fs

    fs, norm = store_fs(repo)
    snap = _load_snapshot(fs, norm, snapshot_id)  # must exist
    if not _acquire_branch_token(repo, name):
        raise IcechunkConflictError(
            f"branch {name!r} already exists in {repo!r}"
        )
    try:
        _publish_ref(
            repo,
            f"refs/branch.{name}/{_gen_name(int(snap['sequence']))}",
            {"snapshot": snapshot_id},
        )
    except FileExistsError:
        raise IcechunkConflictError(
            f"branch {name!r} already exists in {repo!r}"
        ) from None
    _fence_branch_creation(repo, name, int(snap["sequence"]), snapshot_id)


def list_refs(repo: str) -> dict[str, dict[str, str]]:
    """``{"branches": {name: head snapshot}, "tags": {name: snapshot}}``
    — the ref listing (``git branch -a`` / ``git tag``)."""
    from zarr_datafusion_spark.zarr.storage import store_fs

    fs, norm = store_fs(repo)
    out: dict[str, dict[str, str]] = {"branches": {}, "tags": {}}
    try:
        names = fs.listdir(f"{norm}/refs")
    except (FileNotFoundError, NotADirectoryError):
        return out  # empty/uninitialized repo — NOT an I/O failure;
        # other OSErrors (throttle, network) must raise, an outage is
        # not "no refs" (r11 review finding)
    except urllib.error.HTTPError as e:
        if e.code == 404:  # the http-family adapters' definitive miss
            return out
        raise
    for name in sorted(names):
        if name.startswith("branch."):
            head = _branch_head(fs, norm, name[len("branch.") :])
            if head:
                out["branches"][name[len("branch.") :]] = head[0]
        elif name.startswith("tag."):
            data = fs.try_read_bytes(f"{norm}/refs/{name}/ref.json")
            if data is not None:
                out["tags"][name[len("tag.") :]] = json.loads(
                    data.decode()
                )["snapshot"]
    return out


def create_tag(repo: str, name: str, snapshot_id: str) -> None:
    """Tags are write-once (immutable), enforced by the exclusive
    publication (link locally, conditional PUT on object stores)."""
    _check_ref_name("tag", name)
    if _is_local(repo):
        repo = _require_local(repo, "tag")
        os.makedirs(os.path.join(repo, "refs", f"tag.{name}"), exist_ok=True)
    else:
        init_repo(repo)  # capability probe before any publication
    _publish_ref(repo, f"refs/tag.{name}/ref.json", {"snapshot": snapshot_id})


def history(repo: str, ref: str | None = None) -> list[dict]:
    """Snapshot documents from the resolved ref back to the root
    (newest first) — the ``git log`` of the store."""
    from zarr_datafusion_spark.zarr.storage import store_fs

    fs, norm = store_fs(repo)
    out: list[dict] = []
    sid: str | None = resolve_ref(repo, ref)
    while sid is not None:
        snap = _load_snapshot(fs, norm, sid)
        out.append(snap)
        sid = snap.get("parent")
    return out


# ---------------------------------------------------------------------------
# commit
# ---------------------------------------------------------------------------


def _ingest_one(src_fs, src_norm: str, repo: str, key: str) -> dict:
    """Read one chunk file, store it content-addressed, return its
    manifest entry.  Safe under arbitrary concurrency: object writes
    are tmp+rename of immutable content."""
    payload = src_fs.read_bytes(f"{src_norm}/{key}")
    d = _digest(payload)
    _write_object(repo, _chunk_rel(d), payload)
    return {"digest": d, "length": len(payload)}


def _ingest_distributed(spark, store_dir: str, repo: str, keys: list[str]):
    """Hash+stage chunk objects on the EXECUTORS — the ingest pass is
    embarrassingly parallel per file, and at 100 TB it is the commit's
    entire cost (the driver's share is metadata: manifest, snapshot,
    one ref).  Requires the repo path to be reachable from executors
    (always true on local[*]; a shared filesystem on a cluster).
    Returns (key, entry) pairs; the collect is manifest-sized."""
    sc = spark.sparkContext
    nparts = max(1, min(len(keys) // 4 + 1, sc.defaultParallelism * 4))

    def part(it):
        from zarr_datafusion_spark.zarr.storage import store_fs

        fs, norm = store_fs(store_dir)
        for key in it:
            yield key, _ingest_one(fs, norm, repo, key)

    return sc.parallelize(list(keys), nparts).mapPartitions(part).collect()


def commit_store(
    store_dir: str,
    repo: str,
    branch: str = "main",
    message: str = "",
    expected_snapshot: str | None | type(...) = ...,
    spark=None,
    _base_manifest: dict | None = None,
) -> str:
    """Commit a materialized Zarr store directory as the branch's next
    snapshot; returns the new snapshot id.

    The store image is ingested whole: metadata documents inline into
    the snapshot, chunk payloads as content-addressed objects (bytes
    already present from ANY earlier snapshot are not rewritten —
    structural sharing).  Only then does the branch ref advance, via a
    create-exclusive generation file: the commit is all-or-nothing.

    ``spark``: when given (and the image has enough chunk files to pay
    for tasks), the hash+stage pass runs DISTRIBUTED on the executors
    (:func:`_ingest_distributed`) — commit cost then scales with the
    cluster, and the driver handles only metadata-sized documents.

    ``expected_snapshot``: optimistic-concurrency check — the parent
    the caller based its changes on (``None`` = expects an empty
    branch).  Left at the default, the current head is used (last
    writer wins, still atomic).  On mismatch or a lost ref race,
    :class:`IcechunkConflictError`.

    ``_base_manifest``: internal (``append_snapshot``) — start the new
    manifest from these entries and let the staged image's own chunks
    override per key, so a SPARSE staging (only the changed chunks
    materialized) commits without re-ingesting the untouched rest.
    Merge-only: a key absent from the staged image stays in the
    manifest, so this is for grow/update images, never deletions.
    """
    repo = init_repo(repo)
    _check_ref_name("branch", branch)
    from zarr_datafusion_spark.zarr.storage import store_fs

    rfs, rnorm = _repo_writer(repo)
    head = _branch_head(rfs, rnorm, branch)
    head_sid, head_seq = head if head else (None, 0)
    if expected_snapshot is not ... and expected_snapshot != head_sid:
        raise IcechunkConflictError(
            f"branch {branch!r} is at {head_sid!r}, expected "
            f"{expected_snapshot!r} (a concurrent commit advanced it)"
        )

    src_fs, src_norm = store_fs(store_dir)
    # refuse BEFORE staging anything: a Zarr store root carries a
    # metadata marker (v2 group/consolidated doc or the v3 zarr.json)
    if not (set(src_fs.listdir(src_norm)) & _META_NAMES):
        raise ValueError(
            f"{store_dir!r} has no Zarr metadata documents; refusing to "
            "commit a non-store directory"
        )
    metadata: dict[str, dict] = {}
    chunk_keys: list[str] = []

    def walk(rel: str) -> None:
        abspath = f"{src_norm}/{rel}" if rel else src_norm
        for name in sorted(src_fs.listdir(abspath)):
            if ".tmp" in name:
                continue  # crash leftovers of atomic writes, never data
            sub = f"{rel}/{name}" if rel else name
            if src_fs.isdir(f"{src_norm}/{sub}"):
                walk(sub)
                continue
            if name in _META_NAMES:
                payload = src_fs.read_bytes(f"{src_norm}/{sub}")
                try:
                    metadata[sub] = {"text": payload.decode("utf-8")}
                except UnicodeDecodeError:
                    metadata[sub] = {
                        "b64": base64.b64encode(payload).decode("ascii")
                    }
            else:
                chunk_keys.append(sub)

    walk("")
    if not metadata:
        raise ValueError(
            f"{store_dir!r} has no Zarr metadata documents; refusing to "
            "commit a non-store directory"
        )

    manifest: dict[str, dict] = dict(_base_manifest or {})
    if spark is not None and len(chunk_keys) >= 64:
        manifest.update(
            _ingest_distributed(spark, store_dir, repo, chunk_keys)
        )
    else:
        for key in chunk_keys:
            manifest[key] = _ingest_one(src_fs, src_norm, repo, key)

    man_bytes = _canon(manifest)
    mid = _digest(man_bytes)[:24]
    _write_object(repo, f"manifests/{mid}.json", man_bytes)

    seq = head_seq + 1
    body = {
        "parent": head_sid,
        "sequence": seq,
        "message": message,
        "metadata": metadata,
        "manifest": mid,
    }
    sid = _digest(_canon(body))[:24]
    body["id"] = sid
    _write_object(repo, f"snapshots/{sid}.json", _canon(body))

    if head_sid is None:
        # FIRST commit on this branch name: take the exclusive creation
        # token (a racing fork would publish at a different generation
        # filename, so only the token closes that race); crash debris
        # (token survived, generation never published) recovers as 'no
        # branch' (ADVICE r11)
        if not _acquire_branch_token(repo, branch):
            raise IcechunkConflictError(
                f"branch {branch!r} was created concurrently; rebase "
                "on its head and retry"
            )
    try:
        _publish_ref(
            repo, f"refs/branch.{branch}/{_gen_name(seq)}", {"snapshot": sid}
        )
    except FileExistsError:
        raise IcechunkConflictError(
            f"branch {branch!r}: generation {seq} was committed "
            "concurrently; rebase on the new head and retry"
        ) from None
    if head_sid is None:
        # branch creation (not an ordinary advance): fence the
        # token-recovery race (ADVICE r12, _fence_branch_creation)
        _fence_branch_creation(repo, branch, seq, sid)
    return sid


def commit_zarr(
    df,
    repo: str,
    coords: list[str],
    branch: str = "main",
    message: str = "",
    expected_snapshot: str | None | type(...) = ...,
    _sink_result: dict | None = None,
    **write_kwargs,
) -> str:
    """Distributed write + transactional publish: stage the DataFrame
    through the ordinary Zarr sink (executors own chunk slabs,
    ``sink.write_zarr``) into a private directory, then
    :func:`commit_store` it — the committed image becomes visible
    atomically or not at all.  Returns the snapshot id.

    ``_sink_result``: optional dict the sink's result (validated cell
    count, bytes) is copied into — lets SQL COPY report the count
    without re-executing the query."""
    import shutil
    import tempfile

    from zarr_datafusion_spark.zarr.sink import write_zarr

    staging = tempfile.mkdtemp(prefix="zds_ic_stage_")
    try:
        store = os.path.join(staging, "stage.zarr")
        res = write_zarr(df, store, coords=coords, **write_kwargs)
        if _sink_result is not None:
            _sink_result.update(res)
        return commit_store(
            store, repo, branch=branch, message=message,
            expected_snapshot=expected_snapshot, spark=df.sparkSession,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def append_snapshot(
    df,
    repo: str,
    branch: str = "main",
    message: str = "",
) -> str:
    """Transactional APPEND: add the DataFrame's outer slabs on top of
    the branch head and publish the grown image as the next snapshot.

    The staging store is SPARSE: only the head's metadata documents and
    its COORDINATE-array chunks (axis-bounded, tiny) are materialized —
    ``sink.append_zarr`` reads nothing else (it validates the grid from
    the coordinate arrays and, with the sink's (1, inner...) chunk
    layout, never read-modify-writes an existing data chunk).  The
    commit then merges the staged image over the PARENT's manifest
    (``_base_manifest``), so existing data chunks are neither
    downloaded, hardlinked, hashed, nor re-PUT: append cost is
    O(new slabs + coordinate axis + metadata) at ANY store size, and
    the same path works on local and object-store (s3/gs/az) repos —
    the previous implementation hardlinked the ENTIRE head image into
    staging, which is 10^6 syscalls on a million-chunk store and
    impossible remotely.  The merged manifest is key-for-key identical
    to what a full re-ingest would produce (content addressing), so
    snapshot ids stay bit-equal — pinned by test.  Optimistic
    concurrency: the commit expects the head this append was built on
    and conflicts if the branch moved."""
    import shutil
    import tempfile

    from zarr_datafusion_spark.zarr.sink import append_zarr

    head_sid = resolve_ref(repo, f"branch:{branch}")
    fs = IcechunkStoreFS(repo, f"snap:{head_sid}")
    # coordinates = the 1-D arrays (the reference's own classification,
    # schema_inference.rs:90-93), read straight from the snapshot's
    # inline metadata docs — a discover_arrays() here would construct a
    # second adapter and re-download the manifest, the LARGE document
    # on a million-chunk store (r12 review finding)
    coord_names: set[str] = set()
    for key, doc in fs._meta.items():
        if not (key.endswith("/.zarray") or key.endswith("/zarr.json")):
            continue
        body = json.loads(
            doc["text"] if "text" in doc
            else base64.b64decode(doc["b64"]).decode()
        )
        shape = body.get("shape")
        if (
            isinstance(shape, list)
            and len(shape) == 1
            and body.get("node_type", "array") == "array"
        ):
            coord_names.add(key.split("/", 1)[0])
    staging = tempfile.mkdtemp(prefix="zds_ic_append_")
    try:
        store = os.path.join(staging, "head.zarr")
        for key, doc in fs._meta.items():
            path = os.path.join(store, *key.split("/"))
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(
                    doc["text"].encode("utf-8")
                    if "text" in doc
                    else base64.b64decode(doc["b64"])
                )
        for key in fs._chunks:
            if key.split("/", 1)[0] not in coord_names:
                continue  # data chunks stay in the object store
            dst = os.path.join(store, *key.split("/"))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(fs.read_bytes(f"{fs.root}/{key}"))
        append_zarr(df, store)
        return commit_store(
            store, repo, branch=branch, message=message,
            expected_snapshot=head_sid, spark=df.sparkSession,
            _base_manifest=fs._chunks,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


# ---------------------------------------------------------------------------
# read side
# ---------------------------------------------------------------------------


def parse_icechunk_url(url: str) -> tuple[str, str | None]:
    """``icechunk://<repo>[@<ref>]`` → (repo, ref-or-None).  The LAST
    ``@`` splits, so repo paths containing ``@`` need an explicit ref
    (always true for pinned URLs)."""
    rest = url[len("icechunk://") :]
    if not rest:
        raise ValueError(f"missing repository path in {url!r}")
    if "@" in rest:
        repo, _, ref = rest.rpartition("@")
        return repo, ref
    return rest, None


def pin_snapshot(url: str) -> str:
    """Pin a mutable ref (branch head, default-main) to its snapshot id
    — ``icechunk://repo@snap:<id>`` — so everything downstream (plan
    cache, per-worker adapter memoization, every executor task) reads
    ONE immutable snapshot: repeatable reads under concurrent commits.
    Non-icechunk URLs and already-pinned URLs pass through."""
    if not url.startswith("icechunk://"):
        return url
    repo, ref = parse_icechunk_url(url)
    if ref is not None and ref.startswith("snap:"):
        return url
    return f"icechunk://{repo}@snap:{resolve_ref(repo, ref)}"


class IcechunkStoreFS:
    """Store-filesystem adapter serving a snapshot's Zarr key space.
    Matches the ``LocalStoreFS`` protocol (exists / isdir / listdir /
    read_text / read_bytes / try_read_bytes), so metadata discovery,
    chunk I/O, pushdown, and caching run unmodified over it."""

    def __init__(
        self, repo: str, ref: str | None = None, requested: str | None = None
    ):
        from zarr_datafusion_spark.zarr.storage import store_fs

        self._fs, self._repo = store_fs(repo)
        sid = resolve_ref(repo, ref)
        snap = _load_snapshot(self._fs, self._repo, sid)
        self.snapshot_id = sid
        self.root = f"icechunk://{repo}@snap:{sid}"
        # every base URL a caller may join keys onto: the pinned root,
        # the URL this adapter was opened with (possibly a branch/tag
        # ref), and the bare repo — longest first so ref'd forms strip
        # before their bare-repo prefix.  Missing any spelling would
        # make _key keep the base, no key would match, and reads would
        # SILENTLY degrade to fill values (caught in the r11 review).
        self._bases = sorted(
            {self.root, requested or self.root, f"icechunk://{repo}"},
            key=len,
            reverse=True,
        )
        self._meta: dict[str, dict] = snap["metadata"]
        man = self._fs.read_bytes(
            f"{self._repo}/manifests/{snap['manifest']}.json"
        )
        self._chunks: dict[str, dict] = json.loads(man.decode())

    # -- key mapping --------------------------------------------------
    def _key(self, p: str) -> str:
        p = p.replace(os.sep, "/")
        for base in self._bases:
            if p.startswith(base):
                p = p[len(base) :]
                break
        return p.lstrip("/")

    def _keys(self):
        yield from self._meta
        yield from self._chunks

    # -- protocol -----------------------------------------------------
    def exists(self, p: str) -> bool:
        key = self._key(p)
        return key in self._meta or key in self._chunks or self.isdir(p)

    def isdir(self, p: str) -> bool:
        key = self._key(p)
        if key == "":
            return True
        prefix = key + "/"
        return any(k.startswith(prefix) for k in self._keys())

    def listdir(self, p: str) -> list[str]:
        key = self._key(p)
        prefix = "" if key == "" else key + "/"
        names = {
            k[len(prefix) :].split("/", 1)[0]
            for k in self._keys()
            if k.startswith(prefix)
        }
        if prefix and not names:
            raise FileNotFoundError(p)
        return sorted(names)

    def read_text(self, p: str) -> str:
        return self.read_bytes(p).decode("utf-8")

    def try_read_bytes(self, p: str) -> bytes | None:
        """None only when the key is absent from the snapshot
        (definitive — e.g. a genuinely missing chunk reads as fill
        value); a PRESENT manifest entry whose chunk object is gone
        raises, a corrupted repository must never degrade silently."""
        key = self._key(p)
        if key not in self._meta and key not in self._chunks:
            return None
        return self.read_bytes(p)

    def read_bytes(self, p: str) -> bytes:
        key = self._key(p)
        meta = self._meta.get(key)
        if meta is not None:
            if "text" in meta:
                return meta["text"].encode("utf-8")
            return base64.b64decode(meta["b64"])
        ent = self._chunks.get(key)
        if ent is None:
            raise FileNotFoundError(p)
        payload = self._fs.read_bytes(f"{self._repo}/{_chunk_rel(ent['digest'])}")
        if len(payload) != ent["length"]:
            raise OSError(
                f"icechunk chunk object {ent['digest']} for key {key!r}: "
                f"expected {ent['length']} bytes, read {len(payload)}"
            )
        return payload


# ---------------------------------------------------------------------------
# maintenance
# ---------------------------------------------------------------------------


def _listdir_or_empty(fs, p: str) -> list[str]:
    """Adapter-generic listing that maps ONLY definitive not-found to
    empty (a missing prefix on an object store lists as [] already);
    transient failures raise — a gc that mistakes an outage for an
    empty listing would compute an empty live set and delete
    everything."""
    try:
        return fs.listdir(p)
    except (FileNotFoundError, NotADirectoryError):
        return []
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return []
        raise


def gc_repo(repo: str, *, grace_seconds: float = 900.0) -> dict[str, int]:
    """Delete snapshots/manifests/chunk objects unreachable from any
    branch head's ancestry or tag (the debris of lost commit races and
    expired branches).  Works on local AND object-store (s3/gs/az)
    repos — the sweep is listings + per-object DELETEs through the
    same adapters commits write through.  Returns removal counts per
    object kind, plus ``skipped_young``.

    SAFE UNDER CONCURRENT COMMITS via the age grace window (the
    standard content-addressed-store answer, VERDICT r13 item 3): a
    commit stages objects BEFORE its ref appears, so a staged-but-
    unpublished object looks unreachable — the sweep therefore skips
    any object younger than ``grace_seconds`` (local mtime /
    object-store ``Last-Modified`` via one HEAD per otherwise-doomed
    object; real stores always stamp, an unknown age counts as old).
    Keep ``grace_seconds`` above the longest staging-to-publish
    latency a commit can have (plus clock skew for remote stores);
    the 15-minute default dwarfs both.  ``grace_seconds=0`` restores
    the unguarded sweep for quiesced repos (tests collecting
    just-staged debris use it)."""
    import time

    fs, norm = _repo_writer(repo)
    now = time.time()

    live_snaps: set[str] = set()
    for name in sorted(_listdir_or_empty(fs, f"{norm}/refs")):
        if name.startswith("branch."):
            head = _branch_head(fs, norm, name[len("branch.") :])
            if head:
                live_snaps.add(head[0])
        elif name.startswith("tag."):
            data = fs.try_read_bytes(f"{norm}/refs/{name}/ref.json")
            if data is None:
                # crash debris: the tag dir/marker survived, ref.json
                # never published — pins nothing (ADVICE r11)
                continue
            live_snaps.add(json.loads(data.decode())["snapshot"])

    # expand ancestry; collect live manifests and chunk digests
    live_mans: set[str] = set()
    live_digests: set[str] = set()
    stack = list(live_snaps)
    while stack:
        sid = stack.pop()
        snap = _load_snapshot(fs, norm, sid)
        live_snaps.add(sid)
        mid = snap["manifest"]
        if mid not in live_mans:
            live_mans.add(mid)
            man = json.loads(
                fs.read_bytes(f"{norm}/manifests/{mid}.json").decode()
            )
            live_digests.update(e["digest"] for e in man.values())
        parent = snap.get("parent")
        if parent and parent not in live_snaps:
            stack.append(parent)

    removed = {"snapshots": 0, "manifests": 0, "chunks": 0, "skipped_young": 0}

    def sweep(rels: list[str], live: set[str], strip: str, counter: str):
        for rel in rels:
            name = rel.rsplit("/", 1)[-1]
            stem = name[: -len(strip)] if strip and name.endswith(strip) else name
            if stem not in live and ".tmp" not in name:
                if grace_seconds > 0:
                    mt = fs.mtime(f"{norm}/{rel}")
                    # a young object may be a commit's staging window
                    # (ref not yet published) — leave it for a later gc
                    if mt is not None and now - mt < grace_seconds:
                        removed["skipped_young"] += 1
                        continue
                fs.delete_object(f"{norm}/{rel}")
                removed[counter] += 1

    sweep(
        [f"snapshots/{n}" for n in _listdir_or_empty(fs, f"{norm}/snapshots")],
        live_snaps, ".json", "snapshots",
    )
    sweep(
        [f"manifests/{n}" for n in _listdir_or_empty(fs, f"{norm}/manifests")],
        live_mans, ".json", "manifests",
    )
    chunk_rels = [
        f"chunks/{fan}/{n}"
        for fan in _listdir_or_empty(fs, f"{norm}/chunks")
        if "." not in fan  # two-hex fanout dirs only, never stray files
        for n in _listdir_or_empty(fs, f"{norm}/chunks/{fan}")
    ]
    sweep(chunk_rels, live_digests, "", "chunks")
    return removed
