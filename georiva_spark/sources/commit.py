"""Single-writer commit primitives — the ONE place the repo's
atomic-rename / marker assumptions live (r12, the r11 verdict's
item 3; SCALE.md §"Commit protocol" is the site inventory).

Everything exactly-once in this engine ultimately rests on two
filesystem properties:

1. **Atomic rename** — ``os.replace`` either fully installs the new
   name or leaves the old state; a concurrent reader never sees a
   torn file. Used for: generation markers, staged token-shard file
   moves, ledger event files, catalog-table dir swaps, compaction
   snapshot installs.
2. **Read-after-write listing** — a file committed by rename is
   visible to the next directory listing (no eventual consistency).
   Used for: replay guards that probe for a marker/file before
   re-doing work.

POSIX local disks, HDFS (viewfs), and NFSv4 satisfy both. S3-class
object stores satisfy NEITHER: "rename" is copy+delete (a crash
mid-copy leaves both or neither name, and a reader can see the half)
and markers need a conditional PUT to be a commit token. Running the
exactly-once layouts there requires a rename-capable commit layer on
top (HDFS, a manifest-pointer table, or a Delta/Iceberg transaction
log) — reference analog: the reference writes through MinIO but
commits via Postgres rows (processing/models.py), i.e. it ALSO
refuses to use object-store rename as a commit primitive.

``require_rename_fs`` enforces the contract BY NAME at every entry
point: a path whose scheme is not known rename-atomic raises instead
of silently committing non-atomically (the repo's fail-by-name
doctrine — a wrong answer must never be quieter than an error).
"""

from __future__ import annotations

import json
import os
import uuid

#: schemes with atomic rename + consistent listing. "" and "file" are
#: local POSIX; hdfs/viewfs rename is a namenode metadata op.
RENAME_ATOMIC_SCHEMES = frozenset({"", "file", "hdfs", "viewfs"})

#: schemes known to FAKE rename (copy+delete) — named in the error so
#: the failure reads as a deployment contract, not a typo.
_OBJECT_STORE_SCHEMES = frozenset({
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
})


def path_scheme(path: str) -> str:
    """URI scheme of ``path`` ('' for plain local paths — a Windows
    drive letter is not a scheme). Recognizes BOTH URI spellings
    Hadoop emits: ``scheme://authority/path`` and the single-slash
    ``scheme:/path`` form (what ``spark.sql.warehouse.dir`` and
    Hadoop ``Path.toString`` typically carry, r13 — the r12 form
    parsed as scheme '' and was returned unstripped, so os.replace
    ran on a literal ``file:/...`` string)."""
    p = str(path)
    head, sep, _ = p.partition("://")
    if sep and "/" not in head and len(head) > 1:
        return head.lower()
    head, sep, rest = p.partition(":/")
    if (sep and len(head) > 1 and head.isalnum()
            and not head[0].isdigit()):
        return head.lower()
    return ""


def require_rename_fs(path: str, who: str = "commit") -> str:
    """Fail BY NAME unless ``path`` lives on a filesystem with atomic
    rename + read-after-write listing (the commit contract above).
    Returns the local path (scheme stripped for file://)."""
    scheme = path_scheme(path)
    if scheme in _OBJECT_STORE_SCHEMES:
        raise ValueError(
            f"{who}: {path!r} is on an object store ({scheme}://) — "
            f"rename there is copy+delete, not atomic, so the "
            f"exactly-once marker/staged-move protocol cannot hold. "
            f"Commit through a rename-capable layer (HDFS, a "
            f"manifest-pointer table, or a Delta/Iceberg log) "
            f"instead. See SCALE.md §Commit protocol.")
    if scheme not in RENAME_ATOMIC_SCHEMES:
        raise ValueError(
            f"{who}: {path!r} has scheme {scheme!r}, which is not in "
            f"the known rename-atomic set "
            f"{sorted(RENAME_ATOMIC_SCHEMES - {''})} — refusing to "
            f"commit non-atomically. See SCALE.md §Commit protocol.")
    if scheme == "file":
        # both URI spellings reduce to the local absolute path:
        # file:///x and file:/x -> /x (mirrors Hadoop's Path handling)
        rest = str(path)[len("file:"):]
        if rest.startswith("/"):
            return "/" + rest.lstrip("/")
        return rest
    return path


def atomic_replace(src: str, dst: str, who: str = "commit") -> None:
    """Atomically install ``src`` at ``dst`` (POSIX rename semantics:
    replaces an existing ``dst`` in one step). Both paths may carry
    either ``file:`` URI spelling — stripped to local form here."""
    os.replace(require_rename_fs(src, who),
               require_rename_fs(dst, who))


def atomic_write_bytes(path: str, data: bytes, who: str = "commit") -> None:
    """Write ``data`` to ``path`` atomically: a unique tmp sibling,
    then one rename — a concurrent reader sees the old content or the
    new, never a prefix."""
    path = require_rename_fs(path, who)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def atomic_write_json(path: str, obj, who: str = "commit") -> None:
    """:func:`atomic_write_bytes` for a JSON document (the marker
    format of every generation/meta sidecar)."""
    atomic_write_bytes(path, json.dumps(obj).encode(), who)
