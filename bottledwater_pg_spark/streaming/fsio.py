"""Filesystem adapter for the streaming state machinery.

The slice/fold/meta discipline in ``streaming/stream.py`` does its own
listing, renames, and recursive deletes. On this sandbox that state
lives on the local filesystem, but a deployed cluster keeps streaming
state where the data lives — HDFS, S3, GCS — and ``os.listdir`` /
``shutil.rmtree`` do not exist there. Every state-path operation in
the streaming plane therefore routes through this module, which
dispatches per path:

* plain paths -> ``os`` / ``shutil`` (the exact previous behavior —
  zero overhead, no JVM round-trips on the hot local path);
* URI paths (anything with a ``scheme://``) -> the Hadoop
  ``FileSystem`` API via the active ``SparkSession``'s JVM gateway —
  the same abstraction Spark itself reads and writes state through,
  so any filesystem Spark can reach (``file://``, ``hdfs://``,
  ``s3a://``, ...) works with no new dependency.

Semantics preserved from the ``os`` versions (the fold/cleanup crash
arguments in stream.py depend on them):

* :func:`rename` refuses an existing destination — Hadoop's
  ``rename`` would otherwise *move src into dst* (POSIX ``mv``
  semantics) and silently nest a slice directory.
* :func:`rmdir` only removes an EMPTY directory.
* :func:`write_json_meta` keeps the write-tmp-then-promote
  discipline. Local promotion is ``os.replace`` (atomic). Object
  stores have no atomic overwrite-rename, so the Hadoop branch does
  delete-then-rename and :func:`read_json_meta` recovers the
  complete ``.tmp`` if a crash lands in that window; a ``.tmp`` that
  fails to parse is a crash mid-*write* (the final file was intact
  then, or never existed) and reads as absent — the pre-write state.

Reference mapping: the reference has no state filesystem at all — its
durable state is the Kafka log plus the replication slot, and the
broker owns segment storage (kafka/bottledwater.c:678-715 checkpoints
into Kafka, README.md:283-297 delegates retention to log compaction).
The Spark-side analog of "the broker owns storage" is "state lives on
whatever FileSystem the cluster mounts", which is exactly the seam
this module abstracts.
"""

from __future__ import annotations

import json
import os
import shutil


def is_uri(path: str) -> bool:
    """True for scheme-qualified paths (``file://``, ``hdfs://``,
    ``s3a://``...) that must go through the Hadoop FileSystem API."""
    return "://" in path


def _jvm_session(path: str):
    """The SparkSession whose JVM gateway URI ops ride, or a clear
    error. ``getActiveSession`` is THREAD-LOCAL: a state op running on
    a driver worker thread (MultiTableMaterializer fans per-table work
    out to a pool) sees None there even while the session is alive —
    fall back to the process-wide classic session
    (``_instantiatedSession``, the Python mirror of the JVM's
    process-wide default session; undocumented, hence the ``getattr``
    guard). Under Spark Connect neither a JVM gateway nor that
    attribute exists, so the failure is a named RuntimeError — URI
    state paths need a classic JVM-backed session — not an
    AttributeError three frames deeper."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if spark is None:
        raise RuntimeError(
            f"URI state path {path!r} needs an active SparkSession "
            "(the Hadoop FileSystem rides the session's JVM); create "
            "the session before the streaming state object"
        )
    if getattr(spark, "_jvm", None) is None:
        raise RuntimeError(
            f"URI state path {path!r} needs a classic JVM-backed "
            "SparkSession; this runtime (Spark Connect?) exposes no "
            "JVM gateway — run the state machinery on the cluster "
            "driver, or use plain local paths"
        )
    return spark


def _hadoop(path: str):
    """(FileSystem, Path) for a URI, resolved through the active
    SparkSession's JVM — the FileSystem instance is cached per
    (scheme, authority, ugi) by Hadoop itself, so this is cheap to
    call per operation."""
    spark = _jvm_session(path)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def normkey(path: str) -> str:
    """Canonical spelling of a state/checkpoint path for run-key
    hashing: local paths resolve symlinks/relative segments
    (``os.path.realpath`` — the r11 run-key discipline), URIs are
    normalized textually (trailing slashes stripped; there is no
    realpath on an object store, and two spellings of one URI differ
    only by such decoration)."""
    if is_uri(path):
        scheme, rest = path.split("://", 1)
        return scheme + "://" + rest.rstrip("/")
    return os.path.realpath(path)


def listdir(path: str) -> list[str]:
    if not is_uri(path):
        return os.listdir(path)
    fs, p = _hadoop(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def listdir_or_none(path: str) -> list[str] | None:
    """One-round-trip existence-probe-plus-listing: the entries, or
    ``None`` if the path is missing or not a directory. The hot commit
    path uses this instead of ``isdir`` + ``listdir`` — on URI paths
    each op is a JVM round trip, and the 1000-table soak showed the
    per-commit metadata ops are what separates the URI path from the
    plain one (SCALE.md r13/r14)."""
    if not is_uri(path):
        try:
            return os.listdir(path)
        except (FileNotFoundError, NotADirectoryError):
            return None
    try:
        fs, p = _hadoop(path)
        return [st.getPath().getName() for st in fs.listStatus(p)]
    except Exception:  # noqa: BLE001 — Py4J wraps FileNotFoundException
        return None


def isdir(path: str) -> bool:
    if not is_uri(path):
        return os.path.isdir(path)
    fs, p = _hadoop(path)
    return fs.exists(p) and fs.getFileStatus(p).isDirectory()


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    fs, p = _hadoop(path)
    return fs.exists(p)


def makedirs(path: str) -> None:
    """mkdir -p (exist_ok): every caller in the state machinery wants
    idempotent creation."""
    if not is_uri(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, p = _hadoop(path)
    if not fs.mkdirs(p):
        raise OSError(f"mkdirs failed for {path!r}")


def rmtree(path: str) -> None:
    if not is_uri(path):
        shutil.rmtree(path)
        return
    fs, p = _hadoop(path)
    if not fs.delete(p, True):
        raise OSError(f"recursive delete failed for {path!r}")


def rmdir(path: str) -> None:
    """Remove an EMPTY directory (``os.rmdir`` contract — callers
    check emptiness first; a non-empty dir must raise, not vanish)."""
    if not is_uri(path):
        os.rmdir(path)
        return
    fs, p = _hadoop(path)
    if len(fs.listStatus(p)) > 0:
        raise OSError(f"directory not empty: {path!r}")
    if not fs.delete(p, False):
        raise OSError(f"rmdir failed for {path!r}")


def rename(src: str, dst: str) -> None:
    """Move with one contract on BOTH branches: the destination must
    not exist. (Hadoop's ``rename`` onto an existing directory moves
    src INSIDE dst; Linux ``os.rename`` silently REPLACES an existing
    file or empty dir — two different silent landmines, so the guard
    is explicit on both sides rather than trusting callers to
    pre-check.)"""
    if not is_uri(src):
        if os.path.exists(dst):
            raise FileExistsError(f"rename target exists: {dst!r}")
        os.rename(src, dst)
        return
    fs, psrc = _hadoop(src)
    _, pdst = _hadoop(dst)
    if fs.exists(pdst):
        raise FileExistsError(f"rename target exists: {dst!r}")
    if not fs.rename(psrc, pdst):
        raise OSError(f"rename failed: {src!r} -> {dst!r}")


def _read_text(path: str) -> str:
    if not is_uri(path):
        with open(path) as f:
            return f.read()
    fs, p = _hadoop(path)
    stream = fs.open(p)
    try:
        spark = _jvm_session(path)
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _write_text(path: str, text: str) -> None:
    if not is_uri(path):
        with open(path, "w") as f:
            f.write(text)
        return
    fs, p = _hadoop(path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str) -> str:
    """Full contents of a small text file (raises if absent)."""
    return _read_text(path)


def write_text(path: str, text: str) -> None:
    """Write (create/overwrite) a small text file."""
    _write_text(path, text)


def remove(path: str) -> None:
    """Delete a single file."""
    if not is_uri(path):
        os.remove(path)
        return
    fs, p = _hadoop(path)
    if not fs.delete(p, False):
        raise OSError(f"remove failed for {path!r}")


def append_text(path: str, text: str) -> None:
    """Append to a small single-writer ledger file (the IVM
    applied-epochs list). Local: O_APPEND. Hadoop: read-modify-write —
    object stores don't append, and the caller contract (ONE writer
    per state dir, the same assumption the slice machinery already
    makes) makes the rewrite safe."""
    if not is_uri(path):
        with open(path, "a") as f:
            f.write(text)
        return
    prior = _read_text(path) if exists(path) else ""
    _write_text(path, prior + text)


def write_json_meta(path: str, obj: dict) -> None:
    """Durable small-metadata write with the write-tmp-then-promote
    discipline every meta.json site in stream.py uses. Local: tmp +
    ``os.replace`` (atomic — unchanged behavior). Hadoop: tmp +
    delete-final + rename; the non-atomic window is covered by
    :func:`read_json_meta`'s tmp recovery."""
    tmp = path + ".tmp"
    _write_text(tmp, json.dumps(obj))
    if not is_uri(path):
        os.replace(tmp, path)
        return
    # hot path (one flip per state commit): Hadoop delete returns
    # False on absence instead of raising, so no exists() probe; and
    # the rename goes straight to the FileSystem — the destination was
    # deleted one line up and this module's single-writer contract
    # means nobody recreates it, so the refuse-existing-target guard
    # of fsio.rename would only buy another round trip
    fs, p = _hadoop(path)
    fs.delete(p, False)
    _, ptmp = _hadoop(tmp)
    if not fs.rename(ptmp, p):
        raise OSError(f"rename failed: {tmp!r} -> {path!r}")


def read_json_meta(path: str) -> dict | None:
    """Read a :func:`write_json_meta` file; ``None`` if absent. If the
    final file is missing but a complete ``.tmp`` exists (Hadoop
    crash window between delete and rename), promote and read it; a
    ``.tmp`` that does not parse is a crash mid-write — the final
    file was intact then (and was read), or never existed — so it
    reads as absent rather than as corruption."""
    if exists(path):
        return json.loads(_read_text(path))
    tmp = path + ".tmp"
    if not exists(tmp):
        return None
    try:
        obj = json.loads(_read_text(tmp))
    except ValueError:
        return None
    rename(tmp, path)
    return obj
