"""Manifest/pointer-committed parquet state.

The pre-r13 materializer and IVM maintainer committed each new state
snapshot by DIRECTORY RENAME (write ``state.epochN`` -> move ``state``
aside -> promote -> drop): atomic on local filesystems and HDFS, but on
object stores (s3a, gcs) Hadoop's rename is a non-atomic per-file
copy+delete — O(data) extra write per commit, and a crash mid-"rename"
leaves a partially populated directory that a bare isdir+parquet
content check would accept as complete. fsio made the state *API*
portable (r12); this module makes the *commit* portable.

Discipline (the Iceberg/Delta pointer-commit idea, reduced to one
single-writer table):

* every commit writes a NEW, uniquely named generation directory
  (``<name>-g<N>``, N strictly increasing — a replayed epoch gets a
  fresh generation, never an in-place overwrite of the live dir);
* the commit point is flipping a small JSON pointer
  (``<name>_manifest.json``) to the new generation via
  :func:`fsio.write_json_meta`, whose write-tmp-then-promote +
  tmp-recovery discipline is already crash-correct on stores without
  atomic overwrite-rename;
* a generation directory is trusted only if its parquet job COMMITTED
  (the ``_SUCCESS`` marker — part files alone never count, a crashed
  write leaves those) — the manifest is only ever flipped to a
  validated directory, and readers validate on first resolve;
* superseded generations (and pre-r13 legacy ``<name>`` /
  ``<name>.old`` / ``<name>.epochN`` dirs) are garbage-collected AFTER
  the flip; a crash between flip and GC leaves orphan directories the
  next commit removes — never a correctness window.

Crash windows, exhaustively:

* mid generation-write: pointer still names the old generation;
  the partial dir is an unreferenced orphan (next commit of the same
  number overwrites it; any commit GCs it).
* between generation-write and pointer flip: same — the staged dir is
  complete but unreferenced; the epoch that wrote it replays (its
  ledger mark rode inside the unreferenced dir), writes generation
  N+1' and flips. The orphan N+1 is GC'd.
* mid pointer flip: covered by ``write_json_meta`` /
  ``read_json_meta`` (a complete ``.tmp`` is promoted on read; an
  incomplete one reads as the prior pointer).
* between flip and GC: stale generations linger; removed by the next
  commit's GC.

There is no directory rename anywhere in this path — the
rename-hostile test in tests/test_statecommit.py runs the full
materializer/IVM lifecycle with ``fsio.rename`` stubbed to raise.

Legacy adoption: a state dir written by the pre-r13 swap machinery
(``<name>`` dir, possibly a ``<name>.old`` left by a crash between the
two swap renames) is recognized when no manifest exists; the old
``.old``-promotion recovery still runs (such state can only exist on
an atomic-rename filesystem — it was created by rename), and the
legacy dir serves as the current generation until the first new
commit supersedes and GCs it.

Reference mapping: the reference delegates durable-state commits to
the Kafka broker (segment files + committed offsets; checkpointing at
kafka/bottledwater.c:678-715, retention at README.md:283-297). This is
the Spark-side equivalent of "the broker owns segment commit": the
engine owns a commit protocol that is correct on whatever FileSystem
the cluster mounts, not just ones with atomic rename.
"""

from __future__ import annotations

import os

from bottledwater_pg_spark.streaming import fsio


class StateCorruptionError(RuntimeError):
    """The manifest names a generation directory that is missing or
    never committed — possible only through out-of-band tampering
    (the pointer is flipped strictly after the write commits), so it
    must surface loudly rather than silently starting state over."""


class GenerationalState:
    """One single-writer, pointer-committed parquet state under
    ``state_dir`` (which may hold other files — only ``<name>``-derived
    entries are ever touched). ``name`` is the state's family name,
    e.g. ``"state"``."""

    def __init__(self, state_dir: str, name: str = "state"):
        self.state_dir = state_dir
        self.name = name
        # Single-writer manifest cache: after this instance has read
        # the manifest once (validating the generation it names) or
        # has flipped it itself, the in-memory copy is authoritative —
        # no other writer exists by contract. On URI state paths this
        # removes the several-JVM-round-trips-per-access manifest
        # re-read that dominated the 1000-table soak's per-table cost
        # (SCALE.md r13). A fresh instance (process restart) always
        # re-reads disk.
        self._cached: dict | None = None

    # -- layout -------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, f"{self.name}_manifest.json")

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.state_dir, f"{self.name}-g{gen}")

    def _legacy_path(self) -> str:
        return os.path.join(self.state_dir, self.name)

    @staticmethod
    def _committed(path: str) -> bool:
        """A parquet dir is trusted only if its write job COMMITTED —
        the ``_SUCCESS`` marker specifically. Part files alone must
        NOT count: a crashed write can leave complete-looking task
        files with no job commit, and the legacy-adoption path would
        otherwise trust that partial output as the current state.
        (Requires the default
        ``mapreduce.fileoutputcommitter.marksuccessfuljobs=true``;
        every writer in this engine is a plain Spark parquet job, so
        the marker is always produced on success.)"""
        return fsio.isdir(path) and "_SUCCESS" in fsio.listdir(path)

    @staticmethod
    def _has_parts(path: str) -> bool:
        """Any task output at all — used to tell 'never written'
        (absence, fine) apart from 'written but never job-committed'
        (corruption, must surface)."""
        return fsio.isdir(path) and any(
            f.endswith(".parquet") for f in fsio.listdir(path)
        )

    # -- read side ----------------------------------------------------
    def _manifest(self) -> dict | None:
        return fsio.read_json_meta(self._manifest_path())

    def current_gen(self) -> int:
        m = self._cached if self._cached is not None else self._manifest()
        return int(m["gen"]) if m is not None else 0

    def current_path(self) -> str | None:
        """The committed current state directory, or ``None`` if no
        state was ever committed. The commit marker is validated ONCE
        per instance — on the first disk read, or implicitly when this
        instance flipped the pointer itself; after that the cached
        pointer is served without re-validation (single-writer
        contract: nothing may touch the live generation out-of-band,
        and an out-of-band deletion after the first read surfaces as
        the parquet read failing, not as
        :class:`StateCorruptionError`). A manifest naming an
        uncommitted dir on that first read IS corruption, not
        absence."""
        if self._cached is not None:
            return os.path.join(self.state_dir, self._cached["dir"])
        m = self._manifest()
        if m is not None:
            p = os.path.join(self.state_dir, m["dir"])
            if not self._committed(p):
                raise StateCorruptionError(
                    f"manifest {self._manifest_path()!r} names "
                    f"{m['dir']!r} but no committed parquet state is "
                    "there — out-of-band deletion or tampering; "
                    "restore the directory or remove the manifest to "
                    "re-bootstrap"
                )
            self._cached = m
            return p
        # pre-r13 layout: finish an interrupted legacy swap first
        self._recover_legacy()
        legacy = self._legacy_path()
        if self._committed(legacy):
            return legacy
        if self._has_parts(legacy):
            raise StateCorruptionError(
                f"legacy state dir {legacy!r} holds parquet part "
                "files but no _SUCCESS marker — a crashed write's "
                "partial output, not a committed state; delete the "
                "directory to re-bootstrap (and replay the stream), "
                "or restore a committed copy"
            )
        return None

    def _recover_legacy(self) -> None:
        """Pre-r13 swap crash window: no ``<name>`` dir but a complete
        ``<name>.old`` — promote it back. Rename is safe HERE (and
        only here): such a layout can only have been produced by the
        old rename-swap machinery, i.e. on an atomic-rename
        filesystem."""
        final = self._legacy_path()
        swap = final + ".old"
        if not fsio.isdir(final) and fsio.isdir(swap):
            fsio.rename(swap, final)

    # -- write side ---------------------------------------------------
    def staging_path(self) -> str:
        """Where the NEXT generation must be written (callers write
        parquet there with mode=overwrite, then :meth:`promote` it).
        Unique per commit: a crashed or replayed attempt at the same
        generation number overwrites an unreferenced orphan, never the
        live directory."""
        return self._gen_dir(self.current_gen() + 1)

    def promote(self, staged: str) -> None:
        """Flip the pointer to ``staged`` (must be the current
        :meth:`staging_path`, fully written), then GC superseded
        generations and any legacy dirs. The flip IS the commit."""
        if not self._committed(staged):
            raise ValueError(
                f"refusing to promote {staged!r}: the parquet job did "
                "not commit (no _SUCCESS marker)"
            )
        base = os.path.basename(staged.rstrip("/"))
        prefix = f"{self.name}-g"
        if not base.startswith(prefix):
            raise ValueError(f"not a staged generation dir: {staged!r}")
        gen = int(base[len(prefix):])
        fsio.write_json_meta(
            self._manifest_path(), {"gen": gen, "dir": base}
        )
        self._cached = {"gen": gen, "dir": base}
        self._gc(keep=base)

    def _gc(self, keep: str) -> None:
        """Remove every ``<name>``-derived directory except ``keep``:
        superseded generations, the legacy ``<name>`` dir and its
        ``.old`` / ``.epochN`` / ``.expire`` satellites. Failure-safe:
        everything here is unreferenced (the pointer already moved),
        so a partial delete or a raising ``rmtree`` (object stores can
        fail mid-recursive-delete) just leaves orphans for the next
        call — GC must never fail a commit the pointer flip already
        made durable, hence the per-entry swallow."""
        prefix = f"{self.name}-g"
        for d in fsio.listdir(self.state_dir):
            if d == keep:
                continue
            if d == self.name or d.startswith((prefix, self.name + ".")):
                if d.endswith((".json", ".json.tmp", ".txt")):
                    continue  # manifest / meta files live beside
                p = os.path.join(self.state_dir, d)
                try:
                    if fsio.isdir(p):
                        fsio.rmtree(p)
                except OSError:
                    pass  # orphan stays; next commit's GC retries
