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
        # r14: after one FULL GC sweep (which clears legacy dirs and
        # crash orphans), this single-writer instance knows the only
        # new garbage a commit creates is the generation it just
        # superseded — so later commits GC with ONE targeted delete
        # instead of a listdir + per-entry isdir sweep. Crash orphans
        # from a dead process are caught by the next instance's first
        # sweep.
        self._swept = False

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
        entries = fsio.listdir_or_none(staged)
        if entries is None or "_SUCCESS" not in entries:
            raise ValueError(
                f"refusing to promote {staged!r}: the parquet job did "
                "not commit (no _SUCCESS marker)"
            )
        base = os.path.basename(staged.rstrip("/"))
        prefix = f"{self.name}-g"
        if not base.startswith(prefix):
            raise ValueError(f"not a staged generation dir: {staged!r}")
        gen = int(base[len(prefix):])
        prev = self._cached
        fsio.write_json_meta(
            self._manifest_path(), {"gen": gen, "dir": base}
        )
        self._cached = {"gen": gen, "dir": base}
        if self._swept and prev is not None:
            # post-sweep fast path: the superseded generation is the
            # only new garbage (single writer) — one targeted delete
            if prev["dir"] != base:
                try:
                    fsio.rmtree(
                        os.path.join(self.state_dir, prev["dir"])
                    )
                except OSError:
                    pass  # orphan; the next full sweep retries
        else:
            self._gc(keep=base)
            self._swept = True

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


class BucketManifestState:
    """Pointer-committed parquet state PARTITIONED into hash buckets:
    one small JSON manifest maps every bucket to the generation
    directory holding its current rows, so a commit that touches k
    buckets writes ONE k-bucket generation dir and flips the pointer —
    O(touched buckets) data written per commit, never O(state), and no
    directory rename anywhere (the :class:`GenerationalState`
    discipline, applied per bucket; the same shape Iceberg/Delta use
    for partition-granular MERGE commits).

    Layout under ``state_dir``::

        <name>_manifest.json      {"gen": N, "n_buckets": B,
                                   "buckets": {"<b>": "<name>-g<k>"}}
        <name>-g<k>/              one committed parquet job
            _SUCCESS              (required — parts alone never count)
            bucket=<b>/part-*.parquet

    Commit protocol (single writer):

    * stage: write the merged rows of the touched buckets, partitioned
      by ``bucket``, into the unique next generation dir;
    * flip: rewrite the manifest with the touched buckets remapped to
      the new dir (a touched bucket whose ``bucket=<b>`` partition is
      ABSENT from the staged dir produced no rows — it leaves the
      mapping: an empty bucket has no state);
    * GC: in every generation dir, ``bucket=`` partitions the manifest
      no longer references are removed; a generation dir left with no
      referenced bucket is removed whole. All GC'd paths are
      unreferenced (the pointer already moved), so GC is per-entry
      failure-safe, like :meth:`GenerationalState._gc`.

    Crash windows are exactly :mod:`~.statecommit`'s: mid-stage and
    stage-without-flip leave an unreferenced orphan the replayed
    commit overwrites (generation numbers are unique per attempt only
    across COMMITTED generations — a replay reuses the same number and
    ``mode=overwrite`` clobbers the orphan); mid-flip is covered by
    ``write_json_meta``'s tmp discipline; flip-without-GC leaves
    superseded partitions the next GC sweeps.

    Read side: the live state is the union of at most
    ``min(n_buckets, #generations)`` directory reads (each filtered to
    the buckets the manifest maps there — partition pruning makes that
    free). Long-running writers bound the union width with a periodic
    whole-state compaction commit (see
    ``BucketedMergeSink.compact_state``).

    ``n_buckets`` is persisted in the manifest and a mismatched reopen
    is refused: bucket assignment is ``pmod(xxhash64(key), N)`` at
    write time, so a different N would misroute every future merge.

    Legacy adoption: a pre-r14 ``<name>`` directory (Spark dynamic
    partition overwrite layout: ``bucket=`` children plus a root
    ``_SUCCESS``) is adopted as generation 0 — every observed bucket
    maps to it — then superseded partition-by-partition by new
    commits and GC'd away. Parts without the root ``_SUCCESS`` raise
    :class:`StateCorruptionError` (a crashed write, not a state).

    Reference analog: the compacted-topic state the reference keeps in
    Kafka is committed by the broker per PARTITION segment, never by
    whole-log rewrite (kafka/bottledwater.c:784-808 hash-partitions by
    key; README.md:283-297 delegates retention/compaction) — this is
    that per-partition commit ownership on a plain FileSystem."""

    def __init__(self, state_dir: str, n_buckets: int,
                 name: str = "state"):
        self.state_dir = state_dir
        self.name = name
        self.n_buckets = int(n_buckets)
        # single-writer manifest cache (see GenerationalState._cached)
        self._cached: dict | None = None
        # one full sweep per instance, then targeted GC (see
        # GenerationalState._swept)
        self._swept = False

    # -- layout -------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, f"{self.name}_manifest.json")

    def _gen_dir_name(self, gen: int) -> str:
        return f"{self.name}-g{gen}"

    def _legacy_path(self) -> str:
        return os.path.join(self.state_dir, self.name)

    # -- read side ----------------------------------------------------
    def _load(self) -> dict:
        """The manifest (cached after first read): ``{"gen": N,
        "n_buckets": B, "buckets": {str(b): dirname}}``. First read
        gates n_buckets and adopts a legacy layout."""
        if self._cached is not None:
            return self._cached
        m = fsio.read_json_meta(self._manifest_path())
        if m is not None:
            if int(m["n_buckets"]) != self.n_buckets:
                raise ValueError(
                    f"state at {self.state_dir!r} was committed with "
                    f"n_buckets={m['n_buckets']} but this writer "
                    f"declares n_buckets={self.n_buckets}; bucket "
                    "assignment is hashed at write time, so a changed "
                    "N misroutes every merge — reopen with the stored "
                    "N, or rebuild from a fresh state_dir"
                )
            self._cached = m
            return m
        legacy = self._legacy_path()
        if fsio.isdir(legacy):
            entries = fsio.listdir(legacy)
            buckets = sorted(
                int(e[len("bucket="):])
                for e in entries
                if e.startswith("bucket=")
            )
            if buckets and "_SUCCESS" not in entries:
                raise StateCorruptionError(
                    f"legacy bucketed state {legacy!r} has bucket "
                    "partitions but no _SUCCESS marker — a crashed "
                    "write's partial output; delete the directory to "
                    "re-bootstrap (and replay the stream), or restore "
                    "a committed copy"
                )
            if buckets:
                if buckets[-1] >= self.n_buckets:
                    raise ValueError(
                        f"legacy state {legacy!r} holds bucket="
                        f"{buckets[-1]} but this writer declares "
                        f"n_buckets={self.n_buckets}; reopen with the "
                        "N it was built with"
                    )
                m = {
                    "gen": 0,
                    "n_buckets": self.n_buckets,
                    "buckets": {str(b): self.name for b in buckets},
                }
                # durable adoption (idempotent): future opens resolve
                # through the manifest even before the first new commit
                fsio.write_json_meta(self._manifest_path(), m)
                self._cached = m
                return m
        m = {"gen": 0, "n_buckets": self.n_buckets, "buckets": {}}
        self._cached = m
        return m

    def bucket_map(self) -> dict[int, str]:
        """bucket -> generation dir NAME for every bucket with state."""
        return {int(b): d for b, d in self._load()["buckets"].items()}

    def dir_buckets(self) -> dict[str, list[int]]:
        """generation dir name -> the buckets it currently serves."""
        out: dict[str, list[int]] = {}
        for b, d in self.bucket_map().items():
            out.setdefault(d, []).append(b)
        return {d: sorted(bs) for d, bs in out.items()}

    # -- write side ---------------------------------------------------
    def staging_path(self) -> str:
        """Where the next commit's touched-bucket rows must be written
        (``partitionBy("bucket")``, mode=overwrite), then
        :meth:`promote`-d."""
        return os.path.join(
            self.state_dir, self._gen_dir_name(self._load()["gen"] + 1)
        )

    def promote(self, staged: str, touched: list[int]) -> None:
        """Flip the manifest: every bucket in ``touched`` now maps to
        ``staged`` (or, if the staged job produced no rows for it,
        drops out of the mapping — the bucket is empty). Then GC
        superseded partitions. The manifest write IS the commit."""
        base = os.path.basename(staged.rstrip("/"))
        prefix = f"{self.name}-g"
        if not base.startswith(prefix):
            raise ValueError(f"not a staged generation dir: {staged!r}")
        gen = int(base[len(prefix):])
        entries = fsio.listdir_or_none(staged)
        if entries is None or "_SUCCESS" not in entries:
            raise ValueError(
                f"refusing to promote {staged!r}: the parquet job did "
                "not commit (no _SUCCESS marker)"
            )
        present = {
            int(e[len("bucket="):])
            for e in entries
            if e.startswith("bucket=")
        }
        m = self._load()
        prev_buckets = dict(m["buckets"])
        buckets = dict(prev_buckets)
        for b in touched:
            if int(b) in present:
                buckets[str(int(b))] = base
            else:
                buckets.pop(str(int(b)), None)
        m = {"gen": gen, "n_buckets": self.n_buckets, "buckets": buckets}
        fsio.write_json_meta(self._manifest_path(), m)
        self._cached = m
        if self._swept:
            self._gc_targeted(prev_buckets, touched)
        else:
            self._gc()
            self._swept = True

    def _gc_targeted(self, prev_buckets: dict, touched: list[int]) -> None:
        """Post-sweep fast path: the only garbage a commit creates is
        the touched buckets' SUPERSEDED partitions (single writer) —
        delete exactly those, plus any prior generation dir they were
        the last referenced bucket of. O(touched) deletes, no
        listings."""
        live_dirs = {d for d in self._cached["buckets"].values()}
        stale: dict[str, list[int]] = {}
        for b in touched:
            d = prev_buckets.get(str(int(b)))
            if d is not None:
                stale.setdefault(d, []).append(int(b))
        for d, bs in stale.items():
            p = os.path.join(self.state_dir, d)
            try:
                if d not in live_dirs:
                    fsio.rmtree(p)  # no referenced bucket left
                else:
                    for b in bs:
                        fsio.rmtree(os.path.join(p, f"bucket={b}"))
            except OSError:
                pass  # orphan; the next full sweep retries

    def _gc(self) -> None:
        """Remove everything the manifest no longer references:
        un-referenced ``bucket=`` partitions inside generation dirs,
        generation dirs with no referenced bucket left, and the legacy
        dir once fully superseded. Per-entry failure-safe — all GC'd
        paths are unreferenced, a partial sweep just leaves orphans
        for the next commit."""
        live = self.dir_buckets()
        prefix = f"{self.name}-g"
        for d in fsio.listdir(self.state_dir):
            if not (d.startswith(prefix) or d == self.name):
                continue
            p = os.path.join(self.state_dir, d)
            try:
                if not fsio.isdir(p):
                    continue
                keep = set(live.get(d, ()))
                if not keep:
                    fsio.rmtree(p)
                    continue
                for e in fsio.listdir(p):
                    if not e.startswith("bucket="):
                        continue
                    if int(e[len("bucket="):]) not in keep:
                        fsio.rmtree(os.path.join(p, e))
            except OSError:
                pass  # orphan stays; next commit's GC retries
