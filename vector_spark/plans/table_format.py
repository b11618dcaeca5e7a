"""Table-format shim — the Iceberg analog for this sandbox (no Iceberg jars).

SURVEY's design calls for "N Iceberg sink tables" (§2.3, §7); what Iceberg
actually provides for the data plane is (1) readers that see only COMMITTED
snapshots, (2) an atomic metadata swap that makes a multi-file write visible
all-or-nothing, and (3) snapshot history for incremental/resume logic.  This
module reproduces exactly those three properties over plain parquet:

  * every pipeline output directory carries a ``_commits/`` log of numbered
    snapshot files ``v{N}.json`` (monotonic, like Iceberg's metadata.json
    sequence);
  * a snapshot is published by writing ``.tmp`` + fsync + ``os.rename`` —
    atomic on POSIX, the same swap-primitive Iceberg uses via its catalog
    (swap to a real Iceberg catalog = delete this file, keep the call sites);
  * ONE snapshot covers EVERY sink of the pipeline run: a crash between two
    sink writes leaves no commit, so readers see neither sink's partial
    output — no torn multi-sink state (Vector analog: offsets acknowledge
    only after all sinks flushed);
  * commits record per-sink written partitions, which is the same lineage
    the checkpoint table tracks (plans/checkpoint.py) — ``committed()`` here
    IS the resume source, so a restarted run skips committed partitions and
    rewrites only uncommitted ones (idempotent via dynamic partition
    overwrite).

Readers (`read_table`) enumerate the committed partition directories from
the log and read only those paths — uncommitted/torn data files are
invisible, and the path list gives partition pruning for free.

SCHEMA EVOLUTION follows the same metadata-first model: each append snapshot
records the writer's schema, readers apply the RECORDED schema (never
``mergeSchema`` footer scans — at 100 TB that is a full-manifest footer read
per query), so adding a column makes pre-evolution files read it as NULL,
dropping one hides it everywhere, time travel sees each version under its
own schema, and same-name type changes are refused at write time
(:class:`SchemaEvolutionError`) before anything commits.

At 100 TB the same structure holds: data files land on the object store
(the expensive, restartable part), and the commit is one small atomic
metadata operation — identical cost profile to Iceberg's commit.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.plans.checkpoint import PART_COL

_VERSION_RE = re.compile(r"^v(\d+)\.json$")


class TimeTravelUnavailable(RuntimeError):
    """A historical snapshot's data can no longer be reconstructed — the
    partition was physically overwritten by a later append (dynamic
    partition overwrite replaces the directory), its files were removed by
    ``vacuum_table``, or it was dir-mode at that version and later writes
    changed the directory's contents.  ``pin_files`` + retained (unvacuumed)
    rewrites are what make a version re-readable — the same contract as
    Iceberg, where time travel ends at ``expire_snapshots`` +
    ``remove_orphan_files``."""


class IncrementalUnavailable(RuntimeError):
    """Raised by :func:`read_table_changes` when the requested window's
    changes cannot be derived exactly — refusal, never a silently-wrong
    changelog (the same contract :class:`TimeTravelUnavailable` gives
    reads): history expired, bytes vacuumed, a rollback in the window, or a
    copy-on-write / merge-on-read op whose pre-image is not key-addressable
    (Iceberg's incremental append scan has the same restriction)."""


class CommitConflict(RuntimeError):
    pass


class SchemaEvolutionError(ValueError):
    """A write's schema conflicts with the table's recorded schema in a way
    schema evolution cannot express: a column kept the same name but changed
    type.  Adding and dropping columns is allowed (Iceberg add/drop); type
    changes are refused outright — Iceberg permits a few safe promotions
    (int→long, float→double), but Spark's vectorized parquet reader cannot
    re-read old INT32 pages under an explicit LongType schema, so the shim
    refuses rather than committing metadata its own reader chokes on."""


class CommitLog:
    """Numbered-snapshot commit log under ``<base>/_commits/``."""

    def __init__(self, base: str):
        self.base = base
        self.dir = os.path.join(base, "_commits")
        os.makedirs(self.dir, exist_ok=True)

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            m = _VERSION_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def snapshots(self) -> list[dict]:
        out = []
        for v in self.versions():
            with open(os.path.join(self.dir, f"v{v}.json")) as fh:
                out.append(json.load(fh))
        return out

    def commit(self, meta: dict) -> int:
        """Publish a snapshot atomically (tmp + fsync + hard-link claim).
        ``os.link`` fails with EEXIST when the target exists — unlike
        ``os.rename``, which silently REPLACES it — so two committers racing
        to the same next version cannot clobber each other: exactly one
        claims ``v{N}.json``, the loser gets :class:`CommitConflict` (the
        optimistic-concurrency signal Iceberg's catalog swap gives; the
        caller re-reads the log and retries on fresher state).  Before the
        link, readers see the previous snapshot; after it, the new one —
        never a partial state."""
        version = self.current_version() + 1
        meta = {"version": version, "committed_at": time.time(), **meta}
        final = os.path.join(self.dir, f"v{version}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(meta, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, final)
            except FileExistsError:
                raise CommitConflict(
                    f"snapshot v{version} already exists (concurrent committer won)"
                ) from None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return version

    def manifest(self, as_of: int | None = None) -> dict[str, dict[str, dict]]:
        """Fold all snapshots → {sink: {part_key: {"rows": n, "files": ...}}}.

        ``as_of`` folds only snapshots with ``version <= as_of`` — the
        time-travel manifest.  Raises ``ValueError`` when no metadata at or
        below that version survives (``expire_snapshots`` collapses history
        into a later checkpoint, after which older versions are gone — the
        same horizon Iceberg's ``expire_snapshots`` imposes).

        ``files`` is ``None`` for DIR-mode partitions (readers scan the whole
        partition directory — the original shim behavior) or an explicit
        basename list for FILE-mode partitions (readers see exactly those
        files; anything else in the directory is invisible — Iceberg's
        manifest semantics, which is what makes compaction crash-safe).

        Fold rules per operation:
          append     — sets rows, resets the partition to dir-mode (a dynamic
                       partition overwrite physically replaced the directory)
          pin        — records the current file list (metadata-only, flips a
                       partition to file-mode; rows unchanged)
          rewrite    — replaces the file list (rows unchanged by definition)
          delete /   — replaces the file list AND the row count (row-level
          merge        copy-on-write ops change both)
          checkpoint — wholesale state replacement (written by
                       expire_snapshots before old metadata is dropped)
        """
        state: dict[str, dict[str, dict]] = {}
        folded = 0
        newest_seen = 0
        present: list[int] = []
        anchor = None
        for snap in self.snapshots():
            newest_seen = max(newest_seen, snap["version"])
            if as_of is not None and snap["version"] > as_of:
                continue
            folded += 1
            present.append(snap["version"])
            op = snap.get("operation", "append")
            if op == "checkpoint":
                anchor = snap["version"]
                state = {
                    sink: {p: dict(info) for p, info in parts.items()}
                    for sink, parts in (snap.get("state") or {}).items()
                }
                continue
            for sink, info in (snap.get("sinks") or {}).items():
                tgt = state.setdefault(sink, {})
                if op == "append":
                    for part, rows in (info.get("parts") or {}).items():
                        # dynamic overwrite replaced the directory: any
                        # previously collected file stats describe dead files
                        tgt[part] = {"rows": rows, "files": None}
                elif op in ("pin", "rewrite", "delete", "merge"):
                    for part, files in (info.get("files") or {}).items():
                        cur = tgt.setdefault(part, {"rows": 0, "files": None})
                        cur["files"] = sorted(files)
                    # delete/merge change row counts (stale stats entries for
                    # rewritten-away files are harmless: pruning consults
                    # stats only for file names in the live list)
                    for part, rows in (info.get("rows") or {}).items():
                        tgt.setdefault(part, {"rows": 0, "files": None})["rows"] = rows
                elif op == "delete_mor":
                    # merge-on-read delete: data files untouched, only the
                    # logical row counts move (the tombstones themselves are
                    # folded by delete_files())
                    for part, rows in (info.get("rows") or {}).items():
                        tgt.setdefault(part, {"rows": 0, "files": None})["rows"] = rows
                elif op == "delete_eq":
                    # equality delete: NO scan happened, so row counts cannot
                    # move (they become upper bounds until materialize) and
                    # no file list changes — the fold is metadata-only here
                    pass
                elif op in ("add_files", "cdc_upsert"):
                    # file-level append into existing (file-mode) partitions
                    # (cdc_upsert also carries eq_delete_files, folded by
                    # eq_delete_files(); its tombstone version == its files'
                    # add version, so the new rows dodge their own delete)
                    for part, files in (info.get("files") or {}).items():
                        cur = tgt.setdefault(part, {"rows": 0, "files": []})
                        if cur["files"] is None:
                            raise ValueError(
                                f"add_files into dir-mode partition {part!r} "
                                "(pin_files must precede add_files)"
                            )
                        cur["files"] = sorted(set(cur["files"]) | set(files))
                    for part, delta in (info.get("rows") or {}).items():
                        tgt.setdefault(part, {"rows": 0, "files": []})["rows"] += delta
                elif op == "stats":
                    # merge per FILE per COLUMN-KEY, so min/max and bloom
                    # collections taken at different times compose
                    for part, by_file in (info.get("stats") or {}).items():
                        cur = tgt.setdefault(part, {"rows": 0, "files": None})
                        st = cur.setdefault("stats", {})
                        for f, d in by_file.items():
                            st.setdefault(f, {}).update(d)
                elif op in ("evolve_spec", "flagship_run", "tag", "delete_tag"):
                    # metadata-only for the manifest fold: evolve_spec only
                    # changes the sink's CURRENT spec (folded by
                    # spec_history()); flagship_run records per-sink
                    # cardinality ledgers over its own route-partitioned
                    # layout, not part_col directories; tag/delete_tag are
                    # named refs (folded by tags())
                    pass
                else:
                    raise ValueError(f"unknown snapshot operation {op!r}")
        if as_of is not None:
            if folded == 0:
                raise ValueError(
                    f"no snapshot metadata at or before v{as_of} "
                    "(expired by expire_snapshots, or the version never existed)"
                )
            # CONTIGUITY guard: after expire_snapshots preserves TAGGED
            # versions as self-contained checkpoints, versions between a
            # tagged checkpoint and the expiry checkpoint are gone — folding
            # across the gap would silently return the tagged state for a
            # later version.  Exact iff every version from the latest folded
            # checkpoint up to as_of (capped at the newest version that ever
            # existed) is still on disk.  Derived from the fold's own
            # iteration — no extra metadata reads.
            lo = anchor if anchor is not None else present[0]
            hi = min(as_of, newest_seen)
            missing = [w for w in range(lo, hi + 1) if w not in set(present)]
            if missing:
                raise ValueError(
                    f"history between v{lo} and v{hi} was expired "
                    f"(missing v{missing[0]}..v{missing[-1]}); time travel to "
                    f"v{as_of} is only exact at tagged or current versions"
                )
        return state

    def tags(self, as_of: int | None = None) -> dict[str, int]:
        """Fold snapshots → {tag name: version} — NAMED REFS (the Iceberg
        tag analog: a retained, human-named pointer into history).  A
        checkpoint that carries a ``tags`` mapping replaces the fold
        wholesale (expire_snapshots records the current refs there); a
        checkpoint without one — rollbacks, pre-tag checkpoints — leaves
        refs untouched (a rollback moves table STATE, never refs, exactly
        Iceberg's model)."""
        out: dict[str, int] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            op = snap.get("operation", "append")
            if op == "checkpoint":
                t = snap.get("tags")
                if t is not None:
                    out = {k: int(v) for k, v in t.items()}
            elif op == "tag":
                out[snap["tag"]["name"]] = int(snap["tag"]["at_version"])
            elif op == "delete_tag":
                out.pop(snap["tag"]["name"], None)
        return out

    def committed(self) -> dict[str, dict[str, int]]:
        """Fold all snapshots → {sink: {part_key: rows}} of committed parts."""
        return {
            sink: {part: info["rows"] for part, info in parts.items()}
            for sink, parts in self.manifest().items()
        }

    def schemas(self, as_of: int | None = None) -> dict[str, str]:
        """Fold snapshots → {sink: schema-json} — the table schema AS OF a
        version (latest when ``as_of`` is None).  This is the Iceberg model:
        the schema lives in table metadata, one per snapshot, and readers
        apply the METADATA schema rather than merging data-file footers —
        so old files are read under the current schema (missing columns →
        NULL, dropped columns → invisible) and time travel reads each
        version under the schema it was written with."""
        out: dict[str, str] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            if snap.get("operation", "append") == "checkpoint":
                out = dict(snap.get("schemas") or {})
                continue
            for sink, info in (snap.get("sinks") or {}).items():
                s = info.get("schema")
                if s:
                    out[sink] = s
        return out


    def spec_history(self, as_of: int | None = None) -> dict[str, list]:
        """Fold snapshots → {sink: [spec-or-None per GENERATION]} — the full
        PARTITION-SPEC EVOLUTION history (Iceberg keeps every spec and a
        spec_id per data file; this shim keeps the list and a generation
        prefix in the partition key).  ``hist[g]`` is the spec in force at
        generation ``g``; the CURRENT spec is ``hist[-1]``.  ``hist[0] is
        None`` marks a sink that started FLAT (lineage part keys) and was
        evolved onto a spec later — its gen-0 partitions are never
        spec-pruned.  Sinks never written under any spec have no entry."""
        out: dict[str, list] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            if snap.get("operation", "append") == "checkpoint":
                hist = snap.get("spec_history")
                if hist is not None:
                    out = {k: list(v) for k, v in hist.items()}
                else:  # pre-evolution checkpoint: current spec only
                    out = {k: [list(v)] for k, v in (snap.get("specs") or {}).items()}
                continue
            for sink, info in (snap.get("sinks") or {}).items():
                if not info.get("spec"):
                    continue
                g = int(info.get("spec_gen", 0))
                hist = out.setdefault(sink, [])
                while len(hist) <= g:
                    hist.append(None)
                hist[g] = list(info["spec"])
        return out

    def specs(self, as_of: int | None = None) -> dict[str, list[dict]]:
        """Fold snapshots → {sink: CURRENT partition-spec} — the
        HIDDEN-PARTITIONING spec new writes to each sink must use (the last
        generation of :meth:`spec_history`).  Like :meth:`schemas`, the spec
        lives in table metadata, so readers can derive partition pruning
        from data-column predicates without the caller knowing the layout.
        Sinks written without a spec (lineage part keys) have no entry."""
        return {
            sink: hist[-1]
            for sink, hist in self.spec_history(as_of=as_of).items()
            if hist and hist[-1] is not None
        }

    def delete_files(self, as_of: int | None = None) -> dict[str, list[str]]:
        """Fold snapshots → {sink: [tombstone file names]} — the PENDING
        merge-on-read positional delete files (Iceberg v2 delete files) as of
        a version.  ``delete_mor`` snapshots append their tombstones; a
        rewrite snapshot carrying ``clear_deletes`` (written by
        :func:`materialize_deletes`) resets the sink's list; checkpoints
        replace the whole mapping wholesale."""
        out: dict[str, list[str]] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            if snap.get("operation", "append") == "checkpoint":
                out = {k: list(v) for k, v in (snap.get("delete_files") or {}).items()}
                continue
            for sink, info in (snap.get("sinks") or {}).items():
                if info.get("clear_deletes"):
                    out.pop(sink, None)
                for n in info.get("delete_files") or ():
                    out.setdefault(sink, []).append(n)
        return out

    def eq_delete_files(self, as_of: int | None = None) -> dict[str, list[dict]]:
        """Fold snapshots → {sink: [{"name", "version", "key_cols"}]} — the
        PENDING equality delete files (Iceberg v2's second delete-file kind:
        tombstones by KEY VALUE, written blind with no table scan — the
        streaming-CDC shape).  The recorded commit version is the sequence
        number: a tombstone only deletes rows from files ADDED BEFORE it
        (:meth:`file_versions`), so a later re-insert of the same key
        survives."""
        out: dict[str, list[dict]] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            if snap.get("operation", "append") == "checkpoint":
                out = {
                    k: [dict(e) for e in v]
                    for k, v in (snap.get("eq_delete_files") or {}).items()
                }
                continue
            for sink, info in (snap.get("sinks") or {}).items():
                if info.get("clear_deletes"):
                    out.pop(sink, None)
                for n in info.get("eq_delete_files") or ():
                    out.setdefault(sink, []).append(
                        {
                            "name": n,
                            "version": snap["version"],
                            "key_cols": list(info["key_cols"]),
                        }
                    )
        return out

    def file_versions(self, as_of: int | None = None) -> dict[str, dict[str, int]]:
        """Fold snapshots → {sink: {"part/file": first-seen version}} —
        each data file's ADD VERSION (Iceberg's data sequence number), the
        ordering equality deletes are judged against (keys are bare
        ``part/file``; callers prepend their ``part_col=``).  Files in
        dir-mode partitions have no entry; they are only ever NEWER than any
        pending equality tombstone (every MOR op pins all partitions
        file-mode before committing, and appends never touch committed
        partitions), so readers treat missing entries as +infinity."""
        out: dict[str, dict[str, int]] = {}
        for snap in self.snapshots():
            if as_of is not None and snap["version"] > as_of:
                continue
            op = snap.get("operation", "append")
            if op == "checkpoint":
                out = {
                    k: dict(v) for k, v in (snap.get("file_versions") or {}).items()
                }
                continue
            v = snap["version"]
            for sink, info in (snap.get("sinks") or {}).items():
                tgt = out.setdefault(sink, {})
                for part, files in (info.get("files") or {}).items():
                    for f in files:
                        tgt.setdefault(f"{part}/{f}", v)
        return out


def _check_schema_compat(old_json: str, new_json: str, sink: str) -> None:
    """Refuse type changes on same-named columns (add/drop are fine)."""
    old_fields = {f["name"]: f["type"] for f in json.loads(old_json)["fields"]}
    new_fields = {f["name"]: f["type"] for f in json.loads(new_json)["fields"]}
    changed = [
        (name, old_fields[name], new_fields[name])
        for name in sorted(set(old_fields) & set(new_fields))
        if old_fields[name] != new_fields[name]
    ]
    if changed:
        detail = "; ".join(f"{n}: {o!r} → {w!r}" for n, o, w in changed)
        raise SchemaEvolutionError(
            f"sink {sink!r}: column type change(s) refused ({detail}); "
            "add/drop columns instead, or write the new type under a new name"
        )


# --------------------------------------------------------------------------
# Hidden partitioning — Iceberg partition-spec transforms
# --------------------------------------------------------------------------

_TIME_FMT = {
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
    "hour": "yyyy-MM-dd-HH",
}
_SPEC_TRANSFORMS = {"identity", "bucket", "truncate", *_TIME_FMT}


def norm_spec(spec) -> list[dict]:
    """Canonicalize a partition spec.  Accepts tuples —
    ``("day", "warc_ts")``, ``("bucket", "url", 16)``,
    ``("truncate", "lang", 2)``, ``("identity", "source")`` — or equivalent
    dicts; returns a list of ``{"transform", "col"[, "n"|"w"]}`` dicts
    (JSON-stable, so recorded and requested specs compare with ``==``)."""
    out = []
    for e in spec:
        if isinstance(e, dict):
            t, col, arg = e["transform"], e["col"], e.get("n", e.get("w"))
        else:
            t, col, arg = e[0], e[1], (e[2] if len(e) > 2 else None)
        if t not in _SPEC_TRANSFORMS:
            raise ValueError(
                f"unknown partition transform {t!r} (have {sorted(_SPEC_TRANSFORMS)})"
            )
        d = {"transform": t, "col": col}
        if t == "bucket":
            if not arg or int(arg) < 1:
                raise ValueError(f"bucket({col}) needs n >= 1, got {arg!r}")
            d["n"] = int(arg)
        elif t == "truncate":
            if not arg or int(arg) < 1:
                raise ValueError(f"truncate({col}) needs width >= 1, got {arg!r}")
            d["w"] = int(arg)
        out.append(d)
    if not out:
        raise ValueError("empty partition spec")
    return out


def partition_key_expr(df: DataFrame, spec: list[dict], gen: int = 0):
    """The WRITER half of hidden partitioning: one string Column encoding
    every transform's output, ``~``-joined in spec order — entirely JVM-side
    expressions, evaluated per row during the partitioned write.

    ``gen`` is the SPEC GENERATION (partition-spec evolution): generation 0
    keys are bare; evolved generations prefix ``g{gen}~`` so keys from
    different layouts can never collide in one directory and readers know
    which spec interprets each key.  No gen-0 token can start with ``g``
    (dates/buckets/numerics are digits, strings are ``x``-hex, NULL is
    ``null``), so the prefix is unambiguous by construction.

    Token encodings (each chosen so the key never contains characters
    Spark's partition-path escaping would rewrite, keeping directory names
    equal to the committed key strings):

      * year/month/day/hour → ``date_format`` (``yyyy[-MM[-dd[-HH]]]``, UTC);
      * bucket(n)           → ``pmod(xxhash64(col), n)`` as decimal digits;
      * truncate(w) string  → ``x`` + hex of the first-w-chars' UTF-8 bytes
                              (hex is path-safe; the ``x`` prefix keeps the
                              empty string distinguishable — Spark's writer
                              treats an empty partition VALUE as null);
      * truncate(w) numeric → ``floor(col / w) * w`` as decimal digits;
      * identity            → hex for strings, ``unix_micros`` for
                              timestamps, plain cast-to-string otherwise;
      * NULL                → the literal token ``null`` for every transform
                              (readers prune null-token partitions for ANY
                              predicate on that column: SQL comparisons with
                              NULL are never true).
    """
    from pyspark.sql import types as T

    toks = []
    for e in spec:
        col, t = e["col"], e["transform"]
        c = F.col(col)
        dtype = df.schema[col].dataType
        if t in _TIME_FMT:
            if not isinstance(dtype, (T.TimestampType, T.DateType)):
                raise ValueError(
                    f"{t}({col}) needs a timestamp/date column, got {dtype.simpleString()}"
                )
            v = F.date_format(c, _TIME_FMT[t])
        elif t == "bucket":
            v = F.pmod(F.xxhash64(c), F.lit(e["n"])).cast("string")
        elif t == "truncate":
            if isinstance(dtype, T.StringType):
                v = F.concat(F.lit("x"), F.hex(F.substring(c, 1, e["w"])))
            else:
                v = (F.floor(c / F.lit(e["w"])) * e["w"]).cast("long").cast("string")
        else:  # identity
            if isinstance(dtype, T.StringType):
                v = F.concat(F.lit("x"), F.hex(c))
            elif isinstance(dtype, T.TimestampType):
                v = F.unix_micros(c).cast("string")
            else:
                v = c.cast("string")
        toks.append(F.when(c.isNull(), F.lit("null")).otherwise(v))
    if gen:
        toks.insert(0, F.lit(f"g{gen}"))
    return F.concat_ws("~", *toks)


def _parse_dt_bound(v):
    """Predicate bound → naive datetime, or None when unparseable (callers
    then skip pruning on it — sound by default)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        try:
            return _dt.datetime.fromisoformat(v)
        except ValueError:
            return None
    return None


def _time_window(tok: str, gran: str):
    """Partition token → the half-open [start, end) window it covers."""
    import datetime as _dt

    p = [int(x) for x in tok.split("-")]
    y, m, d, h = p[0], p[1] if len(p) > 1 else 1, p[2] if len(p) > 2 else 1, \
        p[3] if len(p) > 3 else 0
    start = _dt.datetime(y, m, d, h)
    if gran == "hour":
        end = start + _dt.timedelta(hours=1)
    elif gran == "day":
        end = start + _dt.timedelta(days=1)
    elif gran == "month":
        end = _dt.datetime(y + m // 12, m % 12 + 1, 1)
    else:
        end = _dt.datetime(y + 1, 1, 1)
    return start, end


def _tok_disproves_range(tok: str, e: dict, schema, lo, hi) -> bool:
    """True when partition token ``tok`` PROVES no row in the partition can
    satisfy ``lo <= col <= hi`` (either bound may be None).  Every branch is
    conservative: a decode surprise or type mismatch returns False (scan the
    partition) — pruning is an optimization, never a correctness decision."""
    t = e["transform"]
    try:
        if t in _TIME_FMT:
            start, end = _time_window(tok, t)
            lo_dt, hi_dt = _parse_dt_bound(lo), _parse_dt_bound(hi)
            return (hi is not None and hi_dt is not None and start > hi_dt) or (
                lo is not None and lo_dt is not None and end <= lo_dt
            )
        if t == "bucket":
            return False  # hash buckets carry no order: ranges never prune
        styp = None
        if schema is not None and e["col"] in schema.fieldNames():
            styp = schema[e["col"]].dataType.simpleString()
        if t == "truncate":
            if tok.startswith("x"):  # string prefix, hex-encoded
                p = bytes.fromhex(tok[1:]).decode("utf-8")
                # rows start with prefix p, so row >= p (binary order) and
                # row[:w] == p; compare hi against p, lo against lo's prefix
                return (hi is not None and isinstance(hi, str) and p > hi) or (
                    lo is not None and isinstance(lo, str) and p < lo[: e["w"]]
                )
            v, w = float(tok), e["w"]  # numeric: partition covers [v, v+w)
            return (hi is not None and v > float(hi)) or (
                lo is not None and v + w <= float(lo)
            )
        # identity
        if tok.startswith("x") or styp == "string":
            v = bytes.fromhex(tok[1:]).decode("utf-8")
            return (hi is not None and isinstance(hi, str) and v > hi) or (
                lo is not None and isinstance(lo, str) and v < lo
            )
        if styp == "timestamp":
            import datetime as _dt

            epoch = _dt.datetime(1970, 1, 1)
            v = epoch + _dt.timedelta(microseconds=int(tok))
            lo_dt, hi_dt = _parse_dt_bound(lo), _parse_dt_bound(hi)
            return (hi is not None and hi_dt is not None and v > hi_dt) or (
                lo is not None and lo_dt is not None and v < lo_dt
            )
        if styp in ("date", "boolean"):
            s = _stat_key(lo), _stat_key(hi)  # ISO date strings compare in order
            return (hi is not None and isinstance(s[1], str) and tok > s[1]) or (
                lo is not None and isinstance(s[0], str) and tok < s[0]
            )
        v = float(tok)
        return (hi is not None and v > float(hi)) or (
            lo is not None and v < float(lo)
        )
    except (ValueError, TypeError, OverflowError):
        return False


def _tok_proves_range(tok: str, e: dict, schema, lo, hi) -> bool:
    """The PROOF dual of :func:`_tok_disproves_range`: True when partition
    token ``tok`` proves EVERY row in the partition satisfies
    ``lo <= col <= hi`` (either bound may be None = unbounded).  This is
    what lets :func:`count_rows` answer from the manifest without opening a
    single data file.  Every branch is conservative the other way round: a
    decode surprise or an unprovable transform returns False (the caller
    falls back to file stats or a scan) — a wrong True would be a wrong
    COUNT, so only airtight cases return True:

      * time transforms — the token's [start, end) window lies inside the
        bounds (end is exclusive; timestamps are µs-resolution, so the top
        test uses end - 1µs);
      * bucket — never provable (hash order);
      * truncate numeric — the covered [v, v+w) window lies inside;
      * truncate string — rows share prefix p but their suffixes are
        unbounded above, so only a one-sided ``lo <= p`` with ``hi is None``
        is provable;
      * identity — the token IS the single value every row shares.

    A non-null token also proves the column is non-NULL for every row, so
    no separate null-count check is needed at partition level."""
    t = e["transform"]
    if tok == "null":
        return False  # NULL rows satisfy no comparison
    try:
        if t in _TIME_FMT:
            import datetime as _dt

            start, end = _time_window(tok, t)
            if lo is not None:
                lo_dt = _parse_dt_bound(lo)
                if lo_dt is None or lo_dt > start:
                    return False
            if hi is not None:
                hi_dt = _parse_dt_bound(hi)
                if hi_dt is None or hi_dt < end - _dt.timedelta(microseconds=1):
                    return False
            return True
        if t == "bucket":
            return False
        styp = None
        if schema is not None and e["col"] in schema.fieldNames():
            styp = schema[e["col"]].dataType.simpleString()
        if t == "truncate":
            if tok.startswith("x"):  # string prefix, hex-encoded
                if hi is not None:
                    return False
                p = bytes.fromhex(tok[1:]).decode("utf-8")
                return lo is None or (isinstance(lo, str) and lo <= p)
            v, w = float(tok), e["w"]  # numeric: partition covers [v, v+w)
            top = v + w - 1 if styp in ("tinyint", "smallint", "int", "bigint") else v + w
            if lo is not None and float(lo) > v:
                return False
            if hi is not None and float(hi) < top:
                return False
            return True
        # identity: the token encodes the one value every row shares
        if tok.startswith("x") or styp == "string":
            v = bytes.fromhex(tok[1:]).decode("utf-8")
            if lo is not None and not (isinstance(lo, str) and lo <= v):
                return False
            if hi is not None and not (isinstance(hi, str) and v <= hi):
                return False
            return True
        if styp == "timestamp":
            import datetime as _dt

            v = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(tok))
            if lo is not None:
                lo_dt = _parse_dt_bound(lo)
                if lo_dt is None or lo_dt > v:
                    return False
            if hi is not None:
                hi_dt = _parse_dt_bound(hi)
                if hi_dt is None or hi_dt < v:
                    return False
            return True
        if styp in ("date", "boolean"):
            slo, shi = _stat_key(lo), _stat_key(hi)
            if lo is not None and not (isinstance(slo, str) and slo <= tok):
                return False
            if hi is not None and not (isinstance(shi, str) and tok <= shi):
                return False
            return True
        v = float(tok)
        if lo is not None and float(lo) > v:
            return False
        if hi is not None and float(hi) < v:
            return False
        return True
    except (ValueError, TypeError, OverflowError):
        return False


def _bucket_of(spark: SparkSession, schema, col: str, value, n: int):
    """The reader half of the bucket transform: hash a probe literal the
    exact way the writer hashed the column (xxhash64 after casting to the
    RECORDED column type — hashing "42" as a string and 42 as a long give
    different buckets).  One tiny 1-row job, cached per (col, n, value)."""
    if schema is None or col not in schema.fieldNames():
        return None
    dt = schema[col].dataType
    row = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(value).cast(dt)), F.lit(n)).alias("b"))
        .first()
    )
    return None if row is None else row["b"]


def _resolve_spec(hist: list, key: str):
    """(spec, tokens) the partition key was written under, per the spec
    EVOLUTION history — or None when unknowable (flat gen-0 partitions,
    foreign layouts, token-count mismatch): those are never pruned.
    Evolved keys carry a ``g{gen}~`` prefix; bare keys are generation 0."""
    toks = key.split("~")
    head = toks[0]
    if len(head) > 1 and head[0] == "g" and head[1:].isdigit():
        g = int(head[1:])
        if 0 < g < len(hist) and hist[g] is not None and len(toks) - 1 == len(hist[g]):
            return hist[g], toks[1:]
        return None
    sp = hist[0] if hist else None
    if sp is not None and len(toks) == len(sp):
        return sp, toks
    return None


def _part_pruned(
    spark: SparkSession,
    hist: list,
    schema,
    key: str,
    prune,
    prune_eq,
    bcache: dict,
) -> bool:
    """True when the PARTITION KEY proves the whole partition holds no
    matching row — Iceberg's manifest-level partition pruning, derived from
    predicates on DATA columns via the recorded spec HISTORY (the caller
    never names the partition layout; each key is interpreted under the
    spec generation that wrote it).  Runs before, and composes with,
    per-file stats skipping (:func:`_file_pruned`).  Keys whose generation
    or token count does not match any recorded spec (foreign layouts,
    pre-evolution flat partitions) are never pruned."""
    resolved = _resolve_spec(hist, key)
    if resolved is None:
        return False
    spec, toks = resolved
    rng = _as_predicate_list(prune)
    eqs = _as_predicate_list(prune_eq)
    for tok, e in zip(toks, spec):
        col = e["col"]
        for pcol, lo, hi in rng:
            if pcol != col:
                continue
            if tok == "null":  # all-NULL partition: no range can match
                return True
            if _tok_disproves_range(tok, e, schema, lo, hi):
                return True
        for ecol, val in eqs:
            if ecol != col:
                continue
            if tok == "null":
                return True
            if e["transform"] == "bucket":
                ck = (col, e["n"], str(val))
                if ck not in bcache:
                    bcache[ck] = _bucket_of(spark, schema, col, val, e["n"])
                if bcache[ck] is not None and tok != str(bcache[ck]):
                    return True
            elif _tok_disproves_range(tok, e, schema, val, val):
                return True
    return False


def write_multi_sink(
    sinks: dict[str, DataFrame],
    base: str,
    part_col: str = PART_COL,
    run_id: str | None = None,
    on_event=None,
    spec=None,
    spec_distribute: bool = True,
) -> dict[str, dict[str, int]]:
    """Resumable, atomically-committed multi-sink write.

    1. read the commit log → per-sink committed part keys
    2. per sink: filter committed parts OUT, write the rest with dynamic
       partition overwrite (idempotent redo after any crash)
    3. publish ONE snapshot covering every sink — the atomic rename is the
       only point where anything becomes visible

    Returns {sink: {part_key: rows}} written in THIS invocation.

    ``on_event`` is a fault-injection hook for chaos tests: it is called
    with "before_write:<sink>" / "after_write:<sink>" / "before_commit" at
    the corresponding points; a hook that raises simulates a crash there.
    Production callers leave it None — the protocol's correctness must not
    depend on anything the hook does.

    ``spec`` turns on HIDDEN PARTITIONING (Iceberg partition-spec
    transforms): a list of transform tuples (see :func:`norm_spec`) applied
    to every sink, or a ``{sink: spec}`` dict for per-sink layouts.  The
    partition key column is DERIVED from data columns
    (:func:`partition_key_expr`) — callers never materialize it — and the
    spec is recorded in the snapshot, so :func:`read_table` prunes whole
    partitions from ordinary ``prune``/``prune_eq`` predicates on the
    SOURCE columns.  Writes must use the sink's CURRENT spec: a write under
    a different spec (or none) is refused — change the layout first with
    :func:`evolve_spec` (partition-spec evolution; old partitions keep
    their old layout, exactly Iceberg's model).

    ``spec_distribute`` (default True) hash-repartitions each spec sink by
    the derived key before writing — Iceberg's default
    ``write.distribution-mode=hash`` for partitioned tables.  Without it,
    EVERY write task opens a file in EVERY partition it sees rows for:
    N tasks x P partitions files per append, the canonical small-files
    explosion (measured 16x file count and 3x write time at 1M rows,
    bench_results/hidden_part.json).  The one shuffle buys one file per
    partition per append.  Set False only when the input is already
    clustered by the spec columns.
    """
    notify = on_event or (lambda _evt: None)
    log = CommitLog(base)
    done = log.committed()
    recorded_schemas = log.schemas()
    spec_hist = log.spec_history()
    recorded_specs = {
        k: h[-1] for k, h in spec_hist.items() if h and h[-1] is not None
    }
    schema_by_sink: dict[str, str] = {}
    spec_by_sink: dict[str, tuple[list[dict], int]] = {}
    written: dict[str, dict[str, int]] = {}
    # NULL part keys: Spark writes them under NULL_PART_KEY's directory name;
    # we commit them under the same key so read_table finds the data, and the
    # resume filter is NULL-safe (a bare `~isin(...)` is NULL for NULL keys,
    # which would silently drop those rows from every rerun).
    null_key = NULL_PART_KEY
    for name, df in sinks.items():
        sp = norm_spec(spec[name]) if isinstance(spec, dict) and name in spec \
            else (norm_spec(spec) if spec is not None and not isinstance(spec, dict) else None)
        rec = recorded_specs.get(name)
        if rec is not None and sp != rec:
            raise ValueError(
                f"sink {name!r}: partition spec change refused "
                f"(current {rec}, got {sp}); run evolve_spec() first — "
                "writes always use the sink's current spec generation"
            )
        if sp is not None:
            if rec is None and done.get(name):
                raise ValueError(
                    f"sink {name!r} already has committed partitions without a "
                    "spec; run evolve_spec() to switch it to hidden partitioning"
                )
            gen = len(spec_hist.get(name, [sp])) - 1
            if part_col in df.columns:
                df = df.drop(part_col)
            df = df.withColumn(part_col, partition_key_expr(df, sp, gen=gen))
            if spec_distribute:
                df = df.repartition(F.col(part_col))
            spec_by_sink[name] = (sp, gen)
        # Record the DATA schema only: the partition column lives in
        # directory names whose type is re-inferred on read (Iceberg
        # likewise keeps the partition spec outside the schema), so
        # including it would flag spurious "type changes" between writers
        # that key partitions as int vs string.
        from pyspark.sql.types import StructType

        schema_by_sink[name] = StructType(
            [f for f in df.schema.fields if f.name != part_col]
        ).json()
        old = recorded_schemas.get(name)
        if old is not None and old != schema_by_sink[name]:
            _check_schema_compat(old, schema_by_sink[name], name)
        committed_keys = set(done.get(name, {}))
        todo = df
        if committed_keys:
            key = F.coalesce(F.col(part_col).cast("string"), F.lit(null_key))
            todo = df.filter(~key.isin(*committed_keys))
        counts = {
            (null_key if r[part_col] is None else str(r[part_col])): r["n"]
            for r in todo.groupBy(part_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if counts:
            notify(f"before_write:{name}")
            todo.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy(part_col).parquet(os.path.join(base, name))
            notify(f"after_write:{name}")
        written[name] = counts
    if any(written.values()):
        notify("before_commit")
        log.commit(
            {
                "operation": "append",
                "run_id": run_id,
                "sinks": {
                    name: {
                        "parts": parts,
                        "schema": schema_by_sink[name],
                        **(
                            {
                                "spec": spec_by_sink[name][0],
                                "spec_gen": spec_by_sink[name][1],
                            }
                            if name in spec_by_sink
                            else {}
                        ),
                    }
                    for name, parts in written.items()
                },
            }
        )
    return written


def tag_snapshot(base: str, name: str, version: int | None = None,
                 replace: bool = False) -> int:
    """Create (or with ``replace=True`` move) a NAMED TAG pointing at a
    snapshot — the Iceberg ``create_tag`` analog.  A tag is a retained ref:
    ``read_table(tag=...)`` / ``count_rows(tag=...)`` resolve it to a
    time-travel read, ``expire_snapshots`` preserves the tagged version as a
    self-contained checkpoint instead of dropping it, and ``vacuum_table``
    keeps the files it references ("publish the audited corpus as
    `gold-2026-01`" — the data-release workflow).  Defaults to the current
    version.  Returns the tag snapshot's version (the tag itself is one
    metadata commit, so it is visible atomically and survives in history)."""
    log = CommitLog(base)
    cur = log.current_version()
    if cur == 0:
        raise ValueError("nothing committed yet — no snapshot to tag")
    v = cur if version is None else int(version)
    if not 1 <= v <= cur:
        raise ValueError(f"version {v} out of range (1..{cur})")
    log.manifest(as_of=v)  # raises when that history is already gone
    tags = log.tags()
    if name in tags and not replace:
        raise ValueError(
            f"tag {name!r} already points at v{tags[name]} "
            "(pass replace=True to move it)"
        )
    return log.commit({"operation": "tag", "tag": {"name": name, "at_version": v}})


def delete_tag(base: str, name: str) -> int:
    """Drop a named tag (Iceberg ``remove_tag``).  The tagged version's
    metadata stays in history; what changes is retention — the next
    ``expire_snapshots`` / ``vacuum_table`` no longer preserve it."""
    log = CommitLog(base)
    if name not in log.tags():
        raise KeyError(f"unknown tag {name!r} (have {sorted(log.tags())})")
    return log.commit({"operation": "delete_tag", "tag": {"name": name}})


def _resolve_tag(log: CommitLog, tag: str | None, version: int | None) -> int | None:
    """Shared tag→version resolution for read_table/count_rows."""
    if tag is None:
        return version
    if version is not None:
        raise ValueError("pass version OR tag, not both")
    tags = log.tags()
    if tag not in tags:
        raise KeyError(f"unknown tag {tag!r} (have {sorted(tags)})")
    return tags[tag]


def evolve_spec(base: str, sink: str, new_spec) -> int:
    """PARTITION-SPEC EVOLUTION (Iceberg `ALTER TABLE ... WRITE ORDERED/
    PARTITIONED BY` analog): make ``new_spec`` the sink's CURRENT spec in a
    metadata-only snapshot.  No data moves — partitions already written
    keep their old layout and are read/pruned under the spec generation
    that wrote them (:func:`_resolve_spec`); only FUTURE writes use the new
    layout, with a ``g{gen}~`` key prefix so generations can never collide
    in one directory.  A flat sink (lineage part keys) may evolve onto its
    first spec: its existing partitions simply become generation 0 with no
    spec (never pruned, always scanned — sound).  Returns the committed
    snapshot version.  Evolving to the spec already in force is refused
    (it would burn a generation for nothing); so is an invalid transform
    or, when a schema is recorded, a column the sink does not have."""
    sp = norm_spec(new_spec)
    log = CommitLog(base)
    hist = log.spec_history().get(sink)
    if hist is None:
        hist = [None] if log.committed().get(sink) else []
    if hist and hist[-1] == sp:
        raise ValueError(
            f"sink {sink!r}: evolve_spec to the spec already in force "
            f"(generation {len(hist) - 1}) — nothing to change"
        )
    schema_json = log.schemas().get(sink)
    if schema_json is not None:
        cols = {f["name"] for f in json.loads(schema_json).get("fields", [])}
        missing = [e["col"] for e in sp if e["col"] not in cols]
        if missing:
            raise ValueError(
                f"sink {sink!r}: spec columns {missing} not in the recorded "
                f"schema — evolve the schema first (write with the column), "
                "then the spec"
            )
    return log.commit(
        {
            "operation": "evolve_spec",
            "sinks": {sink: {"spec": sp, "spec_gen": len(hist)}},
        }
    )


def _stat_key(v):
    """JSON-safe, order-preserving representation of a stats value.
    Numbers pass through; datetimes/dates become ISO strings (fixed-width
    UTC ISO compares lexicographically in time order); everything else is
    stringified.  Both the collected min/max AND the prune bounds go
    through this, so comparisons are always like-vs-like."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    iso = getattr(v, "isoformat", None)
    return iso() if iso else str(v)


def _as_predicate_list(p) -> list[tuple]:
    """Normalize ``prune``/``prune_eq`` arguments: ``None`` → [], one tuple
    → [tuple], list of tuples → itself.  A multi-predicate prune is the
    conjunction (a file survives only if NO predicate disproves it) — the
    shape a 2-D query window needs against a Z-ordered layout."""
    if p is None:
        return []
    if isinstance(p, tuple):
        return [p]
    return list(p)


def _file_pruned(
    spark: SparkSession,
    fstats: dict,
    prune,
    prune_eq,
    probes: dict[tuple[int, int], list[int]],
) -> bool:
    """True when this file's collected statistics PROVE it holds no matching
    row — the single per-file skip decision shared by :func:`read_table` and
    the copy-on-write row ops (:func:`delete_where`, :func:`merge_upsert`),
    so scan pruning and rewrite pruning can never drift.  Files without
    stats are never pruned (sound by default).  ``prune``/``prune_eq``
    accept one tuple or a list of tuples (ANDed)."""
    for pcol, lo, hi in _as_predicate_list(prune):
        lo, hi = _stat_key(lo), _stat_key(hi)
        rng = fstats.get(pcol)
        if rng is not None:
            mn, mx = rng
            # NULL-only files record [None, None]: no value can match a
            # range predicate (SQL comparisons with NULL are never true)
            if mn is None or (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return True
    for ecol, evalue in _as_predicate_list(prune_eq):
        bloom = fstats.get(f"_bloom:{ecol}")
        if bloom is not None:
            mk = (bloom["m"], bloom["k"])
            if mk not in probes:
                probes[mk] = _bloom_probe_positions(spark, evalue, *mk)
            if not _bloom_maybe_contains(bloom["b64"], probes[mk]):
                return True
    return False


def _check_time_travelable(
    log: CommitLog, base: str, sink: str, part_col: str, parts: dict, version: int
) -> None:
    """Raise :class:`TimeTravelUnavailable` unless every partition of the
    as-of manifest can still be read byte-exactly.  File-mode partitions
    need every manifest file still on disk (rewrite/delete/merge keep the
    originals until vacuum); dir-mode partitions are reconstructable only
    while NO later snapshot touched them (a later append physically
    replaced the directory; a later pin means a compactor may have staged
    files into it)."""
    later_touched: set[str] = set()
    for snap in log.snapshots():
        if snap["version"] <= version:
            continue
        info = (snap.get("sinks") or {}).get(sink) or {}
        for fld in ("parts", "files", "stats", "rows"):
            later_touched |= set(info.get(fld) or {})
    bad = []
    for k, info in parts.items():
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        if info["files"] is None:
            if k in later_touched:
                bad.append(
                    f"{part_col}={k}: dir-mode at v{version} and changed by a later "
                    "snapshot (pin_files makes partitions time-travelable)"
                )
        else:
            missing = [f for f in info["files"] if not os.path.exists(os.path.join(pdir, f))]
            if missing:
                bad.append(
                    f"{part_col}={k}: {len(missing)} manifest file(s) no longer on "
                    f"disk (vacuumed or overwritten), e.g. {missing[0]}"
                )
    ddir = os.path.join(base, sink, "_deletes")
    tomb_names = list(log.delete_files(as_of=version).get(sink) or ()) + [
        e["name"] for e in log.eq_delete_files(as_of=version).get(sink) or ()
    ]
    for n in tomb_names:
        if not os.path.exists(os.path.join(ddir, n)):
            bad.append(
                f"tombstone {n} no longer on disk (vacuumed after its deletes "
                "were materialized)"
            )
    if bad:
        raise TimeTravelUnavailable(
            f"cannot reconstruct {sink!r} at v{version}: " + "; ".join(bad)
        )


def read_table(
    spark: SparkSession,
    base: str,
    sink: str,
    part_col: str = PART_COL,
    prune: tuple | None = None,
    prune_eq: tuple | None = None,
    version: int | None = None,
    tag: str | None = None,
) -> DataFrame | None:
    """Snapshot-isolated read: only partitions recorded in committed
    snapshots are visible (None when nothing is committed).  Dir-mode
    partitions contribute their directory; file-mode partitions contribute
    EXACTLY their manifest files (staged/orphaned files are invisible).
    The explicit path list doubles as partition pruning.

    ``prune=(col, lo, hi)`` adds Iceberg-style FILE skipping: files whose
    collected min/max statistics (:func:`collect_file_stats`) prove they
    hold no row with ``lo <= col <= hi`` are dropped from the scan path
    list (either bound may be None for a one-sided range).  This is a
    SUPERSET guarantee, exactly like parquet PushedFilters: surviving files
    may still contain non-matching rows, so the caller applies the real
    ``.filter`` on top — pruning only bounds what is SCANNED.  Files or
    partitions without stats are always kept (never unsound), so stats can
    be collected lazily / per-partition.  At 100 TB this is the difference
    between scanning a time-clustered table's whole history and scanning
    the few files whose range overlaps the query window.

    Both ``prune`` and ``prune_eq`` also accept a LIST of tuples — the
    conjunction, which is how a 2-D query window prunes against a
    Z-ordered layout (``compact_table(cluster_by=["a", "b"])``).

    ``prune_eq=(col, value)`` is the EQUALITY twin backed by per-file Bloom
    filters (:func:`collect_file_blooms`): files whose filter proves
    ``col = value`` (string form) matches nothing are skipped — the point
    lookup ("this url's rows") that min/max can't serve on an unclustered
    column.  Same superset guarantee; both prunes may be combined.

    ``version=N`` is TIME TRAVEL: read the table as of snapshot ``N``
    (Iceberg's ``VERSION AS OF``).  File-mode partitions re-read exactly
    their v≤N manifest files (rewrite/delete/merge keep the old files on
    disk until ``vacuum_table``, so recent history stays readable);
    :class:`TimeTravelUnavailable` is raised when the bytes are gone — a
    later append physically overwrote the partition, vacuum removed the old
    files, or the partition was dir-mode at ``N`` and later writes changed
    the directory.

    ``tag="name"`` resolves a named ref (:func:`tag_snapshot`) to its
    version and reads there — tagged versions stay readable across
    ``expire_snapshots`` / ``vacuum_table``, which retain them."""
    log = CommitLog(base)
    version = _resolve_tag(log, tag, version)
    parts = log.manifest(as_of=version).get(sink, {})
    if not parts:
        return None
    if version is not None:
        _check_time_travelable(log, base, sink, part_col, parts, version)
    schema_json = log.schemas(as_of=version).get(sink)
    schema_struct = None
    if schema_json is not None:
        from pyspark.sql.types import StructType

        schema_struct = StructType.fromJson(json.loads(schema_json))
    pruned: list[str] = []
    probes: dict[tuple[int, int], list[int]] = {}  # keyed (m, k): collections may differ
    bcache: dict = {}  # bucket-transform probe results, per (col, n, value)
    paths = []
    use_stats = prune is not None or prune_eq is not None
    sink_spec = log.spec_history(as_of=version).get(sink) if use_stats else None
    for k in sorted(parts):
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        files = parts[k]["files"]
        if sink_spec is not None and _part_pruned(
            spark, sink_spec, schema_struct, k, prune, prune_eq, bcache
        ):
            # HIDDEN-PARTITION pruning: the key alone disproves the predicate
            # for the whole partition — works even dir-mode, where file stats
            # cannot (the manifest-level half of Iceberg's two-level skip)
            pruned.append(pdir)
            continue
        if files is None:
            paths.append(pdir)
            continue
        stats = parts[k].get("stats", {}) if use_stats else {}
        for f in files:
            if _file_pruned(spark, stats.get(f, {}), prune, prune_eq, probes):
                pruned.append(os.path.join(pdir, f))
            else:
                paths.append(os.path.join(pdir, f))
    reader = spark.read.option("basePath", os.path.join(base, sink))
    if schema_struct is not None:
        # SCHEMA EVOLUTION: apply the snapshot's recorded schema instead of
        # merging data-file footers (the Iceberg model).  Files written
        # before a column was added read it as NULL; columns dropped from
        # the schema are invisible even though old files still carry them;
        # time travel sees each version under its own schema.
        reader = reader.schema(schema_struct)
    if not paths:
        # everything pruned: preserve the schema, scan nothing at runtime
        return reader.parquet(
            *[p for p in pruned]
        ).where(F.lit(False))
    df = reader.parquet(*paths)
    tombs = log.delete_files(as_of=version).get(sink)
    eq = log.eq_delete_files(as_of=version).get(sink)
    if tombs or eq:
        # MERGE-ON-READ: subtract pending positional deletes (anti-join on
        # (partition-dir/file, row_index)) and equality deletes (anti-join
        # on key values with the add-version residual, so re-inserted keys
        # survive).  The position key is computed ONCE from _metadata, on
        # the raw scan — metadata columns don't survive joins.
        cols = df.columns
        keyed = df.select("*", *_pos_key_cols())
        if tombs:
            ddir = os.path.join(base, sink, "_deletes")
            tomb = spark.read.parquet(
                *[os.path.join(ddir, n) for n in tombs]
            ).select("__tf_file", "__tf_pos")
            keyed = keyed.join(tomb, ["__tf_file", "__tf_pos"], "left_anti")
        if eq:
            keyed = _eq_join(
                spark, keyed, base, sink, eq, log, part_col, version, "left_anti"
            )
        df = keyed.select(*cols)
    return df


def collect_file_stats(
    spark: SparkSession,
    base: str,
    sink: str,
    columns: list[str],
    part_col: str = PART_COL,
) -> dict[str, dict[str, dict]]:
    """Collect per-FILE min/max for ``columns`` into a metadata snapshot —
    the Iceberg manifest-stats analog that powers :func:`read_table`'s
    ``prune``.

    Pins dir-mode partitions first (stats are only meaningful for a frozen
    file list), then ONE distributed pass over the manifest files grouped
    by ``input_file_name()`` — never a per-file loop of driver jobs.  Stats
    are stored per (partition, file, column) as JSON-safe [min, max] (ISO
    strings for timestamps — order-preserving).  Files written after the
    collection simply lack stats until the next collection and are never
    pruned.  Returns {part: {file: {col: [min, max]}}}."""
    from urllib.parse import unquote

    log = CommitLog(base)
    pin_files(base, sink, part_col)
    parts = log.manifest().get(sink, {})
    paths = []
    for k in sorted(parts):
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        for f in parts[k]["files"] or ():
            paths.append(os.path.join(pdir, f))
    if not paths:
        return {}
    df = _sink_reader(spark, log, base, sink).parquet(*paths)
    # Per-file row and per-column NULL counts ride along with min/max in the
    # same single pass (Iceberg manifests carry record_count and
    # null_value_counts for exactly this reason): they are what lets
    # count_rows() answer from metadata — a file counts from its stats only
    # when the stats PROVE every row matches, and min/max ignore NULLs, so
    # that proof needs the null count to be zero.
    aggs = [F.count(F.lit(1)).alias("_rc")]
    for i, c in enumerate(columns):
        aggs += [
            F.min(c).alias(f"_mn{i}"),
            F.max(c).alias(f"_mx{i}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nl{i}"),
        ]
    rows = df.groupBy(F.input_file_name().alias("_f")).agg(*aggs).collect()
    marker = f"/{part_col}="
    out: dict[str, dict[str, dict]] = {}
    for r in rows:
        path = unquote(r["_f"])
        tail = path[path.rindex(marker) + len(marker):]
        part, fname = tail.split("/", 1)
        d: dict = {"_rowcount": r["_rc"]}
        for i, c in enumerate(columns):
            d[c] = [_stat_key(r[f"_mn{i}"]), _stat_key(r[f"_mx{i}"])]
            d[f"_nulls:{c}"] = r[f"_nl{i}"]
        out.setdefault(part, {})[fname] = d
    if out:
        log.commit({"operation": "stats", "sinks": {sink: {"stats": out}}})
    return out


def _part_proven(hist, schema, key: str, rng: list, eqs: list) -> tuple[set, set]:
    """Which predicates does the PARTITION KEY alone prove all-match?
    Returns (proven range-pred indices, proven eq-pred indices), interpreting
    the key under the spec generation that wrote it (None/foreign layouts
    prove nothing)."""
    resolved = _resolve_spec(hist, key) if hist else None
    if resolved is None:
        return set(), set()
    spec, toks = resolved
    prng: set = set()
    peq: set = set()
    for tok, e in zip(toks, spec):
        col = e["col"]
        for i, (pcol, lo, hi) in enumerate(rng):
            if pcol == col and _tok_proves_range(tok, e, schema, lo, hi):
                prng.add(i)
        for i, (ecol, val) in enumerate(eqs):
            # equality proof = the degenerate range [val, val]; bucket and
            # truncate can never prove it, identity/time can
            if ecol == col and _tok_proves_range(tok, e, schema, val, val):
                peq.add(i)
    return prng, peq


def _file_proves_range(fstats: dict, pcol: str, lo, hi) -> bool:
    """True when this file's stats prove EVERY row satisfies
    ``lo <= pcol <= hi``: min/max inside the bounds AND a recorded zero
    null count (min/max ignore NULLs, and NULL satisfies no comparison, so
    without the null count the proof is unsound)."""
    rng = fstats.get(pcol)
    if rng is None or fstats.get(f"_nulls:{pcol}") != 0:
        return False
    mn, mx = rng
    if mn is None:
        return False
    lo, hi = _stat_key(lo), _stat_key(hi)
    try:
        if lo is not None and mn < lo:
            return False
        if hi is not None and mx > hi:
            return False
    except TypeError:
        return False
    return True


def _predicate_condition(rng: list, eqs: list):
    """The predicates as a real Column filter — applied to boundary files a
    metadata count cannot decide.  Semantics match the stats comparison:
    inclusive BETWEEN for ranges (one-sided when a bound is None), equality
    for eq — NULL never matches either."""
    cond = F.lit(True)
    for pcol, lo, hi in rng:
        if lo is not None:
            cond = cond & (F.col(pcol) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(pcol) <= F.lit(hi))
    for ecol, val in eqs:
        cond = cond & (F.col(ecol) == F.lit(val))
    return cond


def count_rows(
    spark: SparkSession,
    base: str,
    sink: str,
    part_col: str = PART_COL,
    prune: tuple | list | None = None,
    prune_eq: tuple | list | None = None,
    version: int | None = None,
    tag: str | None = None,
    audit: dict | None = None,
) -> int:
    """COUNT(*) [WHERE …] answered from METADATA wherever possible — the
    Iceberg aggregate-pushdown analog (Iceberg answers ``count(*)`` from
    manifest ``record_count`` sums and, with predicates, from partition +
    column stats, scanning only the files the stats cannot decide).

    Decision ladder, per partition then per file:

      1. partition key disproves a predicate (:func:`_part_pruned`) → 0 rows,
         nothing opened;
      2. partition key PROVES every predicate (:func:`_tok_proves_range`
         under the spec generation that wrote the key) → the manifest row
         count, nothing opened — with no predicates at all every partition
         takes this path and the whole call is one commit-log fold;
      3. file stats disprove (:func:`_file_pruned`) → 0 rows for that file;
      4. file stats PROVE every remaining predicate (min/max inside bounds
         + zero null count) and carry ``_rowcount`` → the stat's row count;
      5. otherwise the file is a BOUNDARY file: collected and counted in ONE
         residual scan with the real filter applied.

    At 100 TB this is the difference between a full-table scan per
    dashboard count and an O(manifest) metadata fold plus a scan of only
    the window-straddling edge files.

    Exactness guards (refusal-of-shortcut, never a wrong count): any pending
    merge-on-read tombstones — positional or equality — make manifest/stat
    row counts non-authoritative at file level, so the whole call falls
    back to ``read_table(...).where(pred).count()`` (which subtracts them);
    Iceberg likewise disables count pushdown while deletes pend.  ``version``
    counts as-of that snapshot; a fallback/boundary scan then re-checks
    byte-exactness the same way ``read_table`` does.

    ``audit`` (optional dict) is filled with how the count was decided:
    ``meta_rows``/``stats_rows``/``scan_rows``, ``pruned_parts``/``meta_parts``,
    ``pruned_files``/``stats_files``/``scanned_files``/``scanned_dirs``,
    ``fallback`` — tests pin "zero files opened" with it."""
    rng = _as_predicate_list(prune)
    eqs = _as_predicate_list(prune_eq)
    for pcol, lo, hi in rng:
        if lo is None and hi is None:
            raise ValueError(f"prune on {pcol!r} needs at least one bound")
    a = audit if audit is not None else {}
    a.update(
        meta_rows=0, stats_rows=0, scan_rows=0, pruned_parts=0, meta_parts=0,
        pruned_files=0, stats_files=0, scanned_files=0, scanned_dirs=0,
        fallback=False,
    )
    log = CommitLog(base)
    version = _resolve_tag(log, tag, version)
    parts = log.manifest(as_of=version).get(sink, {})
    if not parts:
        return 0
    if log.delete_files(as_of=version).get(sink) or log.eq_delete_files(
        as_of=version
    ).get(sink):
        a["fallback"] = True
        df = read_table(spark, base, sink, part_col, prune or None,
                        prune_eq or None, version)
        if df is None:
            return 0
        n = df.where(_predicate_condition(rng, eqs)).count()
        a["scan_rows"] = n
        return n
    schema_struct = None
    schema_json = log.schemas(as_of=version).get(sink)
    if schema_json is not None:
        from pyspark.sql.types import StructType

        schema_struct = StructType.fromJson(json.loads(schema_json))
    hist = log.spec_history(as_of=version).get(sink)
    total = 0
    scan_paths: list[str] = []
    scan_parts: dict[str, dict] = {}
    probes: dict[tuple[int, int], list[int]] = {}
    bcache: dict = {}
    for k in sorted(parts):
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        if (rng or eqs) and hist is not None and _part_pruned(
            spark, hist, schema_struct, k, prune, prune_eq, bcache
        ):
            a["pruned_parts"] += 1
            continue
        prng, peq = _part_proven(hist, schema_struct, k, rng, eqs)
        open_rng = [p for i, p in enumerate(rng) if i not in prng]
        open_eqs = [p for i, p in enumerate(eqs) if i not in peq]
        if not open_rng and not open_eqs:
            total += parts[k]["rows"]
            a["meta_rows"] += parts[k]["rows"]
            a["meta_parts"] += 1
            continue
        files = parts[k]["files"]
        if files is None:
            scan_paths.append(pdir)
            scan_parts[k] = parts[k]
            a["scanned_dirs"] += 1
            continue
        stats = parts[k].get("stats", {})
        for f in files:
            fst = stats.get(f, {})
            if _file_pruned(spark, fst, open_rng or None, open_eqs or None, probes):
                a["pruned_files"] += 1
                continue
            if "_rowcount" in fst and all(
                _file_proves_range(fst, pcol, lo, hi) for pcol, lo, hi in open_rng
            ) and all(
                _file_proves_range(fst, ecol, val, val) for ecol, val in open_eqs
            ):
                total += fst["_rowcount"]
                a["stats_rows"] += fst["_rowcount"]
                a["stats_files"] += 1
            else:
                scan_paths.append(os.path.join(pdir, f))
                scan_parts[k] = parts[k]
                a["scanned_files"] += 1
    if scan_paths:
        if version is not None:
            _check_time_travelable(log, base, sink, part_col, scan_parts, version)
        reader = spark.read.option("basePath", os.path.join(base, sink))
        if schema_struct is not None:
            reader = reader.schema(schema_struct)
        n = reader.parquet(*scan_paths).where(_predicate_condition(rng, eqs)).count()
        a["scan_rows"] = n
        total += n
    return total


def _sink_reader(spark: SparkSession, log: CommitLog, base: str, sink: str):
    """Parquet reader for a sink's data files with the recorded table schema
    applied (when one exists) — so maintenance/row ops see the SAME evolved
    view as ``read_table``: files predating an added column yield NULLs,
    dropped columns stay invisible, and rewrites re-materialize files under
    the current schema."""
    reader = spark.read.option("basePath", os.path.join(base, sink))
    schema_json = log.schemas().get(sink)
    if schema_json is not None:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
    return reader


def _pos_key_cols():
    """The positional-delete join key, computed JVM-side from the scan's
    ``_metadata`` struct: ``__tf_file`` is the last TWO path elements
    (``part=key/filename`` — file basenames alone are NOT unique across
    partitions: ``_stage_and_move`` numbers outputs per partition dir), and
    ``__tf_pos`` is the parquet row index.  Both sides of the anti-join
    derive the key from ``_metadata.file_path`` the same way, so encoding
    quirks cancel out."""
    parts = F.split(F.col("_metadata.file_path"), "/")
    return [
        F.concat_ws("/", F.element_at(parts, -2), F.element_at(parts, -1)).alias(
            "__tf_file"
        ),
        F.col("_metadata.row_index").alias("__tf_pos"),
    ]


def _eq_join(
    spark: SparkSession,
    keyed: DataFrame,
    base: str,
    sink: str,
    eq: list[dict],
    log: CommitLog,
    part_col: str,
    version: int | None,
    how: str,
) -> DataFrame:
    """The equality-tombstone join against a scan that already carries
    ``__tf_file``: anti (read path — keep survivors) or semi (materialize —
    count matches).  Implements Iceberg's sequence-number rule: a tombstone
    committed at version v only deletes rows from files ADDED before v
    (row add-versions come from a broadcast join against the
    manifest-derived file→version map — the manifest is driver-resident in
    this shim by design, same as Iceberg's planning metadata; files without
    an entry, i.e. dir-mode ⇒ newer than every pending tombstone, get
    +infinity), so re-inserted keys survive.  The tombstone side is NOT
    force-broadcast — key volume is unbounded, AQE sizes it.  NULL key
    values never match (SQL equality), mirroring the NULL-predicate rule of
    ``delete_where``."""
    key_cols = eq[0]["key_cols"]
    ddir = os.path.join(base, sink, "_deletes")
    tomb = None
    for e in eq:
        t = (
            spark.read.parquet(os.path.join(ddir, e["name"]))
            .select(
                *[F.col(k).alias(f"__tf_k{i}") for i, k in enumerate(key_cols)]
            )
            .withColumn("__tf_v", F.lit(int(e["version"])))
        )
        tomb = t if tomb is None else tomb.unionByName(t)
    fv = log.file_versions(as_of=version).get(sink, {})
    fv_rows = [(f"{part_col}={k}", int(v)) for k, v in fv.items()]
    fv_df = spark.createDataFrame(fv_rows, "__tf_file string, __tf_addv long")
    keyed = keyed.join(F.broadcast(fv_df), "__tf_file", "left").withColumn(
        "__tf_addv", F.coalesce("__tf_addv", F.lit(1 << 62))
    )
    cond = F.col("__tf_v") > F.col("__tf_addv")
    for i, k in enumerate(key_cols):
        cond = cond & (F.col(k) == F.col(f"__tf_k{i}"))
    return keyed.join(tomb, on=cond, how=how)


def _require_no_pending_deletes(log: CommitLog, sink: str, op: str) -> None:
    """COW rewrites (compact/delete/merge) re-materialize files under NEW
    names, which would orphan the positional tombstones pointing at the old
    (file, row_index) pairs and re-stamp surviving rows' files with a NEW
    add-version (letting them dodge pending equality tombstones) —
    silently resurrecting deleted rows either way.  Refuse instead: the
    caller runs :func:`materialize_deletes` first."""
    pending = log.delete_files().get(sink) or []
    pending_eq = log.eq_delete_files().get(sink) or []
    if pending or pending_eq:
        raise ValueError(
            f"{op} on {sink!r} refused: {len(pending)} positional + "
            f"{len(pending_eq)} equality pending merge-on-read delete file(s) "
            "reference current data files; run materialize_deletes() first "
            "(rewrites would orphan the tombstones and resurrect deleted rows)"
        )


def _manifest_paths(log: CommitLog, base: str, sink: str, part_col: str) -> list[str]:
    parts = log.manifest().get(sink, {})
    paths = []
    for k in sorted(parts):
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        for f in parts[k]["files"] or ():
            paths.append(os.path.join(pdir, f))
    return paths


def _split_file_path(path: str, part_col: str) -> tuple[str, str]:
    from urllib.parse import unquote

    marker = f"/{part_col}="
    tail = unquote(path)[unquote(path).rindex(marker) + len(marker):]
    part, fname = tail.split("/", 1)
    return part, fname


def _bloom_hash_cols(col: str, hashes: int, bits: int):
    """The shared build/probe hash family: ``xxhash64(cast(col as string),
    seed_i) mod bits``.  String cast makes the hash type-stable between the
    build side (a column) and the probe side (a Python literal)."""
    return [
        F.pmod(F.xxhash64(F.col(col).cast("string"), F.lit(i)), F.lit(bits)).alias(f"_p{i}")
        for i in range(hashes)
    ]


def collect_file_blooms(
    spark: SparkSession,
    base: str,
    sink: str,
    column: str,
    part_col: str = PART_COL,
    bits: int = 1 << 17,
    hashes: int = 2,
) -> dict[str, dict[str, dict]]:
    """Per-FILE Bloom filter over ``column`` — the Iceberg/parquet
    bloom-filter analog for EQUALITY skipping, complementing
    :func:`collect_file_stats`' min/max (which only prunes ranges and is
    useless for point lookups on a column the files are not clustered by,
    e.g. "fetch this url's rows").

    Build: hash positions are computed JVM-side (:func:`_bloom_hash_cols` —
    ``xxhash64`` is codegen), then ONE ``applyInPandas`` per file-group ORs
    them into a numpy bitmap (vectorized, no per-row Python).  The bitmap
    is stored zlib+base64 in the same ``stats`` snapshot as min/max (fold
    merges per file, so both collections compose).  With the defaults
    (m=131072 bits, k=2) a 16k-row file false-positives at ~2 %; the filter
    is ~16 KB/file before zlib.  NULLs hash to a fixed position (equality
    with NULL is never true, so this costs one spurious bit, not
    soundness).

    Probe side is :func:`read_table` ``prune_eq=(col, value)``; equality is
    on the STRING form of the column (documented cast above).

    Sizing for MULTI-key probes (:func:`merge_upsert` candidate narrowing):
    a file survives if ANY update key maybe-matches, so the per-key FP rate
    must be ≪ 1/(n_keys × n_files) — the defaults (~2 %) keep every file
    for a 1000-key merge.  Collect with e.g. ``bits=1<<20, hashes=4``
    (~1e-5 per key at 16k rows → ~1 % false-keep per file for 1000 keys);
    the bitmap zlib-compresses well below its 128 KB raw size."""
    import base64

    log = CommitLog(base)
    pin_files(base, sink, part_col)
    paths = _manifest_paths(log, base, sink, part_col)
    if not paths:
        return {}
    df = (
        _sink_reader(spark, log, base, sink)
        .parquet(*paths)
        .select(F.input_file_name().alias("_f"), *_bloom_hash_cols(column, hashes, bits))
    )

    def build(pdf):
        import numpy as np
        import pandas as pd
        import zlib as _z

        bitmap = np.zeros(bits // 8, dtype=np.uint8)
        for i in range(hashes):
            pos = pdf[f"_p{i}"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bitmap, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
        b64 = base64.b64encode(_z.compress(bitmap.tobytes(), 6)).decode("ascii")
        return pd.DataFrame({"_f": [pdf["_f"].iloc[0]], "bloom": [b64]})

    rows = df.groupBy("_f").applyInPandas(build, "_f string, bloom string").collect()
    out: dict[str, dict[str, dict]] = {}
    for r in rows:
        part, fname = _split_file_path(r["_f"], part_col)
        out.setdefault(part, {})[fname] = {
            f"_bloom:{column}": {"b64": r["bloom"], "m": bits, "k": hashes}
        }
    if out:
        log.commit({"operation": "stats", "sinks": {sink: {"stats": out}}})
    return out


def _bloom_probe_positions(spark: SparkSession, value, bits: int, hashes: int) -> list[int]:
    """Hash the probe value with the SAME JVM expression family the build
    used — one 1-row job, so build/probe can never drift (reimplementing
    xxhash64 driver-side could)."""
    row = (
        spark.range(1)
        .select(
            *[
                F.pmod(F.xxhash64(F.lit(str(value)), F.lit(i)), F.lit(bits)).alias(f"_p{i}")
                for i in range(hashes)
            ]
        )
        .collect()[0]
    )
    return [int(row[f"_p{i}"]) for i in range(hashes)]


def _bloom_maybe_contains(b64: str, positions: list[int]) -> bool:
    import base64
    import zlib as _z

    bitmap = _z.decompress(base64.b64decode(b64))
    return all(bitmap[p // 8] & (1 << (p % 8)) for p in positions)


def _data_files(pdir: str) -> list[str]:
    """Parquet data files in a partition dir (committer sidecars excluded)."""
    try:
        names = os.listdir(pdir)
    except FileNotFoundError:
        return []
    return sorted(
        n for n in names if n.endswith(".parquet") and not n.startswith((".", "_"))
    )


def pin_files(base: str, sink: str, part_col: str = PART_COL) -> dict[str, list[str]]:
    """Flip every dir-mode partition of ``sink`` to FILE-mode by recording
    its current data-file list in one metadata-only snapshot.

    This is the safety precondition for compaction: once a partition is
    file-mode, new files appearing in its directory are INVISIBLE until a
    rewrite snapshot references them — so a compactor can stage output into
    the live directory with no torn-read window.  Returns {part: files}
    newly pinned (empty dict → no snapshot written).
    """
    log = CommitLog(base)
    parts = log.manifest().get(sink, {})
    pinned = {
        part: _data_files(os.path.join(base, sink, f"{part_col}={part}"))
        for part, info in parts.items()
        if info["files"] is None
    }
    pinned = {p: fl for p, fl in pinned.items() if fl}
    if pinned:
        log.commit({"operation": "pin", "sinks": {sink: {"files": pinned}}})
    return pinned


def _order_proxy(df: DataFrame, col: str):
    """Order-preserving numeric proxy for any stats-capable column type —
    the per-column input to the Z-value.  Monotone non-strict (``a <= b``
    implies ``proxy(a) <= proxy(b)``), entirely JVM-side:

      * numerics/booleans cast to double;
      * timestamps/dates via ``unix_micros``/``unix_date``;
      * strings via their first-7-UTF-8-bytes as an integer (``hex`` →
        14 hex digits right-padded with '0' → ``conv`` base 16→10) —
        byte-prefix order is string order, and 2^56 < 2^63 so the value
        is exact in a long (double rounding on top stays monotone).
    """
    from pyspark.sql import types as T

    c = F.col(col)
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dt, T.DateType):
        return F.unix_date(c).cast("double")
    if isinstance(dt, T.StringType):
        return F.conv(F.rpad(F.substring(F.hex(c), 1, 14), 14, "0"), 16, 10).cast(
            "double"
        )
    if isinstance(dt, T.BooleanType):
        return c.cast("int").cast("double")
    return c.cast("double")


def zorder_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key over ``cols`` — the Iceberg/Delta Z-ORDER
    rewrite primitive.  Returns ``df`` with an appended ``__tf_zv`` long.

    Each column is quantile-coded into ``2**bits`` buckets (one
    ``percentile_approx`` aggregate over the order proxies — no sampling
    collect loops, no global window), then the per-column codes are
    bit-interleaved so that sorting by the single Z value co-locates rows
    that are close in EVERY dimension.  Files cut from that order carry
    narrow min/max on EACH clustered column, so
    ``collect_file_stats`` + ``read_table(prune=[...])`` skip on any of
    them — the multi-dimension layout a linear sort cannot give (sorting
    by ``a`` randomizes ``b`` within every file).

    Quantile coding (not min/max scaling) makes the interleave skew-proof:
    a hot key range still spreads over its code range.  NULLs code to 0
    (they sort first, same as Spark's default NULLS FIRST).
    """
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder bits*cols = {bits * len(cols)} exceeds a long (63 bits)"
        )
    proxies = [_order_proxy(df, c) for c in cols]
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    row = df.agg(
        *[
            F.percentile_approx(p, F.array(*[F.lit(q) for q in probs]), F.lit(10_000)).alias(f"_c{i}")
            for i, p in enumerate(proxies)
        ]
    ).first()
    # materialize each proxy as a real column BEFORE the per-cut fold: a
    # HOF lambda re-evaluates closed-over expression trees once per
    # ELEMENT (2^bits - 1 cuts), so an inline proxy (hex/conv for strings)
    # would run 255× per row; an attribute reference is O(1)
    staged = df.select(
        "*", *[p.alias(f"__tf_zp{i}") for i, p in enumerate(proxies)]
    )
    codes = []
    for i in range(len(cols)):
        p = F.col(f"__tf_zp{i}")
        cuts = sorted({float(x) for x in (row[f"_c{i}"] or ()) if x is not None})
        if not cuts:
            codes.append(F.lit(0))
            continue
        arr = F.array(*[F.lit(c) for c in cuts])
        codes.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, cut: acc + F.when(p >= cut, 1).otherwise(0),
            )
        )
    # same rule for the codes: the interleave reads each one `bits` times,
    # so keep them as columns rather than repeating the fold tree per bit
    staged = staged.select(
        "*", *[code.cast("long").alias(f"__tf_zc{i}") for i, code in enumerate(codes)]
    )
    k = len(cols)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(len(cols)):
            z = z + F.shiftleft(
                F.shiftright(F.col(f"__tf_zc{i}"), j).bitwiseAND(F.lit(1)), j * k + i
            )
    return staged.withColumn("__tf_zv", z).drop(
        *[f"__tf_zp{i}" for i in range(len(cols))],
        *[f"__tf_zc{i}" for i in range(len(cols))],
    )


def compact_table(
    spark: SparkSession,
    base: str,
    sink: str,
    part_col: str = PART_COL,
    max_files: int = 4,
    target_files: int = 1,
    cluster_by: str | list[str] | None = None,
) -> dict[str, dict]:
    """Iceberg ``rewrite_data_files`` analog: merge small files per partition.

    ``cluster_by`` turns the rewrite into Iceberg's sort-order rewrite:
    output files are range-partitioned and sorted on that column, so each
    file covers a narrow value interval — which is what makes
    :func:`collect_file_stats` + ``read_table(prune=...)`` file skipping
    actually selective (stats on randomly-laid-out files span everything
    and prune nothing).  A LIST of columns is Iceberg/Delta's Z-ORDER
    rewrite (:func:`zorder_column`): files are cut from the interleaved
    Morton order, so min/max stay narrow on EVERY listed column and a
    range predicate on ANY of them skips files — a linear sort serves
    only its own column.

    The small-files problem is the canonical 100 TB log-table failure mode —
    a streaming/multi-task writer leaves hundreds of KB-scale parquet files
    per partition and scan cost becomes per-FILE, not per-byte.  Protocol,
    crash-safe at every step:

      1. ``pin_files`` (metadata-only) — partitions become file-mode, so
         staged output is invisible by default;
      2. per oversized partition: read EXACTLY the manifest files →
         ``repartition(target_files)`` → write to a staging dir → move the
         outputs into the live partition dir under a versioned ``rw{v}-``
         prefix (same-filesystem rename; an object store would PUT —
         either way the files are dark until referenced);
      3. ONE ``rewrite`` snapshot atomically swaps every compacted
         partition's file list.  Crash before it: readers unchanged, the
         staged files are orphans (``vacuum_table`` removes them).  Crash
         after it: the OLD files are the orphans — same remedy.

    Rewrites never change rows (asserted per partition before commit).
    Returns {part: {"before": n_files, "after": n_files}} for compacted
    partitions.
    """
    log = CommitLog(base)
    _require_no_pending_deletes(log, sink, "compact_table")
    pin_files(base, sink, part_col)
    parts = log.manifest().get(sink, {})
    version = log.current_version() + 1
    new_lists: dict[str, list[str]] = {}
    stats: dict[str, dict] = {}
    for part in sorted(parts):
        files = parts[part]["files"]
        if files is None or len(files) <= max_files:
            continue
        pdir = os.path.join(base, sink, f"{part_col}={part}")
        src = [os.path.join(pdir, f) for f in files]
        df = _sink_reader(spark, log, base, sink).parquet(*src)
        n_before = df.count()
        stage = tempfile.mkdtemp(dir=base, prefix=f"_compact_{sink}_")
        out_dir = os.path.join(stage, "out")
        body = df.drop(part_col)
        cluster = [cluster_by] if isinstance(cluster_by, str) else cluster_by
        if not cluster:
            body = body.repartition(target_files)
        elif len(cluster) == 1:
            body = body.repartitionByRange(
                target_files, F.col(cluster[0])
            ).sortWithinPartitions(cluster[0])
        else:
            body = (
                zorder_column(body, cluster)
                .repartitionByRange(target_files, F.col("__tf_zv"))
                .sortWithinPartitions("__tf_zv")
                .drop("__tf_zv")
            )
        body.write.parquet(out_dir)
        moved = []
        for i, name in enumerate(_data_files(out_dir)):
            dst = f"rw{version}-{i:05d}.parquet"
            os.rename(os.path.join(out_dir, name), os.path.join(pdir, dst))
            moved.append(dst)
        _rmtree(stage)
        n_after = (
            _sink_reader(spark, log, base, sink)
            .parquet(*[os.path.join(pdir, f) for f in moved])
            .count()
        )
        if n_after != n_before:
            raise RuntimeError(
                f"compaction of {sink}/{part} would change row count "
                f"({n_before} → {n_after}); aborting before commit"
            )
        new_lists[part] = moved
        stats[part] = {"before": len(files), "after": len(moved)}
    if new_lists:
        log.commit({"operation": "rewrite", "sinks": {sink: {"files": new_lists}}})
    return stats


def vacuum_table(
    base: str, sink: str, part_col: str = PART_COL, staging_grace_s: float = 3600.0
) -> list[str]:
    """Delete files invisible to the current snapshot: data files not in a
    FILE-mode partition's manifest (pre-crash staging or post-rewrite
    originals) and leftover compaction staging dirs.  Dir-mode partitions
    are untouched (every file there IS the table).  Returns deleted paths.

    Concurrency contract: data files named in a committed manifest are never
    touched, but ``_compact_{sink}_*`` staging dirs belong to an IN-FLIGHT
    ``compact_table`` until it commits — so this assumes a SINGLE maintenance
    writer per sink (Iceberg makes the same assumption for its
    ``remove_orphan_files``).  As a belt-and-braces guard for an overlapping
    compactor, staging dirs younger than ``staging_grace_s`` seconds (by
    mtime; default 1 h, far beyond one compaction's stage→move window) are
    skipped; pass ``0`` to force-clean after a known crash."""
    log = CommitLog(base)
    deleted = []
    # TAG RETENTION (Iceberg remove_orphan_files keeps anything a retained
    # ref still references): files and tombstones named by any tagged
    # version's manifest are live, even when the current manifest dropped
    # them — reclaiming them is what delete_tag is for
    tag_files: dict[str, set[str]] = {}
    tag_tombs: set[str] = set()
    for _name, tv in log.tags().items():
        try:
            st = log.manifest(as_of=tv).get(sink, {})
        except ValueError:
            continue  # tag's history expired un-preserved (legacy log)
        for part, info in st.items():
            if info["files"]:
                tag_files.setdefault(part, set()).update(info["files"])
        tag_tombs |= set(log.delete_files(as_of=tv).get(sink) or ())
        tag_tombs |= {e["name"] for e in log.eq_delete_files(as_of=tv).get(sink) or ()}
    for part, info in log.manifest().get(sink, {}).items():
        if info["files"] is None:
            continue
        live = set(info["files"]) | tag_files.get(part, set())
        pdir = os.path.join(base, sink, f"{part_col}={part}")
        for name in _data_files(pdir):
            if name not in live:
                os.unlink(os.path.join(pdir, name))
                deleted.append(os.path.join(pdir, name))
    # tombstones (merge-on-read delete files) not in the current fold:
    # either orphans from a crashed delete (moved but never committed) or
    # history left behind by materialize_deletes — removing them ends time
    # travel to the MOR-era versions, same rule as for old data files
    ddir = os.path.join(base, sink, "_deletes")
    if os.path.isdir(ddir):
        live_tombs = set(log.delete_files().get(sink) or ()) | {
            e["name"] for e in log.eq_delete_files().get(sink) or ()
        } | tag_tombs
        for name in sorted(os.listdir(ddir)):
            if name not in live_tombs:
                os.unlink(os.path.join(ddir, name))
                deleted.append(os.path.join(ddir, name))
    now = time.time()
    for name in os.listdir(base):
        if name.startswith((f"_compact_{sink}_", f"_rowop_{sink}_")):
            path = os.path.join(base, name)
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue  # racing a concurrent cleanup — already gone
            if age < staging_grace_s:
                continue  # possibly an in-flight compact_table stage dir
            _rmtree(path)
            deleted.append(path)
    return deleted


def _self_contained_checkpoint(log: CommitLog, v: int) -> dict:
    """The full fold AS OF ``v`` as one checkpoint-snapshot dict — what makes
    a TAGGED version survive expiry on its own (Iceberg snapshots are
    self-contained manifest lists; this shim's are incremental, so
    preservation = materializing the fold)."""
    with open(os.path.join(log.dir, f"v{v}.json")) as fh:
        orig = json.load(fh)
    meta = {
        "version": v,
        "committed_at": orig.get("committed_at"),
        "operation": "checkpoint",
        "checkpointed_from": orig.get("operation", "append"),
        "state": log.manifest(as_of=v),
        "schemas": log.schemas(as_of=v),
        "specs": log.specs(as_of=v),
        "spec_history": log.spec_history(as_of=v),
        "delete_files": log.delete_files(as_of=v),
        "eq_delete_files": log.eq_delete_files(as_of=v),
        "file_versions": log.file_versions(as_of=v),
        "tags": log.tags(as_of=v),
    }
    if orig.get("run_id"):
        meta["run_id"] = orig["run_id"]
    return meta


def expire_snapshots(
    base: str, keep_history: bool = False, part_col: str = PART_COL
) -> int:
    """Iceberg ``expire_snapshots`` analog: consolidate the fold of all
    snapshots into ONE ``checkpoint`` snapshot, then drop the older metadata
    files.  Readers and resume logic are unaffected (the checkpoint IS the
    fold); what is lost is only per-run history — the reason to expire is
    that a long-lived table otherwise accretes one metadata file per run
    and every reader folds all of them.  Returns the number of metadata
    files removed.  ``keep_history=True`` writes the checkpoint but keeps
    the old files (audit mode).

    TAGGED versions (:func:`tag_snapshot`) are RETAINED, exactly Iceberg's
    tag-retention rule: each tagged version's metadata file is atomically
    rewritten as a SELF-CONTAINED checkpoint (the fold as of that version —
    fold-equivalent, so readers see no difference), and only untagged
    history is dropped.  Reads between a tag and the expiry checkpoint then
    REFUSE (the contiguity guard) rather than silently returning the tagged
    state.  A tag whose version is no longer byte-reconstructable (its
    dir-mode partitions were later overwritten, or files vacuumed) fails
    the expire with :class:`TimeTravelUnavailable` — delete the tag or pass
    ``keep_history=True`` instead; expiring it would commit metadata that
    promises an unreadable read."""
    log = CommitLog(base)
    state = log.manifest()
    if not state:
        return 0
    tags = log.tags()
    preserved: dict[int, dict] = {}
    if not keep_history:
        # keep_history keeps every metadata file, so no preservation (and no
        # new readability promise) is needed
        for v in sorted(set(tags.values())):
            # refuse now, not at read time: preservation must only promise
            # reads that still work
            for sink, parts in log.manifest(as_of=v).items():
                _check_time_travelable(log, base, sink, part_col, parts, v)
            preserved[v] = _self_contained_checkpoint(log, v)
    new_v = log.commit(
        {
            "operation": "checkpoint",
            "state": state,
            "schemas": log.schemas(),
            "specs": log.specs(),
            "spec_history": log.spec_history(),
            "delete_files": log.delete_files(),
            "eq_delete_files": log.eq_delete_files(),
            "file_versions": log.file_versions(),
            "tags": tags,
        }
    )
    removed = 0
    if not keep_history:
        for v, meta in preserved.items():
            # atomic in-place replace: fold-equivalent content, so a reader
            # racing the rewrite sees either version and the same answers
            fd, tmp = tempfile.mkstemp(dir=log.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as fh:
                json.dump(meta, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, os.path.join(log.dir, f"v{v}.json"))
        for v in log.versions():
            if v < new_v and v not in preserved:
                os.unlink(os.path.join(log.dir, f"v{v}.json"))
                removed += 1
    return removed


def rollback_table(base: str, to_version: int, part_col: str = PART_COL) -> int:
    """Iceberg ``rollback_to_snapshot`` analog: make the CURRENT table state
    equal the state as of ``to_version`` by committing a NEW checkpoint
    snapshot holding that version's manifest fold and schemas.  Roll-FORWARD
    semantics, exactly like Iceberg: history is preserved, so time travel to
    the rolled-back-away versions keeps working while their bytes survive,
    and a bad rollback is itself rollback-able.  Returns the new version.

    Purely a metadata operation — no data files move.  Files that only the
    rolled-back-away snapshots reference become invisible immediately and
    are physically reclaimed by the next :func:`vacuum_table` (whose "not in
    the current manifest" rule needs no rollback awareness).

    Raises ``ValueError`` when ``to_version`` is out of range or its
    metadata was dropped by ``expire_snapshots``, and
    :class:`TimeTravelUnavailable` when the state is no longer
    byte-reconstructable (same rules as ``read_table(version=...)``:
    a dir-mode partition touched by a later snapshot, or manifest files
    already vacuumed) — never a silently-wrong rollback."""
    log = CommitLog(base)
    cur = log.current_version()
    if not 1 <= to_version <= cur:
        raise ValueError(
            f"cannot roll back to v{to_version}: table is at v{cur}"
        )
    if to_version == cur:
        return cur
    state = log.manifest(as_of=to_version)
    schemas = log.schemas(as_of=to_version)
    for sink, parts in state.items():
        _check_time_travelable(log, base, sink, part_col, parts, to_version)
    return log.commit(
        {
            "operation": "checkpoint",
            "state": state,
            "schemas": schemas,
            "specs": log.specs(as_of=to_version),
            "spec_history": log.spec_history(as_of=to_version),
            "delete_files": log.delete_files(as_of=to_version),
            "eq_delete_files": log.eq_delete_files(as_of=to_version),
            "file_versions": log.file_versions(as_of=to_version),
            "rollback_of": to_version,
        }
    )


NULL_PART_KEY = "__HIVE_DEFAULT_PARTITION__"


def read_table_changes(
    spark: SparkSession,
    base: str,
    sink: str,
    from_version: int,
    to_version: int | None = None,
    part_col: str = PART_COL,
) -> DataFrame | None:
    """INCREMENTAL READ (Iceberg incremental append scan + changelog view
    analog): the rows the sink gained or lost in snapshots
    ``(from_version, to_version]``, as a changelog with ``_change_type``
    (``insert`` | ``delete``) and ``_commit_version`` columns — the
    "process only what's new since my last run" primitive a downstream
    pipeline needs so each refresh is O(delta), not O(table).

    Exactness contract — derived from snapshot metadata, never inferred:

      * appends     → inserts: the partition's rows as WRITTEN at that
        version (still-dir-mode partitions read whole — every row op pins
        first, so dir-mode at ``to`` means untouched; pinned partitions
        read the pin's recorded file list, immune to later compaction);
      * add_files / cdc_upsert → inserts: exactly the files added at that
        version (read from their original bytes, which rewrites keep on
        disk until vacuum);
      * delete_keys / cdc_upsert tombstones → deletes: the tombstoned key
        values (key columns populated, the rest NULL — equality deletes
        are written blind, there is no pre-image row to return);
      * pin / stats / evolve_spec / compaction / materialize_deletes →
        no logical change, skipped (materialize applies deletes already
        reported at their tombstone versions).

    Raises :class:`IncrementalUnavailable` instead of returning a wrong
    changelog when the window contains a rollback, expired history, a
    copy-on-write ``delete``/``merge`` or merge-on-read positional delete
    (pre-images are not key-addressable — Iceberg's incremental scan
    refuses these too), or when the needed bytes were vacuumed.  Returns
    None when the sink does not exist in the window.

    Replay rule: apply changes in ``_commit_version`` order; within one
    version, deletes apply BEFORE inserts (a ``cdc_upsert`` commits its
    tombstones and new rows in the same snapshot — upsert semantics)."""
    from pyspark.sql.types import StructType

    log = CommitLog(base)
    schema_json, file_inserts, dir_inserts, deletes = _plan_changes(
        log, base, sink, from_version, to_version, part_col
    )
    schema = (
        StructType.fromJson(json.loads(schema_json)) if schema_json else None
    )
    sink_dir = os.path.join(base, sink)

    def _reader():
        r = spark.read.option("basePath", sink_dir)
        return r.schema(schema) if schema is not None else r

    pieces = []
    for v in sorted(set(file_inserts) | set(dir_inserts)):
        paths = file_inserts.get(v, []) + dir_inserts.get(v, [])
        pieces.append(
            _reader()
            .parquet(*paths)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(v))
        )
    for v in sorted(deletes):
        key_cols, paths = deletes[v]
        t = spark.read.parquet(*paths).select(*key_cols)
        if schema is not None:
            for f in schema.fields:
                if f.name not in key_cols:
                    t = t.withColumn(f.name, F.lit(None).cast(f.dataType))
            t = t.select(*[f.name for f in schema.fields])
        pieces.append(
            t.withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_version", F.lit(v))
        )
    if not pieces:
        if schema is None:
            return None
        empty = _reader().parquet(sink_dir).where(F.lit(False))
        return (
            empty.withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0))
            .where(F.lit(False))
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _plan_changes(
    log: CommitLog,
    base: str,
    sink: str,
    from_version: int,
    to_version: int | None,
    part_col: str = PART_COL,
    skip_unreadable: bool = False,
) -> tuple[str | None, dict[int, list[str]], dict[int, list[str]], dict]:
    """Metadata-only planning half of :func:`read_table_changes`, shared with
    the streaming source (streaming/table_source.py): fold the snapshot
    window into ``(schema_json, file_inserts, dir_inserts, deletes)`` where
    ``file_inserts``/``dir_inserts`` map version → absolute parquet paths /
    partition dirs and ``deletes`` maps version → ``(key_cols, tombstone
    paths)``.  Performs ALL the exactness validation (window bounds, expiry
    gaps, rollbacks, non-changelog-able ops, vacuumed bytes) so every
    consumer inherits the refusal-not-wrong contract.  Never touches a
    SparkSession — safe to run on a bare driver thread, which is what the
    DataSource ``partitions()`` hook requires."""
    cur = log.current_version()
    to = cur if to_version is None else to_version
    if not 0 <= from_version <= to <= cur:
        raise ValueError(
            f"bad window ({from_version}, {to}] with current version {cur}"
        )
    if from_version:
        try:
            log.manifest(as_of=from_version)
        except ValueError as e:
            # expired history at the window START is the same logical
            # condition as a gap inside it — surface the documented
            # refusal type, not a bare ValueError, so consumers'
            # `except IncrementalUnavailable: full_refresh()` works for
            # both (and the streaming source fails with its contract type)
            raise IncrementalUnavailable(
                f"window start {from_version} precedes the earliest "
                f"readable snapshot — expired by expire_snapshots"
            ) from e
    snaps = [s for s in log.snapshots() if from_version < s["version"] <= to]
    if [s["version"] for s in snaps] != list(range(from_version + 1, to + 1)):
        raise IncrementalUnavailable(
            f"snapshot history gap in ({from_version}, {to}] — "
            "expired by expire_snapshots"
        )

    man_to = log.manifest(as_of=to).get(sink, {}) if to else {}
    schema_json = log.schemas(as_of=to).get(sink)
    sink_dir = os.path.join(base, sink)

    appended: dict[str, int] = {}  # part -> append version in window
    file_inserts: dict[int, list[str]] = {}  # version -> explicit paths
    deletes: dict[int, tuple[list[str], list[str]]] = {}  # v -> (key_cols, tomb paths)
    pinned_files: dict[str, list[str]] = {}  # part -> FIRST pin's file list

    for s in snaps:
        op = s.get("operation", "append")
        v = s["version"]
        if op == "checkpoint":
            if s.get("rollback_of") is not None:
                raise IncrementalUnavailable(
                    f"rollback at v{v} inside the window — state moved "
                    "backwards; changelog not derivable"
                )
            continue
        info = (s.get("sinks") or {}).get(sink)
        if info is None:
            continue
        if op == "append":
            for part in info.get("parts") or {}:
                appended[part] = v
        elif op in ("add_files", "cdc_upsert"):
            for part, files in (info.get("files") or {}).items():
                file_inserts.setdefault(v, []).extend(
                    os.path.join(sink_dir, f"{part_col}={part}", f) for f in files
                )
            if info.get("eq_delete_files"):
                deletes[v] = (
                    list(info["key_cols"]),
                    [
                        os.path.join(sink_dir, "_deletes", n)
                        for n in info["eq_delete_files"]
                    ],
                )
        elif op == "delete_eq":
            deletes[v] = (
                list(info["key_cols"]),
                [
                    os.path.join(sink_dir, "_deletes", n)
                    for n in info["eq_delete_files"]
                ],
            )
        elif op == "pin":
            for part, files in (info.get("files") or {}).items():
                pinned_files.setdefault(part, sorted(files))
        elif op in ("rewrite", "stats", "evolve_spec", "flagship_run"):
            continue  # logically row-preserving / metadata-only
        elif info.get("clear_deletes"):
            # materialize_deletes: applies tombstones ALREADY reported as
            # deletes at their own versions (equality) or refused at their
            # delete_mor version — no new logical change here
            continue
        else:  # delete, merge, delete_mor — pre-image not key-addressable
            if skip_unreadable:
                # Iceberg streaming-skip-delete-snapshots semantics: skip
                # the snapshot WHOLE (its row effects are absent from the
                # changelog) — the caller opted out of exactness here
                continue
            raise IncrementalUnavailable(
                f"{op} at v{v} inside the window: its pre-image rows are "
                "not derivable from metadata (use equality deletes / "
                "cdc_upsert for changelog-able mutations)"
            )

    # appends: the pin (if any, even past `to`) recorded the append's exact
    # output files; still-dir-mode partitions are untouched by construction
    if appended:
        for s in log.snapshots():
            if s["version"] <= to or s.get("operation") != "pin":
                continue
            for part, files in ((s.get("sinks") or {}).get(sink, {}).get("files") or {}).items():
                pinned_files.setdefault(part, sorted(files))
    dir_inserts: dict[int, list[str]] = {}  # version -> partition dirs
    for part, v in appended.items():
        if part not in man_to:  # rolled off before `to` — cannot happen
            continue            # without a refused op, but stay sound
        pdir = os.path.join(sink_dir, f"{part_col}={part}")
        if part in pinned_files:
            file_inserts.setdefault(v, []).extend(
                os.path.join(pdir, f) for f in pinned_files[part]
            )
        else:
            dir_inserts.setdefault(v, []).append(pdir)

    for v, paths in file_inserts.items():
        gone = [p for p in paths if not os.path.exists(p)]
        if gone:
            raise IncrementalUnavailable(
                f"data files of v{v} were vacuumed: {gone[:3]} — the "
                "changelog horizon is vacuum_table, like time travel"
            )
    for v, (_, paths) in deletes.items():
        gone = [p for p in paths if not os.path.exists(p)]
        if gone:
            raise IncrementalUnavailable(
                f"tombstone files of v{v} were vacuumed: {gone[:3]}"
            )
    return schema_json, file_inserts, dir_inserts, deletes


def inspect_table(
    spark: SparkSession, base: str, sink: str | None = None, kind: str = "snapshots"
) -> DataFrame:
    """Iceberg METADATA TABLES analog (``SELECT * FROM t.snapshots`` /
    ``t.partitions`` / ``t.files`` / Iceberg's specs+schemas metadata):
    expose the commit log's folds as queryable DataFrames, so operational
    questions ("what changed at v7?", "which partitions are file-mode?",
    "which files have stats/blooms?", "what spec wrote this partition?")
    are answered with the same DataFrame API as the data.

    Kinds (``sink`` required for all but ``snapshots``):

      * ``snapshots``  — one row per snapshot: version, committed_at,
        operation, run_id, the sinks it touched;
      * ``partitions`` — current manifest, one row per partition: rows,
        dir/file mode, file count, stats/bloom coverage, the spec
        GENERATION that wrote the key (NULL for flat/lineage keys);
      * ``files``      — one row per live data file: add version (data
        sequence number), per-column min/max stats, bloom presence;
      * ``specs``      — one row per spec generation with the transform
        list and whether it is current;
      * ``refs``       — one row per named TAG (:func:`tag_snapshot`):
        name, the version it pins, whether that is the current version
        (sink-independent, like ``snapshots``).

    Metadata only — never opens a data file.  Built driver-side, like every
    commit-log fold: the log is O(partitions + files) JSON, the same scale
    Iceberg manifests are; at 100 TB this is still a metadata read, not a
    table scan."""
    log = CommitLog(base)
    if kind == "snapshots":
        rows = [
            (
                int(s["version"]),
                float(s["committed_at"]) if s.get("committed_at") else None,
                s.get("operation", "append"),
                s.get("run_id"),
                sorted((s.get("sinks") or {}).keys()),
            )
            for s in log.snapshots()
        ]
        return spark.createDataFrame(
            rows,
            "version int, committed_at double, operation string, "
            "run_id string, sinks array<string>",
        )
    if kind == "refs":
        cur = log.current_version()
        rows = [
            (name, int(v), bool(v == cur))
            for name, v in sorted(log.tags().items())
        ]
        return spark.createDataFrame(
            rows, "name string, version int, at_current boolean"
        )
    if sink is None:
        raise ValueError(f"inspect_table kind={kind!r} needs a sink")
    if kind == "partitions":
        hist = log.spec_history().get(sink, [])
        rows = []
        for k, info in sorted(log.manifest().get(sink, {}).items()):
            resolved = _resolve_spec(hist, k)
            gen = None
            if resolved is not None:
                gen = hist.index(resolved[0])
            files = info.get("files")
            stats = info.get("stats") or {}
            rows.append(
                (
                    k,
                    int(info.get("rows", 0)),
                    files is not None,
                    len(files) if files is not None else None,
                    gen,
                    sum(1 for d in stats.values() if any(not x.startswith("_bloom:") for x in d)),
                    sum(1 for d in stats.values() if any(x.startswith("_bloom:") for x in d)),
                )
            )
        return spark.createDataFrame(
            rows,
            "part_key string, rows bigint, file_mode boolean, n_files int, "
            "spec_gen int, files_with_stats int, files_with_blooms int",
        )
    if kind == "files":
        vers = log.file_versions().get(sink, {})
        rows = []
        for k, info in sorted(log.manifest().get(sink, {}).items()):
            stats = info.get("stats") or {}
            for f in info.get("files") or ():
                d = stats.get(f, {})
                rows.append(
                    (
                        k,
                        f,
                        vers.get(f"{k}/{f}"),
                        json.dumps(
                            {c: v for c, v in d.items() if not c.startswith("_bloom:")},
                            default=_stat_key,
                        ),
                        any(c.startswith("_bloom:") for c in d),
                    )
                )
        return spark.createDataFrame(
            rows,
            "part_key string, file string, add_version int, "
            "stats string, has_bloom boolean",
        )
    if kind == "specs":
        hist = log.spec_history().get(sink, [])
        rows = [
            (g, json.dumps(sp) if sp is not None else None, g == len(hist) - 1)
            for g, sp in enumerate(hist)
        ]
        return spark.createDataFrame(
            rows, "generation int, spec string, is_current boolean"
        )
    raise ValueError(
        f"unknown inspect_table kind {kind!r} "
        "(snapshots | partitions | files | specs | refs)"
    )


def _stage_and_move(
    spark: SparkSession,
    df: DataFrame,
    base: str,
    sink: str,
    part_col: str,
    prefix: str,
    version: int,
) -> dict[str, list[str]]:
    """ONE partitioned write of ``df`` into a staging dir, then move each
    output file into its live partition dir under ``{prefix}{version}-``
    names.  The moved files are DARK — every touched partition is file-mode,
    so nothing is visible until a snapshot references them (crash ⇒ orphans,
    ``vacuum_table`` removes them).  Returns {part_key: [file names]}.

    The input is hash-repartitioned on ``part_col`` first (Iceberg's
    ``write.distribution-mode=hash``): without it every task opens a file
    in every partition it sees rows for — a 32-partition CDC batch written
    from 32 tasks emitted ~1000 tiny files per upsert (measured: the
    changelog read of one such batch spent 2.5 s listing footers), the
    small-files explosion that compounds per batch."""
    stage = tempfile.mkdtemp(dir=base, prefix=f"_rowop_{sink}_")
    out = os.path.join(stage, "out")
    moved: dict[str, list[str]] = {}
    try:
        df.repartition(F.col(part_col)).write.partitionBy(part_col).parquet(out)
        for entry in sorted(os.listdir(out)):
            if not entry.startswith(f"{part_col}="):
                continue
            part = entry[len(part_col) + 1:]
            odir = os.path.join(out, entry)
            pdir = os.path.join(base, sink, entry)
            os.makedirs(pdir, exist_ok=True)
            names = []
            for i, name in enumerate(_data_files(odir)):
                dst = f"{prefix}{version}-{i:05d}.parquet"
                os.rename(os.path.join(odir, name), os.path.join(pdir, dst))
                names.append(dst)
            if names:
                moved[part] = names
    finally:
        _rmtree(stage)
    return moved


def _candidate_files(
    spark: SparkSession,
    base: str,
    sink: str,
    parts: dict,
    part_col: str,
    prune: tuple | None,
    prune_eq: tuple | None,
    log: CommitLog | None = None,
) -> tuple[list[str], int]:
    """(kept candidate paths, total manifest files) under the SAME skip
    decisions ``read_table`` uses: hidden-partition pruning from the
    recorded spec (:func:`_part_pruned`, when ``log`` is given), then
    per-file stats (:func:`_file_pruned`)."""
    probes: dict[tuple[int, int], list[int]] = {}
    bcache: dict = {}
    spec = schema = None
    if log is not None and (prune is not None or prune_eq is not None):
        spec = log.spec_history().get(sink)
        schema_json = log.schemas().get(sink)
        if schema_json is not None:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(schema_json))
    cand: list[str] = []
    total = 0
    for k in sorted(parts):
        pdir = os.path.join(base, sink, f"{part_col}={k}")
        stats = parts[k].get("stats", {})
        files = parts[k]["files"] or ()
        total += len(files)
        if spec is not None and _part_pruned(
            spark, spec, schema, k, prune, prune_eq, bcache
        ):
            continue
        for f in files:
            if not _file_pruned(spark, stats.get(f, {}), prune, prune_eq, probes):
                cand.append(os.path.join(pdir, f))
    return cand, total


def delete_where(
    spark: SparkSession,
    base: str,
    sink: str,
    predicate,
    part_col: str = PART_COL,
    prune: tuple | None = None,
    prune_eq: tuple | None = None,
    mode: str = "copy-on-write",
) -> dict:
    """Row-level DELETE — the Iceberg ``DELETE FROM`` analog, in both of
    Iceberg's ``write.delete.mode`` flavors:

    ``mode="copy-on-write"`` (default) rewrites the dirty files minus the
    matching rows — reads stay a pure scan, the delete pays the rewrite.

    ``mode="merge-on-read"`` writes POSITIONAL TOMBSTONES (Iceberg v2 delete
    files): one scan finds matching ``(partition-dir/file, row_index)`` pairs,
    stages them as parquet under ``<sink>/_deletes/``, and ONE ``delete_mor``
    snapshot publishes them — no data file is touched, so a wide delete on a
    100 TB table costs O(matches written), not O(dirty files rewritten).
    Readers pay one anti-join until :func:`materialize_deletes` folds the
    tombstones into a real rewrite; COW rewrite ops (compact/delete/merge)
    on a sink with pending tombstones are refused until then, because
    rewritten files would orphan the positions and resurrect deleted rows.
    Repeated MOR deletes compose: the match scan reads THROUGH existing
    tombstones, so already-deleted rows are never matched (or double-counted)
    again.

    Protocol (crash-safe at every step, same shape as :func:`compact_table`):

      1. ``pin_files`` — all partitions file-mode, staged output invisible;
      2. candidate selection: ``prune``/``prune_eq`` apply the SAME min/max +
         Bloom file skipping as ``read_table`` (via :func:`_file_pruned`), so
         a clustered table deletes a narrow window by rewriting only the few
         files that can contain it — at 100 TB this is the whole point of
         row-level ops on a table format: touch O(matching files), not O(table);
      3. ONE distributed pass finds the DIRTY files (``input_file_name()``
         grouped match counts) — files proven clean are never rewritten;
      4. dirty files are re-read, surviving rows (``NOT predicate``, with
         NULL-predicate rows surviving, per SQL DELETE semantics) are staged
         in ONE partitioned write and moved dark under ``dl{v}-`` names;
      5. row-count invariant asserted (kept == dirty − matched), then ONE
         ``delete`` snapshot atomically swaps file lists + row counts.

    ``predicate`` is a ``Column`` or SQL string.  Returns
    ``{"deleted", "files_rewritten", "files_scanned", "files_total"}``
    (merge-on-read adds ``"delete_files"``).
    Single-maintenance-writer assumption, as for ``compact_table``."""
    if mode not in ("copy-on-write", "merge-on-read"):
        raise ValueError(f"mode must be copy-on-write | merge-on-read, got {mode!r}")
    log = CommitLog(base)
    if mode == "copy-on-write":
        _require_no_pending_deletes(log, sink, "copy-on-write delete_where")
    pin_files(base, sink, part_col)
    parts = log.manifest().get(sink, {})
    sdir = os.path.join(base, sink)
    out = {"deleted": 0, "files_rewritten": 0, "files_scanned": 0, "files_total": 0}
    if not parts:
        return out
    cand, out["files_total"] = _candidate_files(
        spark, base, sink, parts, part_col, prune, prune_eq, log=log
    )
    out["files_scanned"] = len(cand)
    if not cand:
        return out
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    hit = F.coalesce(pred, F.lit(False))
    reader = _sink_reader(spark, log, base, sink)
    if mode == "merge-on-read":
        return _delete_mor(spark, log, base, sink, reader, cand, hit, out, part_col)
    matches = (
        reader.parquet(*cand)
        .where(hit)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dirty: dict[str, dict[str, int]] = {}
    for r in matches:
        p, fn = _split_file_path(r["_f"], part_col)
        dirty.setdefault(p, {})[fn] = r["n"]
    if not dirty:
        return out
    n_matched = sum(sum(d.values()) for d in dirty.values())
    version = log.current_version() + 1
    dirty_paths = [
        os.path.join(sdir, f"{part_col}={p}", fn)
        for p in sorted(dirty)
        for fn in sorted(dirty[p])
    ]
    src = reader.parquet(*dirty_paths)
    n_dirty = src.count()
    moved = _stage_and_move(spark, src.where(~hit), base, sink, part_col, "dl", version)
    moved_paths = [
        os.path.join(sdir, f"{part_col}={p}", f) for p, fs in moved.items() for f in fs
    ]
    n_kept = reader.parquet(*moved_paths).count() if moved_paths else 0
    if n_kept != n_dirty - n_matched:
        raise RuntimeError(
            f"delete_where on {sink!r} would be lossy: kept {n_kept} rows from "
            f"{n_dirty} dirty-file rows with {n_matched} matches; aborting before commit"
        )
    new_files = {
        p: sorted([f for f in parts[p]["files"] if f not in dirty[p]] + moved.get(p, []))
        for p in dirty
    }
    new_rows = {p: parts[p]["rows"] - sum(dirty[p].values()) for p in dirty}
    log.commit(
        {"operation": "delete", "sinks": {sink: {"files": new_files, "rows": new_rows}}}
    )
    out["deleted"] = n_matched
    out["files_rewritten"] = len(dirty_paths)
    return out


def _delete_mor(
    spark: SparkSession,
    log: CommitLog,
    base: str,
    sink: str,
    reader,
    cand: list[str],
    hit,
    out: dict,
    part_col: str = PART_COL,
) -> dict:
    """merge-on-read branch of :func:`delete_where`: ONE scan of the
    candidate files (through any existing tombstones, so repeat deletes
    never re-match already-deleted rows) emits matching positions, staged
    as parquet then moved DARK into ``<sink>/_deletes/`` — invisible until
    the ``delete_mor`` snapshot publishes them (crash ⇒ orphan tombstones,
    ``vacuum_table`` removes them).  The ``repartition(8)`` shuffles only
    the matched KEYS (16-ish bytes each), keeping the scan fully parallel
    while bounding tombstone file count."""
    version = log.current_version() + 1
    ddir = os.path.join(base, sink, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    keyed = reader.parquet(*cand).select("*", *_pos_key_cols())
    existing = log.delete_files().get(sink)
    if existing:
        tomb = spark.read.parquet(
            *[os.path.join(ddir, n) for n in existing]
        ).select("__tf_file", "__tf_pos")
        keyed = keyed.join(tomb, ["__tf_file", "__tf_pos"], "left_anti")
    eq = log.eq_delete_files().get(sink)
    if eq:
        # rows already equality-deleted must not be re-tombstoned (their
        # row-count delta was, or will be, settled by those tombstones)
        keyed = _eq_join(
            spark, keyed, base, sink, eq, log, part_col, None, "left_anti"
        )
    stage = tempfile.mkdtemp(dir=base, prefix=f"_rowop_{sink}_")
    try:
        stage_out = os.path.join(stage, "out")
        keyed.where(hit).select("__tf_file", "__tf_pos").repartition(8).write.parquet(
            stage_out
        )
        per_part = (
            spark.read.parquet(stage_out)
            .groupBy(F.split("__tf_file", "/")[0].alias("_pd"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n_matched = sum(r["n"] for r in per_part)
        if n_matched == 0:
            return out
        names = []
        for i, name in enumerate(_data_files(stage_out)):
            dst = f"mor{version}-{i:05d}.parquet"
            os.rename(os.path.join(stage_out, name), os.path.join(ddir, dst))
            names.append(dst)
    finally:
        _rmtree(stage)
    parts = log.manifest().get(sink, {})
    new_rows = {}
    for r in per_part:
        key = r["_pd"][len(part_col) + 1:]
        new_rows[key] = parts[key]["rows"] - r["n"]
    log.commit(
        {
            "operation": "delete_mor",
            "sinks": {sink: {"delete_files": names, "rows": new_rows}},
        }
    )
    out["deleted"] = n_matched
    out["delete_files"] = len(names)
    return out


def _count_rows_per_part(
    spark: SparkSession, sdir: str, part_col: str, moved: dict[str, list[str]]
) -> dict[str, int]:
    """Row counts of freshly staged files, per partition, in ONE Spark job
    (grouping on the partition column the basePath reader derives) — never
    a job-per-partition driver loop, which turns a 10k-partition append
    into 10k scheduler round-trips."""
    paths = [
        os.path.join(sdir, f"{part_col}={p}", f)
        for p, fs in moved.items()
        for f in fs
    ]
    counts = (
        spark.read.option("basePath", sdir)
        .parquet(*paths)
        .groupBy(F.col(part_col).cast("string").alias("_p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = {(r["_p"] if r["_p"] is not None else NULL_PART_KEY): r["n"] for r in counts}
    # partitions whose staged files are all empty still need a zero entry
    for p in moved:
        out.setdefault(p, 0)
    return out


def _apply_sink_spec(
    log: CommitLog, sink: str, df: DataFrame, part_col: str
) -> DataFrame:
    """For HIDDEN-PARTITIONED sinks, derive the partition key from the DATA
    under the sink's CURRENT spec generation — never trust a caller-provided
    key.  A row keyed into the wrong partition would be invisible to spec
    pruning (``_part_pruned`` proves absence from the KEY alone), turning
    the superset guarantee into silently wrong query results — the one
    failure mode pruning must never have.  Flat sinks pass through
    unchanged: the caller's lineage key IS the layout there."""
    hist = log.spec_history().get(sink)
    if not hist or hist[-1] is None:
        return df
    if part_col in df.columns:
        df = df.drop(part_col)
    return df.withColumn(
        part_col, partition_key_expr(df, hist[-1], gen=len(hist) - 1)
    )


def add_files(
    spark: SparkSession,
    base: str,
    sink: str,
    df: DataFrame,
    part_col: str = PART_COL,
) -> dict[str, int]:
    """FILE-level append — Iceberg's normal ``append``: add data files to
    existing partitions without rewriting anything, the primitive
    ``write_multi_sink``'s partition-level exactly-once model deliberately
    lacks (there, a committed partition is immutable and reruns skip it).
    Together with :func:`delete_keys` this is the streaming-CDC upsert:
    delete the changed keys blind, append their new rows — zero table scans
    per batch.

    Protocol: ``pin_files`` first (all partitions file-mode, so staged files
    are invisible), ONE partitioned write staged dark under ``ad{v}-``
    names, then one ``add_files`` snapshot publishes them; its version is
    the files' ADD VERSION (:meth:`CommitLog.file_versions`), which is what
    lets these rows survive earlier equality tombstones.  Schema evolution
    rules apply as for ``write_multi_sink``.  Returns {part: rows added}."""
    log = CommitLog(base)
    pin_files(base, sink, part_col)
    df = _apply_sink_spec(log, sink, df, part_col)
    from pyspark.sql.types import StructType

    new_schema = StructType(
        [f for f in df.schema.fields if f.name != part_col]
    ).json()
    old = log.schemas().get(sink)
    if old is not None and old != new_schema:
        _check_schema_compat(old, new_schema, sink)
    version = log.current_version() + 1
    moved = _stage_and_move(spark, df, base, sink, part_col, "ad", version)
    if not moved:
        return {}
    sdir = os.path.join(base, sink)
    rows = _count_rows_per_part(spark, sdir, part_col, moved)
    log.commit(
        {
            "operation": "add_files",
            "sinks": {
                sink: {"files": moved, "rows": rows, "schema": new_schema}
            },
        }
    )
    return rows


def delete_keys(
    spark: SparkSession,
    base: str,
    sink: str,
    keys: DataFrame,
    key_cols: list[str] | None = None,
    part_col: str = PART_COL,
    n_files: int = 1,
) -> dict:
    """EQUALITY delete — Iceberg v2's second delete-file kind: tombstone by
    key VALUE, written completely blind — NO scan of the table, which is the
    property streaming CDC needs (a per-batch scan of a 100 TB table is not
    a thing).  The tombstones apply only to files whose ADD VERSION predates
    this commit, so a subsequent :func:`add_files` re-insert of the same key
    is NOT deleted — Iceberg's sequence-number rule.

    Costs deferred to reads (one anti-join with a version residual) and to
    :func:`materialize_deletes` (which turns the tombstones into a real
    rewrite and settles the row counts — until then ``committed()`` row
    counts are UPPER bounds for this sink, since counting matches would
    require the scan this op exists to avoid).  All pending equality
    tombstones of a sink must share ``key_cols``.  ``n_files`` sizes the
    tombstone write: 1 (default) is right for CDC batches — one file per
    batch keeps the readers' union small; raise it for a BULK key delete
    (millions of keys) so the post-distinct write isn't single-task.
    Returns {"delete_files": n, "key_cols": [...]}."""
    key_cols = list(key_cols or keys.columns)
    missing = [k for k in key_cols if k not in keys.columns]
    if missing:
        raise ValueError(f"key columns {missing} not in keys DataFrame")
    for e in CommitLog(base).eq_delete_files().get(sink) or ():
        if e["key_cols"] != key_cols:
            raise ValueError(
                f"pending equality deletes on {sink!r} use key_cols "
                f"{e['key_cols']}; run materialize_deletes() before switching "
                f"to {key_cols}"
            )
    log = CommitLog(base)
    pin_files(base, sink, part_col)
    version = log.current_version() + 1
    ddir = os.path.join(base, sink, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    stage = tempfile.mkdtemp(dir=base, prefix=f"_rowop_{sink}_")
    try:
        stage_out = os.path.join(stage, "out")
        keys.select(*key_cols).distinct().coalesce(n_files).write.parquet(stage_out)
        names = []
        for i, name in enumerate(_data_files(stage_out)):
            dst = f"eq{version}-{i:05d}.parquet"
            os.rename(os.path.join(stage_out, name), os.path.join(ddir, dst))
            names.append(dst)
    finally:
        _rmtree(stage)
    log.commit(
        {
            "operation": "delete_eq",
            "sinks": {sink: {"eq_delete_files": names, "key_cols": key_cols}},
        }
    )
    return {"delete_files": len(names), "key_cols": key_cols}


def upsert_keys(
    spark: SparkSession,
    base: str,
    sink: str,
    updates: DataFrame,
    key_cols: list[str],
    part_col: str = PART_COL,
    run_id: str | None = None,
) -> dict:
    """Scan-free CDC UPSERT in ONE atomic snapshot — the Iceberg v2
    streaming-writer shape: equality tombstones for the batch's keys plus
    the batch's data files, committed together (op ``cdc_upsert``), so
    readers can never observe the delete without the insert or vice versa.
    The tombstone's version equals the new files' add version and the
    sequence rule is STRICTLY-older (``tomb.v > addv``), so the batch's own
    rows survive their own tombstones while every older version of the keys
    dies.  Nothing reads the table: per-batch cost is O(batch), the property
    that makes per-second micro-batch upserts into a 100 TB table viable
    (contrast ``merge_upsert``, which scans candidate files per call).

    ``run_id`` makes retries idempotent for exactly-once foreachBatch
    delivery: if a ``cdc_upsert`` snapshot with this run_id is already
    committed, the call is a no-op (the crashed attempt's staged files are
    orphans for ``vacuum_table``).  Returns {"skipped": True} in that case,
    else {"deleted_keys": n, "rows": {part: added}}."""
    if run_id is not None:
        for snap in CommitLog(base).snapshots():
            if (
                snap.get("operation") == "cdc_upsert"
                and snap.get("run_id") == run_id
                and sink in (snap.get("sinks") or {})
            ):
                return {"skipped": True}
    missing = [k for k in key_cols if k not in updates.columns]
    if missing:
        raise ValueError(f"key columns {missing} not in updates DataFrame")
    log = CommitLog(base)
    for e in log.eq_delete_files().get(sink) or ():
        if e["key_cols"] != list(key_cols):
            raise ValueError(
                f"pending equality deletes on {sink!r} use key_cols "
                f"{e['key_cols']}; run materialize_deletes() before switching "
                f"to {list(key_cols)}"
            )
    pin_files(base, sink, part_col)
    updates = _apply_sink_spec(log, sink, updates, part_col)
    from pyspark.sql.types import StructType

    new_schema = StructType(
        [f for f in updates.schema.fields if f.name != part_col]
    ).json()
    old = log.schemas().get(sink)
    if old is not None and old != new_schema:
        _check_schema_compat(old, new_schema, sink)
    version = log.current_version() + 1
    sdir = os.path.join(base, sink)
    ddir = os.path.join(sdir, "_deletes")
    os.makedirs(ddir, exist_ok=True)
    # persist: the batch is evaluated for BOTH the tombstone-key write and
    # the data write — a nondeterministic plan (rand() sampling, AQE-bound
    # limit) computed twice could tombstone keys it doesn't write (row loss)
    # or write rows it doesn't tombstone (duplicates); same guard as
    # merge_upsert
    updates = updates.persist()
    try:
        # keys staged first (updates may be lazily computed; both writes must
        # land dark before the single commit)
        stage = tempfile.mkdtemp(dir=base, prefix=f"_rowop_{sink}_")
        try:
            stage_out = os.path.join(stage, "out")
            keys = updates.select(*key_cols).distinct()
            keys.coalesce(1).write.parquet(stage_out)
            names = []
            for i, name in enumerate(_data_files(stage_out)):
                dst = f"eq{version}-{i:05d}.parquet"
                os.rename(os.path.join(stage_out, name), os.path.join(ddir, dst))
                names.append(dst)
        finally:
            _rmtree(stage)
        moved = _stage_and_move(spark, updates, base, sink, part_col, "cd", version)
    finally:
        updates.unpersist()
    rows = _count_rows_per_part(spark, sdir, part_col, moved)
    meta = {
        "operation": "cdc_upsert",
        "sinks": {
            sink: {
                "eq_delete_files": names,
                "key_cols": list(key_cols),
                "files": moved,
                "rows": rows,
                "schema": new_schema,
            }
        },
    }
    if run_id is not None:
        meta["run_id"] = run_id
    log.commit(meta)
    return {"deleted_keys": len(names), "rows": rows}


def materialize_deletes(
    spark: SparkSession, base: str, sink: str, part_col: str = PART_COL
) -> dict:
    """Fold a sink's pending merge-on-read tombstones — positional AND
    equality — into a real copy-on-write rewrite: Iceberg's
    ``rewrite_position_delete_files`` + data-file rewrite rolled into one.
    Only files actually holding tombstoned rows are rewritten (equality
    matches are located with ONE scan of the add-version-applicable files,
    read through the positional tombstones so nothing counts twice; clean
    files untouched).  ONE ``delete`` snapshot swaps the file lists, settles
    the row counts equality deletes deferred (positional ones moved theirs
    at delete time), AND clears both tombstone lists (``clear_deletes``), so
    readers drop the anti-joins atomically.  The old data files and
    tombstones stay dark on disk for time travel until ``vacuum_table``.
    Returns {"applied", "files_rewritten", "delete_files_cleared"}."""
    log = CommitLog(base)
    tombs = log.delete_files().get(sink) or []
    eq = log.eq_delete_files().get(sink) or []
    out = {
        "applied": 0,
        "files_rewritten": 0,
        "delete_files_cleared": len(tombs) + len(eq),
    }
    if not tombs and not eq:
        return out
    parts = log.manifest().get(sink, {})
    sdir = os.path.join(base, sink)
    ddir = os.path.join(sdir, "_deletes")
    reader = _sink_reader(spark, log, base, sink)
    tomb_df = (
        spark.read.parquet(*[os.path.join(ddir, n) for n in tombs]).select(
            "__tf_file", "__tf_pos"
        )
        if tombs
        else None
    )

    # dirty set: files holding positional tombstones ...
    dirty: dict[str, set[str]] = {}
    n_pos = 0
    if tombs:
        for r in (
            tomb_df.groupBy("__tf_file").agg(F.count(F.lit(1)).alias("n")).collect()
        ):
            pd, fn = r["__tf_file"].split("/", 1)
            dirty.setdefault(pd[len(part_col) + 1:], set()).add(fn)
            n_pos += r["n"]

    # ... plus files holding equality matches: ONE scan of the files old
    # enough to be applicable (add-version < newest tombstone), read through
    # the positional tombstones so already-deleted rows don't count twice
    eq_part_counts: dict[str, int] = {}
    n_eq = 0
    if eq:
        fvmap = log.file_versions().get(sink, {})
        max_v = max(e["version"] for e in eq)
        applicable = [
            os.path.join(sdir, f"{part_col}={p}", f)
            for p in sorted(parts)
            for f in parts[p]["files"] or ()
            if fvmap.get(f"{p}/{f}") is not None and fvmap[f"{p}/{f}"] < max_v
        ]
        if applicable:
            keyed = reader.parquet(*applicable).select("*", *_pos_key_cols())
            if tomb_df is not None:
                keyed = keyed.join(
                    tomb_df, ["__tf_file", "__tf_pos"], "left_anti"
                )
            sem = _eq_join(
                spark, keyed, base, sink, eq, log, part_col, None, "left_semi"
            )
            for r in (
                sem.groupBy("__tf_file").agg(F.count(F.lit(1)).alias("n")).collect()
            ):
                pd, fn = r["__tf_file"].split("/", 1)
                key = pd[len(part_col) + 1:]
                dirty.setdefault(key, set()).add(fn)
                eq_part_counts[key] = eq_part_counts.get(key, 0) + r["n"]
                n_eq += r["n"]

    if not dirty:
        # tombstones match nothing (e.g. equality keys never present):
        # clearing them is metadata-only
        log.commit(
            {"operation": "delete", "sinks": {sink: {"clear_deletes": True}}}
        )
        return out

    version = log.current_version() + 1
    dirty_paths = [
        os.path.join(sdir, f"{part_col}={p}", fn)
        for p in sorted(dirty)
        for fn in sorted(dirty[p])
    ]
    src_keyed = reader.parquet(*dirty_paths).select("*", *_pos_key_cols())
    data_cols = [c for c in src_keyed.columns if not c.startswith("__tf_")]
    n_dirty = src_keyed.count()
    keep = src_keyed
    if tomb_df is not None:
        keep = keep.join(tomb_df, ["__tf_file", "__tf_pos"], "left_anti")
    if eq:
        keep = _eq_join(spark, keep, base, sink, eq, log, part_col, None, "left_anti")
    moved = _stage_and_move(
        spark, keep.select(*data_cols), base, sink, part_col, "mz", version
    )
    moved_paths = [
        os.path.join(sdir, f"{part_col}={p}", f) for p, fs in moved.items() for f in fs
    ]
    n_kept = reader.parquet(*moved_paths).count() if moved_paths else 0
    if n_kept != n_dirty - n_pos - n_eq:
        raise RuntimeError(
            f"materialize_deletes on {sink!r} would be lossy: kept {n_kept} rows "
            f"from {n_dirty} dirty-file rows with {n_pos} positional + {n_eq} "
            "equality tombstoned; aborting before commit"
        )
    new_files = {
        p: sorted([f for f in parts[p]["files"] if f not in dirty[p]] + moved.get(p, []))
        for p in dirty
    }
    # positional deletes moved the logical row counts at delete time;
    # equality deletes (written blind) settle theirs HERE
    new_rows = {
        p: parts[p]["rows"] - n for p, n in eq_part_counts.items()
    }
    log.commit(
        {
            "operation": "delete",
            "sinks": {
                sink: {
                    "files": new_files,
                    "rows": new_rows,
                    "clear_deletes": True,
                }
            },
        }
    )
    out["applied"] = n_pos + n_eq
    out["files_rewritten"] = len(dirty_paths)
    return out


def merge_upsert(
    spark: SparkSession,
    base: str,
    sink: str,
    updates: DataFrame,
    key_cols: list[str],
    part_col: str = PART_COL,
    probe_bloom: bool = True,
    max_probe_keys: int = 10_000,
) -> dict:
    """Copy-on-write MERGE/upsert — the Iceberg ``MERGE INTO … WHEN MATCHED
    THEN UPDATE WHEN NOT MATCHED THEN INSERT`` analog, with delete-then-insert
    semantics: every table row whose ``key_cols`` match an update row is
    replaced, every update row is inserted.

    Scale shape: dirty-file discovery is ONE distributed pass (scan ∘
    equi-join on the distinct update keys, grouped by ``input_file_name()``),
    and when per-file Bloom filters exist on a single key column
    (:func:`collect_file_blooms`) and the update key set is small
    (≤ ``max_probe_keys``), files whose filter rejects EVERY key are skipped
    before that scan — a point-keyed trickle merge against a 100 TB table
    reads only the files that can contain its keys.  Clean files are never
    rewritten; kept rows + all update rows are staged in ONE partitioned
    write, moved dark under ``mg{v}-`` names, and published by ONE ``merge``
    snapshot after a row-count invariant check.

    ``updates`` must carry exactly the table's columns (including
    ``part_col``) and should be deterministic (it is evaluated more than
    once; it is persisted here as a guard).  NULL keys never match (SQL
    equality), so NULL-keyed update rows are pure inserts.  Returns
    ``{"matched", "inserted", "files_rewritten", "files_scanned",
    "files_total", "bloom_skipped"}``."""
    log = CommitLog(base)
    _require_no_pending_deletes(log, sink, "merge_upsert")
    pin_files(base, sink, part_col)
    updates = _apply_sink_spec(log, sink, updates, part_col)
    parts = log.manifest().get(sink, {})
    sdir = os.path.join(base, sink)
    key_cols = list(key_cols)
    all_paths = [
        os.path.join(sdir, f"{part_col}={k}", f)
        for k in sorted(parts)
        for f in parts[k]["files"] or ()
    ]
    reader = _sink_reader(spark, log, base, sink)
    if all_paths:
        tbl_cols = set(reader.parquet(*all_paths).columns)
        if set(updates.columns) != tbl_cols:
            raise ValueError(
                f"updates schema {sorted(updates.columns)} != table schema "
                f"{sorted(tbl_cols)} for sink {sink!r}"
            )
    updates = updates.persist()
    try:
        n_updates = updates.count()
        keys = updates.select(*key_cols).distinct()
        cand, total = all_paths, len(all_paths)
        bloom_skipped = 0
        if probe_bloom and len(key_cols) == 1 and all_paths:
            cand, bloom_skipped = _bloom_narrow_candidates(
                spark, sdir, parts, part_col, key_cols[0], keys, max_probe_keys
            )
        matches = []
        if cand:
            matches = (
                reader.parquet(*cand)
                .withColumn("_f", F.input_file_name())
                .join(keys, on=key_cols, how="inner")
                .groupBy("_f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        dirty: dict[str, dict[str, int]] = {}
        for r in matches:
            p, fn = _split_file_path(r["_f"], part_col)
            dirty.setdefault(p, {})[fn] = r["n"]
        n_matched = sum(sum(d.values()) for d in dirty.values())
        version = log.current_version() + 1
        body = updates
        n_dirty = 0
        dirty_paths = [
            os.path.join(sdir, f"{part_col}={p}", fn)
            for p in sorted(dirty)
            for fn in sorted(dirty[p])
        ]
        if dirty_paths:
            src = reader.parquet(*dirty_paths)
            n_dirty = src.count()
            body = src.join(keys, on=key_cols, how="left_anti").unionByName(updates)
        moved = _stage_and_move(spark, body, base, sink, part_col, "mg", version)
        moved_paths = [
            os.path.join(sdir, f"{part_col}={p}", f) for p, fs in moved.items() for f in fs
        ]
        n_written = reader.parquet(*moved_paths).count() if moved_paths else 0
        if n_written != n_dirty - n_matched + n_updates:
            raise RuntimeError(
                f"merge_upsert on {sink!r} would be lossy: wrote {n_written} rows, "
                f"expected {n_dirty} − {n_matched} + {n_updates}; aborting before commit"
            )
        inserted = {
            (NULL_PART_KEY if r[part_col] is None else str(r[part_col])): r["n"]
            for r in updates.groupBy(part_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        touched = set(dirty) | set(moved)
        new_files = {}
        new_rows = {}
        for p in touched:
            old = parts.get(p, {}).get("files") or []
            drop = set(dirty.get(p, {}))
            new_files[p] = sorted([f for f in old if f not in drop] + moved.get(p, []))
            new_rows[p] = (
                parts.get(p, {}).get("rows", 0)
                - sum(dirty.get(p, {}).values())
                + inserted.get(p, 0)
            )
        log.commit(
            {"operation": "merge", "sinks": {sink: {"files": new_files, "rows": new_rows}}}
        )
        return {
            "matched": n_matched,
            "inserted": n_updates,
            "files_rewritten": len(dirty_paths),
            "files_scanned": len(cand),
            "files_total": total,
            "bloom_skipped": bloom_skipped,
        }
    finally:
        updates.unpersist()


def _bloom_narrow_candidates(
    spark: SparkSession,
    sdir: str,
    parts: dict,
    part_col: str,
    key_col: str,
    keys: DataFrame,
    max_probe_keys: int,
) -> tuple[list[str], int]:
    """Drop files whose Bloom filter rejects EVERY update key.  Falls back to
    all files when no filters exist or the key set exceeds ``max_probe_keys``
    (driver-side probing is O(keys × files) bit tests — cheap for trickle
    merges, wrong for giant ones).  Files without a filter are always kept."""
    import base64
    import zlib as _z

    bkey = f"_bloom:{key_col}"
    if not any(
        bkey in (parts[k].get("stats", {}).get(f) or {})
        for k in parts
        for f in parts[k]["files"] or ()
    ):
        return (
            [
                os.path.join(sdir, f"{part_col}={k}", f)
                for k in sorted(parts)
                for f in parts[k]["files"] or ()
            ],
            0,
        )
    kv = [r[0] for r in keys.limit(max_probe_keys + 1).collect()]
    all_files = [
        (k, f) for k in sorted(parts) for f in parts[k]["files"] or ()
    ]
    if len(kv) > max_probe_keys:
        return [os.path.join(sdir, f"{part_col}={k}", f) for k, f in all_files], 0
    kv = [v for v in kv if v is not None]  # NULL keys never match (pure inserts)
    pos_by_mk: dict[tuple[int, int], dict[str, list[int]]] = {}
    cand: list[str] = []
    skipped = 0
    for k, f in all_files:
        path = os.path.join(sdir, f"{part_col}={k}", f)
        bloom = (parts[k].get("stats", {}).get(f) or {}).get(bkey)
        if bloom is None or not kv:
            cand.append(path)
            continue
        mk = (bloom["m"], bloom["k"])
        if mk not in pos_by_mk:
            pos_by_mk[mk] = _bloom_probe_positions_many(spark, kv, *mk)
        bitmap = _z.decompress(base64.b64decode(bloom["b64"]))
        if any(
            all(bitmap[p // 8] & (1 << (p % 8)) for p in plist)
            for plist in pos_by_mk[mk].values()
        ):
            cand.append(path)
        else:
            skipped += 1
    return cand, skipped


def _bloom_probe_positions_many(
    spark: SparkSession, values: list, bits: int, hashes: int
) -> dict[str, list[int]]:
    """Batched :func:`_bloom_probe_positions`: hash ALL probe values in ONE
    Spark job with the same JVM expression family the build side used
    (per-value jobs would be O(keys) driver round-trips).  The values ship
    via a pandas frame — the Arrow fast path; a list-of-tuples
    ``createDataFrame`` pays ~2 s of row-by-row conversion at 1k values."""
    import pandas as pd

    vals = [str(v) for v in values]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    rows = df.select(
        "v",
        *[
            F.pmod(F.xxhash64(F.col("v"), F.lit(i)), F.lit(bits)).alias(f"_p{i}")
            for i in range(hashes)
        ],
    ).collect()
    return {r["v"]: [int(r[f"_p{i}"]) for i in range(hashes)] for r in rows}


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
