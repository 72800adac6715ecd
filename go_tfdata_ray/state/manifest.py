"""Versioned transactional manifest for the Parquet lake.

The reference's TFRecord sink is explicitly non-atomic on partial failure
(`/root/reference/tfdata/core/tfrecord.go:62`); the north rule requires the
opposite: exactly-once via an idempotent, epoch-fenced two-phase commit.

Phase 1: tasks write data files to per-partition paths (tmp name + rename,
so retries are idempotent) and return *intent* rows. Phase 2: the driver
folds the intents into a new manifest version and publishes it with an
atomic create-if-absent (``os.link``) of ``manifest-v{N+1}.json``. A stale
or competing driver loses the link race and must reload — that is the fence.
Files are truth only once referenced by the latest manifest; unreferenced
files from crashed runs are ignored and later vacuumed.

On object stores the same protocol maps to conditional PUT (If-None-Match)
of the manifest key; everything else is plain immutable-object writes.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PartitionState:
    watermark_seq: int = -1  # highest applied seq; events at/below are replays
    files: list[dict[str, Any]] = field(default_factory=list)
    # each file: {"path": rel, "kind": "base"|"delta", "epoch": int, "rows": int}


@dataclass
class Manifest:
    version: int
    num_partitions: int
    committed_epoch: int = -1
    fence_token: str = ""
    schema: list[list[str]] = field(default_factory=list)  # [[name, arrow_type_str]]
    partitions: dict[str, PartitionState] = field(default_factory=dict)
    stats: dict[str, Any] = field(default_factory=dict)
    # Iceberg-style manifest segments: one Parquet intent file per applied
    # epoch ({"epoch", "path", "rows"}); the per-(fragment × partition)
    # fan-out lives THERE, keeping this JSON O(partitions + epochs) instead
    # of O(run_files × partitions) — at 10^10 events the inline form was
    # measured at ~10^6 entries. Compaction folds segments into per-
    # partition base files (tracked in ``partitions[k].files``) and clears
    # this list.
    epochs: list[dict[str, Any]] = field(default_factory=list)

    def part(self, k: int) -> PartitionState:
        return self.partitions.setdefault(str(k), PartitionState())

    def watermarks(self) -> dict[int, int]:
        return {int(k): v.watermark_seq for k, v in self.partitions.items()}

    def live_files(self, lake_dir: str) -> list[str]:
        """Base files + epoch intent-segment files. Delta run files are
        referenced INSIDE the segments — ``vacuum`` resolves them per
        retained version via ``_segment_delta_paths``."""
        out = []
        for ps in self.partitions.values():
            out += [os.path.join(lake_dir, f["path"]) for f in ps.files]
        for ep in self.epochs:
            if ep["path"] is not None:  # zero-intent epochs have no segment
                out.append(os.path.join(lake_dir, ep["path"]))
        return out

    def to_json(self) -> str:
        d = {
            "version": self.version,
            "num_partitions": self.num_partitions,
            "committed_epoch": self.committed_epoch,
            "fence_token": self.fence_token,
            "schema": self.schema,
            "stats": self.stats,
            "epochs": self.epochs,
            "partitions": {
                k: {"watermark_seq": p.watermark_seq, "files": p.files}
                for k, p in self.partitions.items()
            },
        }
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        m = Manifest(
            version=d["version"],
            num_partitions=d["num_partitions"],
            committed_epoch=d.get("committed_epoch", -1),
            fence_token=d.get("fence_token", ""),
            schema=d.get("schema", []),
            stats=d.get("stats", {}),
            epochs=d.get("epochs", []),
        )
        for k, p in d.get("partitions", {}).items():
            m.partitions[k] = PartitionState(p["watermark_seq"], p["files"])
        return m


_MANIFEST_RE = re.compile(r"manifest-v(\d+)\.json$")


def _manifest_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests")


def latest_version(lake_dir: str) -> int:
    d = _manifest_dir(lake_dir)
    if not os.path.isdir(d):
        return -1
    vs = [int(m.group(1)) for n in os.listdir(d) if (m := _MANIFEST_RE.match(n))]
    return max(vs, default=-1)


def load_latest(lake_dir: str) -> Manifest | None:
    v = latest_version(lake_dir)
    if v < 0:
        return None
    return load_version(lake_dir, v)


def load_version(lake_dir: str, version: int) -> Manifest:
    """Load a specific committed manifest version (time travel — available
    within the vacuum retention window, ``vacuum(keep_versions=...)``)."""
    p = os.path.join(_manifest_dir(lake_dir), f"manifest-v{version}.json")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"manifest v{version} not found (vacuumed or never committed)")
    with open(p) as f:
        return Manifest.from_json(f.read())


class FencedOutError(RuntimeError):
    """Another writer committed this version first; reload and retry/stop."""


def commit(lake_dir: str, m: Manifest) -> None:
    """Atomically publish ``manifest-v{m.version}.json``; create-if-absent
    semantics provide the epoch fence (stale writers raise FencedOutError)."""
    d = _manifest_dir(lake_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    final = os.path.join(d, f"manifest-v{m.version}.json")
    try:
        os.link(tmp, final)  # atomic create-if-absent on POSIX
    except FileExistsError as e:
        raise FencedOutError(f"manifest v{m.version} already committed") from e
    finally:
        os.unlink(tmp)


def _segment_delta_paths(lake_dir: str, m: Manifest) -> set[str]:
    """Delta run files referenced INSIDE a manifest's epoch intent segments
    (the per-(fragment × partition) fan-out lives in Parquet, not the JSON)."""
    import pyarrow.parquet as pq

    out: set[str] = set()
    for ep in m.epochs:
        if ep["path"] is None:  # zero-intent epoch: no segment
            continue
        seg = os.path.join(lake_dir, ep["path"])
        if not os.path.exists(seg):
            continue
        t = pq.read_table(seg, columns=["path"])
        out |= {os.path.join(lake_dir, p) for p in set(t["path"].to_pylist())}
    return out


def vacuum(lake_dir: str, keep_versions: int = 2,
           extra_live: set[str] | None = None) -> list[str]:
    """Delete data files not referenced by ANY retained manifest version and
    manifests older than the retention window.

    The live set is the union over every retained version (latest and the
    ``keep_versions - 1`` before it) of: base files, epoch intent segments,
    and the delta run files those segments reference — so ``scan(at_version=)``
    keeps working for every retained snapshot even after compact()+vacuum()
    (time travel within the retention window is a hard contract, exercised by
    ``tail(auto_compact=)`` on the normal continuous-ingest path).
    Superseded / orphaned ``intents-*.parquet`` segments in ``_manifests``
    (from compacted-away epochs or fenced-out racing writers) are deleted
    too. ``extra_live``: additional absolute paths to preserve."""
    m = load_latest(lake_dir)
    if m is None:
        return []
    live: set[str] = {os.path.abspath(p) for p in (extra_live or set())}
    for v in range(max(m.version - keep_versions + 1, 0), m.version + 1):
        try:
            mv = load_version(lake_dir, v)
        except FileNotFoundError:
            continue  # already outside a previous retention window
        live |= {os.path.abspath(p) for p in mv.live_files(lake_dir)}
        live |= {os.path.abspath(p) for p in _segment_delta_paths(lake_dir, mv)}
    deleted = []
    # sidecar state the manifest doesn't reference but that must survive
    # vacuum: the incremental dedup indexes (exact content + near-dup)
    sidecars = ("_dedup_index", "_neardup_index", "_ann_index")
    for root, _dirs, names in os.walk(lake_dir):
        _dirs[:] = [d for d in _dirs if d not in sidecars]
        if os.path.basename(root) in ("_manifests",) + sidecars:
            continue
        for n in names:
            p = os.path.abspath(os.path.join(root, n))
            if p.endswith(".parquet") and p not in live:
                os.unlink(p)
                deleted.append(p)
    md = _manifest_dir(lake_dir)
    for n in os.listdir(md):
        p = os.path.abspath(os.path.join(md, n))
        mm = _MANIFEST_RE.match(n)
        if mm and int(mm.group(1)) <= m.version - keep_versions:
            os.unlink(p)
            deleted.append(p)
        elif n.endswith(".parquet") and p not in live:
            # intent segments not referenced by any retained version:
            # compaction leftovers or a fenced-out writer's orphans
            os.unlink(p)
            deleted.append(p)
    return deleted


def clone_lake(src_dir: str, dst_dir: str, at_version: int | None = None,
               include_indexes: bool = True) -> dict[str, int]:
    """Zero-copy lake BRANCH: materialize ``dst_dir`` as an independent
    lake whose history ends at ``at_version`` (default: latest), sharing
    every data file with the source via HARDLINKS.

    Why this is safe: every writer in this engine mutates files only by
    tmp-write + rename/os.replace (data fragments, intent segments,
    manifests, index segments, Bloom side-files, state.json — nothing is
    ever opened for in-place modification), so a shared inode can never
    be changed under the other branch: a "rewrite" in either lake breaks
    the link by swapping in a fresh inode, and ``vacuum`` only unlinks
    directory entries — the inode survives while any branch references
    it. After the clone the two lakes are fully independent: ingest,
    compact, dedup and vacuum on one never affect the other.

    What is cloned: every still-on-disk manifest version ≤ ``at_version``
    (so time travel and the ``changes`` feed keep working on the branch
    within the source's retention window at clone time) plus the union of
    those versions' file closures (bases, intent segments, delta run
    files), plus — with ``include_indexes`` — the ``_dedup_index`` /
    ``_neardup_index`` / ``_ann_index`` sidecars, so incremental dedup /
    ANN sync on the branch stay O(change set) instead of re-bootstrapping.

    Cost is O(files) metadata operations — no bytes are copied on a
    same-filesystem clone (cross-device falls back to copy, counted in
    ``"copied"``). On an object store the same shape is conditional-PUT
    of the manifest keys over shared immutable objects.

    ``dst_dir`` must not already contain a lake (no ``_manifests``).
    Returns ``{"version", "manifests", "linked", "copied"}``."""
    import shutil

    head = latest_version(src_dir)
    if head < 0:
        raise FileNotFoundError(f"no committed manifest under {src_dir}")
    v = head if at_version is None else int(at_version)
    if latest_version(dst_dir) >= 0:
        raise FileExistsError(f"{dst_dir} already holds a lake")
    # closure over every retained manifest ≤ v (rel paths)
    rels: set[str] = set()
    versions: list[int] = []
    for n in os.listdir(_manifest_dir(src_dir)):
        m = _MANIFEST_RE.match(n)
        if not (m and int(m.group(1)) <= v):
            continue
        versions.append(int(m.group(1)))
        mv = load_version(src_dir, int(m.group(1)))
        for p in mv.live_files(src_dir):
            rels.add(os.path.relpath(p, src_dir))
        for p in _segment_delta_paths(src_dir, mv):
            rels.add(os.path.relpath(p, src_dir))
    if v not in versions:
        raise FileNotFoundError(
            f"manifest v{v} not found (vacuumed or never committed)")
    if include_indexes:
        for side in ("_dedup_index", "_neardup_index", "_ann_index"):
            d = os.path.join(src_dir, side)
            for root, _dirs, names in os.walk(d):
                for n in names:
                    if ".tmp" in n:
                        continue  # half-written scratch, never state
                    rels.add(os.path.relpath(os.path.join(root, n), src_dir))
    linked = copied = 0
    for rel in sorted(rels):
        src = os.path.join(src_dir, rel)
        dst = os.path.join(dst_dir, rel)
        if not os.path.exists(src):
            continue  # vacuumed under an old manifest: that version is gone
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            continue  # crashed-clone re-run: already linked
        try:
            os.link(src, dst)
            linked += 1
        except OSError:  # EXDEV (cross-device) or a filesystem without links
            # NEVER copyfile onto an existing dst: it would TRUNCATE the
            # shared inode (the exists-check above guards the re-run path);
            # tmp+rename keeps a concurrent reader off a half-copied file
            tmp = dst + f".tmp-{os.getpid()}"
            shutil.copyfile(src, tmp)
            os.rename(tmp, dst)
            copied += 1
    # manifest JSONs last: a crash mid-clone leaves data files and intent
    # segments but no manifest-v*.json, so the partial clone is not a lake
    # (latest_version < 0) and a re-run relinks idempotently over it
    os.makedirs(_manifest_dir(dst_dir), exist_ok=True)
    for mv in sorted(versions):
        src = os.path.join(_manifest_dir(src_dir), f"manifest-v{mv}.json")
        dst = os.path.join(_manifest_dir(dst_dir), f"manifest-v{mv}.json")
        if os.path.exists(dst):
            continue
        try:
            os.link(src, dst)
        except OSError:  # cross-device (same truncation guard as above)
            tmp = dst + f".tmp-{os.getpid()}"
            shutil.copyfile(src, tmp)
            os.rename(tmp, dst)
    return {"version": v, "manifests": len(versions),
            "linked": linked, "copied": copied}
