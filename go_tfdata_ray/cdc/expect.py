"""Ingest-time data-quality expectations with quarantine routing.

A crawl drop is untrusted input: empty extractions, truncated payloads,
junk URIs and absurd outliers all arrive mixed with good pages. The
production discipline (the Delta-Live-Tables "expectations" shape) is to
DECLARE row-level quality rules at the ingest front door and route each
violating row by policy instead of letting it poison the lake:

- ``quarantine`` (default): the row is diverted to a sidecar parquet pile
  INSIDE the WAL segment directory (``epoch-N/quar-*.parquet``, excluded
  from the consumers' shard listing), labeled with the violated rule, and
  never becomes a WAL event. Quarantined rows stay queryable
  (``read_quarantine``) for triage and re-ingest after a fix, and share
  the segment's lifecycle (abandon/vacuum reap them atomically).
- ``warn``: the row is counted but kept — drift telemetry without data loss.
- ``fail``: any violation aborts the whole drop. Because the abort happens
  BEFORE the segment seals, the standard completeness barrier guarantees no
  consumer ever saw a partial drop; ``stage_drop`` abandons its claimed
  epoch (vacuum-tombstoned so the id is never reused) and re-raises.

Rules evaluate vectorized (pyarrow.compute) per block inside the ingest
map_batches stage — no extra pass over the data, no shuffle, no driver
materialization (only per-rule violation COUNTS return with the intent
rows). Rule order is priority order: a row is charged to the FIRST rule it
violates, and later rules only see surviving rows.

Reference parity note: NVIDIA/go-tfdata filters rows via predicate
transformations (``transform/selections_transformations.go`` ByKeyValue /
FilterEmptySamples — dropped rows simply vanish); this module extends that
surface with named rules, violation accounting and a quarantine store,
which a 100 TB crawl operator needs for auditability.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ACTIONS = ("quarantine", "warn", "fail")


class ExpectationFailed(RuntimeError):
    """A ``fail``-policy rule saw a violating row. Raised inside the ingest
    task (Ray does not retry application exceptions by default, so the
    stage fails fast) and propagated by ``stage_drop`` after it abandons
    the claimed epoch."""


@dataclass
class Expectation:
    """One named row-level rule: ``fn(table) -> boolean array`` where True
    means the row PASSES. Nulls in the result count as failures (an
    unevaluable row is not a passing row)."""

    name: str
    fn: Callable[[pa.Table], Any] = field(repr=False)
    on_fail: str = "quarantine"
    # the single column a built-in rule reads (None for custom multi-column
    # fns) — lets audit()/CLI derive a pruned scan column set from the rules
    col: str | None = None

    def __post_init__(self):
        if self.on_fail not in ACTIONS:
            raise ValueError(
                f"on_fail={self.on_fail!r}: expected one of {ACTIONS}")

    def passes(self, t: pa.Table) -> pa.ChunkedArray:
        ok = self.fn(t)
        if isinstance(ok, pa.Table):  # tolerate a 1-col table return
            ok = ok.column(0)
        if not isinstance(ok, (pa.Array, pa.ChunkedArray)):
            ok = pa.array(ok)
        ok = pc.cast(ok, pa.bool_())
        if len(ok) != len(t):
            raise ValueError(
                f"expectation {self.name!r} returned {len(ok)} values "
                f"for a {len(t)}-row block")
        return pc.fill_null(ok, False)


# -- built-in rule constructors ----------------------------------------------

def _str_col(t: pa.Table, col: str) -> pa.ChunkedArray:
    return pc.cast(t[col], pa.string())


def expect_not_null(col: str, *, on_fail: str = "quarantine",
                    name: str | None = None) -> Expectation:
    return Expectation(name or f"not_null:{col}",
                       lambda t: pc.is_valid(t[col]), on_fail, col=col)


def expect_nonempty(col: str, *, on_fail: str = "quarantine",
                    name: str | None = None) -> Expectation:
    """Non-null and not whitespace-only."""
    def fn(t: pa.Table):
        v = _str_col(t, col)
        return pc.and_kleene(
            pc.is_valid(v),
            pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(v)), 0))
    return Expectation(name or f"nonempty:{col}", fn, on_fail, col=col)


def expect_min_len(col: str, n: int, *, on_fail: str = "quarantine",
                   name: str | None = None) -> Expectation:
    return Expectation(
        name or f"min_len:{col}:{n}",
        lambda t: pc.greater_equal(pc.utf8_length(_str_col(t, col)), n),
        on_fail, col=col)


def expect_max_len(col: str, n: int, *, on_fail: str = "quarantine",
                   name: str | None = None) -> Expectation:
    return Expectation(
        name or f"max_len:{col}:{n}",
        lambda t: pc.less_equal(pc.utf8_length(_str_col(t, col)), n),
        on_fail, col=col)


def expect_matches(col: str, pattern: str, *, on_fail: str = "quarantine",
                   name: str | None = None) -> Expectation:
    """Row passes iff the column matches ``pattern`` (RE2 syntax, substring
    semantics — anchor with ^/$ for a full match)."""
    return Expectation(
        name or f"matches:{col}",
        lambda t: pc.match_substring_regex(_str_col(t, col), pattern),
        on_fail, col=col)


def expect_url(col: str = "uri", *, on_fail: str = "quarantine",
               name: str | None = None) -> Expectation:
    """A fetchable web URI: http(s) scheme with a non-empty host."""
    return expect_matches(col, r"^https?://[^/\s]+", on_fail=on_fail,
                          name=name or f"url:{col}")


def expect_in_range(col: str, lo: float, hi: float, *,
                    on_fail: str = "quarantine",
                    name: str | None = None) -> Expectation:
    def fn(t: pa.Table):
        v = pc.cast(t[col], pa.float64())
        return pc.and_kleene(pc.greater_equal(v, lo), pc.less_equal(v, hi))
    return Expectation(name or f"in_range:{col}:{lo}:{hi}", fn, on_fail, col=col)


def parse_expect_spec(spec: str) -> Expectation:
    """CLI grammar: ``kind:args[=action]`` —

    - ``nonempty:COL`` / ``notnull:COL`` / ``url:COL``
    - ``minlen:COL:N`` / ``maxlen:COL:N``
    - ``match:COL:REGEX`` (regex may itself contain ``:``)
    - ``range:COL:LO:HI``

    ``=warn`` / ``=fail`` / ``=quarantine`` suffix picks the policy
    (default quarantine), e.g. ``minlen:text:20=warn``. The suffix is
    recognized only when it is one of those action words, so a ``match``
    regex may freely contain ``=`` (query strings: ``match:uri:id=\\d+``);
    a regex that literally ends in an action word needs an explicit
    ``=quarantine`` appended.
    """
    body, action = spec, "quarantine"
    if "=" in spec:
        head, tail = spec.rsplit("=", 1)
        if tail in ACTIONS:
            body, action = head, tail
        elif spec.split(":", 1)[0] != "match":
            # '=' is only meaningful inside a match regex; anywhere else a
            # non-action suffix is a typo'd policy — fail loudly
            raise ValueError(f"--expect {spec!r}: unknown action {tail!r}")
    parts = body.split(":")
    kind = parts[0]
    try:
        if kind in ("nonempty", "notnull", "url"):
            (col,) = parts[1:]
            mk = {"nonempty": expect_nonempty, "notnull": expect_not_null,
                  "url": expect_url}[kind]
            return mk(col, on_fail=action)
        if kind in ("minlen", "maxlen"):
            col, n = parts[1:]
            mk = expect_min_len if kind == "minlen" else expect_max_len
            return mk(col, int(n), on_fail=action)
        if kind == "match":
            col = parts[1]
            pattern = ":".join(parts[2:])
            if not pattern:
                raise ValueError("empty pattern")
            return expect_matches(col, pattern, on_fail=action)
        if kind == "range":
            col, lo, hi = parts[1:]
            return expect_in_range(col, float(lo), float(hi), on_fail=action)
    except (ValueError, KeyError) as e:
        if isinstance(e, ValueError) and "unknown action" in str(e):
            raise
        raise ValueError(f"--expect {spec!r}: bad arguments for "
                         f"{kind!r}") from None
    raise ValueError(f"--expect {spec!r}: unknown rule kind {kind!r}")


# -- block-level evaluation ---------------------------------------------------

def apply_expectations(
    t: pa.Table, expectations: list[Expectation],
) -> tuple[pa.Table, pa.Table | None, dict[str, int]]:
    """Evaluate ``expectations`` in order over one block. Returns
    ``(passing_rows, quarantined_rows_or_None, per_rule_violation_counts)``.
    Quarantined rows carry a ``_violation`` column naming the (first)
    violated rule. Raises ``ExpectationFailed`` on a ``fail``-policy hit.
    """
    counts: dict[str, int] = {}
    quar_parts: list[pa.Table] = []
    for ex in expectations:
        counts.setdefault(ex.name, 0)
        if len(t) == 0:
            continue
        ok = ex.passes(t)
        n_bad = len(t) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        if n_bad == 0:
            continue
        counts[ex.name] += n_bad
        if ex.on_fail == "fail":
            raise ExpectationFailed(
                f"expectation {ex.name!r} (policy=fail): {n_bad} violating "
                f"row(s) in a {len(t)}-row block — drop aborted before seal")
        if ex.on_fail == "warn":
            continue
        bad = t.filter(pc.invert(ok))
        quar_parts.append(bad.append_column(
            "_violation", pa.array([ex.name] * len(bad), pa.string())))
        t = t.filter(ok)
    quar = None
    if quar_parts:
        quar = pa.concat_tables(quar_parts, promote_options="permissive")
    return t, quar, counts


# -- quarantine store ----------------------------------------------------------
#
# Quarantine shards live INSIDE the WAL segment directory (quar-*.parquet,
# excluded from the consumers' shard listing) so their lifecycle is the
# segment's: an abandoned claim's rmtree removes them atomically (no
# straggler task can resurrect the pile — writing into a renamed-away
# directory fails loudly), a vacuumed claim reaps them, and a sealed
# segment carries its triage rows forever next to the events they were
# diverted from.

def write_quarantine_shard(quar: pa.Table, seg_dir: str) -> str:
    """Content-addressed quarantine shard: the name digests the FULL
    serialized table (schema + payload), so a task retry overwrites the
    same file with the same bytes while two blocks with overlapping keys
    but different payloads never collide."""
    import pyarrow.ipc as ipc

    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, quar.schema) as w:
        w.write_table(quar)
    name = hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:20]
    final = os.path.join(seg_dir, f"quar-{name}.parquet")
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(quar, tmp, compression="lz4")
    os.rename(tmp, final)  # ENOENT here = the claim was abandoned under us
    return final


def read_quarantine(wal_dir: str, epoch: int | None = None):
    """The quarantine pile as a Dataset (all epochs, or one), each row
    labeled with ``_violation`` and ``_epoch``. A distributed parquet read
    (one heavy-junk drop can quarantine millions of full-text rows — the
    pile must never concat on the driver); ``_epoch`` derives from the
    shard's segment directory. Empty Dataset if nothing was quarantined."""
    import ray.data as rd

    pat = (f"epoch-{epoch:05d}" if epoch is not None else "epoch-*")
    paths = sorted(glob.glob(os.path.join(wal_dir, pat, "quar-*.parquet")))
    if not paths:
        return rd.from_arrow(pa.table({
            "_violation": pa.array([], pa.string()),
            "_epoch": pa.array([], pa.int32())}))

    def tag_epoch(t: pa.Table) -> pa.Table:
        es = [int(os.path.basename(os.path.dirname(p)).split("-")[1])
              for p in t["path"].to_pylist()]
        return t.drop_columns(["path"]).append_column(
            "_epoch", pa.array(es, pa.int32()))

    return rd.read_parquet(paths, include_paths=True).map_batches(
        tag_epoch, batch_format="pyarrow")


def count_expectations(t: pa.Table,
                       expectations: list[Expectation]) -> dict[str, int]:
    """Counting-only evaluation of one block: per-rule violation counts
    with the same priority semantics as ``apply_expectations`` (a
    quarantine/fail rule's violators leave the view of later rules; warn
    violators stay) — but nothing is written and nothing raises."""
    counts: dict[str, int] = {}
    for ex in expectations:
        counts.setdefault(ex.name, 0)
        if len(t) == 0:
            continue
        ok = ex.passes(t)
        n_bad = len(t) - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        counts[ex.name] += n_bad
        if n_bad and ex.on_fail != "warn":
            t = t.filter(ok)
    return counts


_AUDIT_CACHE: dict[bytes, list] = {}


def audit_expectations(ds, expectations: list[Expectation]):
    """Distributed data-quality audit: violation counts per rule over any
    document Dataset (or a lake ``scan()``). Pure counting — no rows are
    quarantined, no ``fail`` rule aborts. Per-batch partial counts carry
    only (rule, n) rows; the tiny partials coalesce in one final task
    (`stages/exchange.py:exchange_coalesce_map`). Returns a Dataset
    ``(rule: string, violations: int64)`` in declared rule order."""
    import pandas as pd

    from ray import cloudpickle

    from ..stages.exchange import exchange_coalesce_map

    blob = cloudpickle.dumps(list(expectations))
    names = [x.name for x in expectations]

    def partial(t: pa.Table) -> pa.Table:
        rules = _AUDIT_CACHE.get(blob)
        if rules is None:
            rules = _AUDIT_CACHE.setdefault(blob, cloudpickle.loads(blob))
        c = count_expectations(t, rules)
        return pa.table({"rule": pa.array(list(c), pa.string()),
                         "n": pa.array([c[k] for k in c], pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("rule", sort=False)["n"].sum()
        return pd.DataFrame({
            "rule": names,
            "violations": [int(s.get(r, 0)) for r in names]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return exchange_coalesce_map(partials, fold)


def merge_violation_counts(acc: dict[str, int], one: Any) -> dict[str, int]:
    """Fold one intent row's JSON violation payload into the run total."""
    if not one:
        return acc
    for k, v in json.loads(one).items():
        acc[k] = acc.get(k, 0) + int(v)
    return acc
