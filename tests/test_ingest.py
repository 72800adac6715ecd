"""Crawl front door: WARC / JSONL sources and the drop→WAL→lake path."""

import gzip
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from go_tfdata_ray.cdc import ingest
from go_tfdata_ray.cdc.engine import CDCEngine
from go_tfdata_ray.functions.text import Tokenizer
from go_tfdata_ray.sources import jsonl as jsonlmod
from go_tfdata_ray.sources import warc as warcmod


def _mk_records(n, *, start=0, prefix="page"):
    recs = []
    for i in range(start, start + n):
        body = f"Document {prefix} {i} " + "lorem ipsum " * (i % 5 + 1)
        recs.append({
            "warc_type": "response",
            "uri": f"https://example.com/{prefix}/{i}",
            "date": f"2026-01-01T00:{i % 60:02d}:00Z",
            "content_type": "application/http; msgtype=response",
            "payload": (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                        b"\r\n" + body.encode()),
        })
    return recs


# -- WARC record layer ------------------------------------------------------

@pytest.mark.parametrize("suffix", [".warc", ".warc.gz"])
def test_warc_roundtrip(tmp_path, suffix):
    recs = _mk_records(7)
    # interleave a request record (filtered by default) and a warcinfo
    recs.insert(2, {"warc_type": "request", "uri": recs[2]["uri"],
                    "payload": b"GET / HTTP/1.1\r\n\r\n"})
    recs.insert(0, {"warc_type": "warcinfo", "payload": b"robots: obey\r\n"})
    path = str(tmp_path / f"drop{suffix}")
    assert warcmod.write_warc(path, recs) == 9

    got = list(warcmod.iter_warc_records(path))
    assert len(got) == 9
    assert [g["headers"]["WARC-Type"] for g in got] == \
        ["warcinfo", "response", "response", "request"] + ["response"] * 5
    # payload byte-exact through the gzip member layout
    assert got[1]["payload"] == recs[1]["payload"]
    assert got[-1]["payload"] == recs[-1]["payload"]

    ds = warcmod.read_warc(path)
    t = ds.to_pandas().sort_values("uri").reset_index(drop=True)
    assert len(t) == 7  # request + warcinfo filtered
    assert set(t["warc_type"]) == {"response"}
    # http_strip removed the envelope: bodies start with "Document"
    assert all(bytes(p).startswith(b"Document") for p in t["payload"])


def test_warc_no_strip_and_type_filter(tmp_path):
    path = str(tmp_path / "drop.warc")
    warcmod.write_warc(path, _mk_records(3))
    t = warcmod.read_warc(path, http_strip=False).to_pandas()
    assert all(bytes(p).startswith(b"HTTP/1.1 200 OK") for p in t["payload"])
    none = warcmod.read_warc(path, types=("resource",)).to_pandas()
    assert len(none) == 0


def test_warc_http_body_passthrough():
    assert warcmod.http_body(b"no envelope here") == b"no envelope here"
    assert warcmod.http_body(b"H: v\r\n\r\nbody") == b"body"


# -- JSONL ------------------------------------------------------------------

def test_jsonl_strict_and_tolerant(tmp_path):
    rows = [{"uri": f"u{i}", "text": f"doc {i}", "n": i} for i in range(50)]
    p_ok = str(tmp_path / "a.jsonl")
    with open(p_ok, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    p_gz = str(tmp_path / "b.jsonl.gz")
    with gzip.open(p_gz, "wt") as f:
        for r in rows[:10]:
            f.write(json.dumps(r) + "\n")
        f.write("{broken json\n")
        f.write('"not an object"\n')
        f.write("\n")
        for r in rows[10:20]:
            f.write(json.dumps(r) + "\n")

    strict = jsonlmod.read_jsonl(p_ok, columns=["uri", "n"]).to_pandas()
    assert len(strict) == 50 and list(strict.columns) == ["uri", "n"]

    tol = jsonlmod.read_jsonl([p_ok, p_gz], columns=["uri", "text"],
                              strict=False, batch_rows=16).to_pandas()
    assert len(tol) == 70  # bad lines skipped, both files read

    rep = jsonlmod.scan_bad_lines([p_ok, p_gz]).to_pandas().set_index("path")
    assert rep.loc[p_ok, "bad_lines"] == 0 and rep.loc[p_ok, "rows"] == 50
    assert rep.loc[p_gz, "bad_lines"] == 2 and rep.loc[p_gz, "rows"] == 20


# -- drop → WAL → lake end to end --------------------------------------------

def _expected_tokens(text, uri, vocab=50257):
    tok = Tokenizer(vocab=vocab)
    t = tok(pa.table({"doc_id": pa.array([uri]), "text": pa.array([text])}))
    return t["tokens"][0].as_py()


def test_stage_drop_then_tail_lww_and_tombstones(tmp_path):
    """Two WARC drops + a takedown list through the real WAL path:
    last-fetch-wins per URI, deletes tombstone, lake content matches a
    pandas oracle per-row."""
    wal_dir = str(tmp_path / "wal")

    # drop 1: pages 0..19
    d1 = str(tmp_path / "d1.warc.gz")
    warcmod.write_warc(d1, _mk_records(20))
    docs1 = warcmod.read_warc(d1).map_batches(
        lambda t: t.append_column(
            "text", pa.array([bytes(p).decode() for p in t["payload"].to_pylist()],
                             pa.string())),
        batch_format="pyarrow")
    r1 = ingest.stage_drop(docs1, wal_dir, source="crawl")
    assert r1["epoch"] == 0 and r1["rows"] == 20 and r1["shards"] >= 1
    assert not os.path.exists(os.path.join(r1["seg_dir"], "_OPEN"))

    # drop 2: pages 10..19 re-fetched LATER with new content, plus 20..24 new
    recs2 = _mk_records(10, start=10)
    for r in recs2:
        r["payload"] = r["payload"].replace(b"Document", b"Refetched")
        r["date"] = "2026-02-02T00:00:00Z"
    recs2 += _mk_records(5, start=20)
    d2 = str(tmp_path / "d2.warc")
    warcmod.write_warc(d2, recs2)
    docs2 = warcmod.read_warc(d2).map_batches(
        lambda t: t.append_column(
            "text", pa.array([bytes(p).decode() for p in t["payload"].to_pylist()],
                             pa.string())),
        batch_format="pyarrow")
    r2 = ingest.stage_drop(docs2, wal_dir, source="crawl")
    assert r2["epoch"] == 1 and r2["rows"] == 15

    # takedown: pages 0 and 15 (15 was just refetched — delete still wins
    # in a LATER epoch)
    r3 = ingest.stage_tombstones(
        ["https://example.com/page/0", "https://example.com/page/15"], wal_dir)
    assert r3["epoch"] == 2 and r3["rows"] == 2

    # declare `uri` in the lake schema (add-column evolution: the tombstone
    # shards lack it and read back as null)
    from go_tfdata_ray.cdc.engine import DEFAULT_TARGET
    from go_tfdata_ray.stages.schema import SchemaPolicy

    policy = SchemaPolicy(target=DEFAULT_TARGET.append(pa.field("uri", pa.string())))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4, policy=policy)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan(columns=["doc_id", "uri", "tokens", "n_tok", "source"]).to_pandas()

    # oracle: pandas LWW over the same logical events
    live = {}
    for i in range(20):
        live[f"https://example.com/page/{i}"] = f"Document page {i} " + \
            "lorem ipsum " * (i % 5 + 1)
    for i in range(10, 20):
        live[f"https://example.com/page/{i}"] = f"Refetched page {i} " + \
            "lorem ipsum " * (i % 5 + 1)
    for i in range(20, 25):
        live[f"https://example.com/page/{i}"] = f"Document page {i} " + \
            "lorem ipsum " * (i % 5 + 1)
    del live["https://example.com/page/0"], live["https://example.com/page/15"]

    assert len(got) == len(live) == 23
    by_uri = got.set_index("uri")
    for uri, text in live.items():
        assert by_uri.loc[uri, "tokens"].tolist() == _expected_tokens(text, uri)
        assert by_uri.loc[uri, "source"] == "crawl"

    # idempotent re-tail: nothing re-applied
    before = eng.manifest.version
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.manifest.version == before


def test_stage_drop_same_uri_twice_in_one_drop_latest_fetch_wins(tmp_path):
    wal_dir = str(tmp_path / "wal")
    uri = "https://example.com/hot"
    docs = rd.from_arrow(pa.table({
        "uri": pa.array([uri, uri], pa.string()),
        "text": pa.array(["old body", "new body"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z", "2026-01-01T00:00:05Z"],
                         pa.string()),
    }))
    ingest.stage_drop(docs, wal_dir)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan().to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["tokens"].tolist() == _expected_tokens("new body", uri)


def test_stage_drop_retry_is_idempotent(tmp_path):
    """Content-addressed shard names: re-staging the same epoch id with the
    same rows lands on the same files (a retried producer double-writes
    nothing)."""
    wal_dir = str(tmp_path / "wal")
    docs = rd.from_arrow(pa.table({
        "uri": pa.array([f"u{i}" for i in range(8)], pa.string()),
        "text": pa.array([f"body {i}" for i in range(8)], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"] * 8, pa.string()),
    }))
    r1 = ingest.stage_drop(docs, wal_dir, epoch=0, date_col="date")
    names1 = sorted(os.listdir(r1["seg_dir"]))
    r2 = ingest.stage_drop(docs, wal_dir, epoch=0, date_col="date")
    names2 = sorted(os.listdir(r2["seg_dir"]))
    assert names1 == names2 and r1["rows"] == r2["rows"] == 8


def test_doc_id_stability():
    a = ingest.doc_id_for_uri(["https://x/1", "https://x/2"]).to_pylist()
    b = ingest.doc_id_for_uri(["https://x/1", "https://x/2"]).to_pylist()
    assert a == b and a[0] != a[1] and a[0].startswith("w:")


def test_seq_orders_epochs_above_dates():
    """A later drop's smallest seq exceeds an earlier drop's largest —
    the replay filter can never drop a later epoch's events."""
    hi_e0 = (np.int64(0) << 40) | (((1 << 32) - 1) << 8) | 0xFF
    lo_e1 = np.int64(1) << 40
    assert lo_e1 > hi_e0


def test_claim_epoch_skips_open_and_sealed_segments(tmp_path):
    """Independent producers must never share a segment: a claim lands on
    the first FREE id, skipping sealed, open, and legacy-file segments."""
    from go_tfdata_ray.sources import wal as walmod

    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    d0 = walmod.open_segment(wal_dir, 0)
    walmod.seal_segment(d0)          # sealed
    walmod.open_segment(wal_dir, 1)  # still open (another producer mid-write)
    open(os.path.join(wal_dir, "epoch-00002.parquet"), "wb").close()  # legacy

    e, seg = ingest._claim_epoch(wal_dir)
    assert e == 3 and os.path.exists(os.path.join(seg, "_OPEN"))
    e2, _ = ingest._claim_epoch(wal_dir)  # a second producer right after
    assert e2 == 4


def test_cli_ingest_and_takedown(tmp_path):
    """The ray-job surface: WARC ingest + takedown + tail + scan through
    the CLI entry point (in-process main())."""
    from go_tfdata_ray.cdc.cli import main

    wal_dir = str(tmp_path / "wal")
    drop = str(tmp_path / "drop.warc.gz")
    warcmod.write_warc(drop, _mk_records(12))
    assert main(["ingest", "--wal", wal_dir, "--warc", drop,
                 "--source", "crawl"]) == 0
    assert main(["takedown", "--wal", wal_dir,
                 "--uris", "https://example.com/page/3"]) == 0

    jl = str(tmp_path / "drop.jsonl")
    with open(jl, "w") as f:
        f.write(json.dumps({"uri": "https://example.com/page/12",
                            "text": "jsonl page", "date": "2026-04-01T00:00:00Z"})
                + "\n")
        f.write("{bad line\n")
    assert main(["ingest", "--wal", wal_dir, "--jsonl", jl]) == 0

    lake = str(tmp_path / "lake")
    assert main(["tail", "--wal", wal_dir, "--lake", lake, "--partitions", "4",
                 "--poll", "0.01", "--idle-limit", "1"]) == 0
    eng = CDCEngine(lake)
    got = eng.scan().to_pandas()
    assert len(got) == 12  # 12 fetched - 1 takedown + 1 jsonl doc
    # mutually exclusive flags rejected
    assert main(["ingest", "--wal", wal_dir]) == 2
    assert main(["takedown", "--wal", wal_dir]) == 2


def test_warc_case_insensitive_headers_and_missing_length(tmp_path):
    """ISO 28500 field names are case-insensitive; a record without the
    mandatory Content-Length fails at ITS boundary, not by desyncing."""
    p = str(tmp_path / "odd.warc")
    with open(p, "wb") as f:
        f.write(b"WARC/1.0\r\n"
                b"warc-type: response\r\n"
                b"WARC-TARGET-URI: https://x/1\r\n"
                b"content-length: 4\r\n"
                b"\r\nbody\r\n\r\n")
    got = list(warcmod.iter_warc_records(p))
    assert len(got) == 1 and got[0]["payload"] == b"body"
    t = warcmod.read_warc(p, http_strip=False).to_pandas()
    assert len(t) == 1 and t.iloc[0]["uri"] == "https://x/1"

    bad = str(tmp_path / "bad.warc")
    with open(bad, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        list(warcmod.iter_warc_records(bad))


def test_jsonl_tolerant_type_drift_and_required_columns(tmp_path):
    p = str(tmp_path / "drift.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"id": 1, "text": "a"}) + "\n")
        f.write(json.dumps({"id": "abc", "text": None}) + "\n")
        f.write(json.dumps({"text": "c"}) + "\n")
    t = jsonlmod.read_jsonl(p, columns=["id", "text", "missing"],
                            strict=False).to_pandas()
    assert len(t) == 3
    assert list(t["id"]) == ["1", "abc", None]  # default: stable strings
    assert t["missing"].isna().all()
    with pytest.raises(ValueError, match="columns"):
        jsonlmod.read_jsonl(p, strict=False)

    # declared types coerce per VALUE (junk -> null) with a schema that is
    # IDENTICAL across batches even when the junk lands in one batch only
    p2 = str(tmp_path / "drift2.jsonl")
    with open(p2, "w") as f:
        for i in range(8):
            f.write(json.dumps({"n": i}) + "\n")
        f.write(json.dumps({"n": "junk"}) + "\n")
        for i in range(8, 12):
            f.write(json.dumps({"n": i}) + "\n")
    ds = jsonlmod.read_jsonl(p2, columns=["n"], strict=False, batch_rows=4,
                             types={"n": pa.int64()})
    out = ds.to_pandas()  # unification across the 4-row batches must hold
    assert len(out) == 13
    got = [None if pd.isna(v) else int(v) for v in out["n"]]
    assert sorted(v for v in got if v is not None) == list(range(12))
    assert got.count(None) == 1
    assert dict(zip(ds.schema().names, map(str, ds.schema().types)))["n"] == "int64"


def test_tail_defers_sealed_segment_behind_open_claim(tmp_path):
    """Concurrent producers: B (epoch 1) seals before A (epoch 0). tail
    must NOT apply 1 past A's open claim — that would raise wal_hwm and
    the replay watermarks over epoch 0, silently dropping A's drop."""
    wal_dir = str(tmp_path / "wal")
    docs_a = rd.from_arrow(pa.table({
        "uri": pa.array(["https://a/1", "https://a/2"], pa.string()),
        "text": pa.array(["alpha one", "alpha two"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"] * 2, pa.string()),
    }))
    docs_b = rd.from_arrow(pa.table({
        "uri": pa.array(["https://b/1"], pa.string()),
        "text": pa.array(["bravo one"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"], pa.string()),
    }))

    # A claims 0 but is slow: claim only, no shards yet
    e_a, seg_a = ingest._claim_epoch(wal_dir)
    assert e_a == 0
    # B claims 1 and finishes first
    rb = ingest.stage_drop(docs_b, wal_dir)
    assert rb["epoch"] == 1

    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan_table(columns=["doc_id"]).num_rows == 0  # deferred

    r = eng.apply_wal(wal_dir)  # one-shot path defers too
    assert any(x.get("deferred") for x in r)

    # A finishes: stage into the claimed epoch, seal — both drops apply IN ID ORDER
    ra = ingest.stage_drop(docs_a, wal_dir, epoch=e_a)
    assert ra["epoch"] == 0
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan_table(columns=["doc_id"])
    assert got.num_rows == 3  # nothing lost


def test_write_warc_dataset_roundtrip(tmp_path):
    """Distributed WARC sink: export → read_warc → identical documents."""
    df = pd.DataFrame({
        "uri": [f"https://c/{i}" for i in range(40)],
        "text": [f"corpus doc {i} body" for i in range(40)],
        "date": ["2026-07-01T00:00:00Z"] * 40,
    })
    out = str(tmp_path / "export")
    n = warcmod.write_warc_dataset(
        rd.from_pandas(df).repartition(4), out)
    assert n == 40
    shards = [os.path.join(out, s) for s in sorted(os.listdir(out))]
    assert len(shards) >= 2 and all(s.endswith(".warc.gz") for s in shards)

    back = warcmod.read_warc(shards).to_pandas().sort_values("uri")
    assert len(back) == 40
    got = {u: bytes(p).decode() for u, p in zip(back["uri"], back["payload"])}
    assert got == dict(zip(df["uri"], df["text"]))

    # content-addressed: re-export over the same dir is byte-idempotent
    n2 = warcmod.write_warc_dataset(rd.from_pandas(df).repartition(4), out)
    assert n2 == 40 and sorted(os.listdir(out)) == [os.path.basename(s) for s in shards]


def test_vacuum_stale_claims_unblocks_feed(tmp_path):
    """An abandoned claim blocks the ordering barrier; wal-vacuum removes
    it (never a sealed segment, never a fresh claim) and tail proceeds."""
    import time

    from go_tfdata_ray.cdc.cli import main

    wal_dir = str(tmp_path / "wal")
    # abandoned claim at 0 (backdated), live claim at 1, sealed drop at 2
    _, seg0 = ingest._claim_epoch(wal_dir)
    old = time.time() - 7200
    os.utime(os.path.join(seg0, "_OPEN"), (old, old))
    ingest._claim_epoch(wal_dir)  # epoch 1, fresh
    docs = rd.from_arrow(pa.table({
        "uri": pa.array(["https://v/1"], pa.string()),
        "text": pa.array(["vacuum test"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"], pa.string())}))
    r = ingest.stage_drop(docs, wal_dir)
    assert r["epoch"] == 2

    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan_table(columns=["doc_id"]).num_rows == 0  # blocked at 0

    gone = ingest.vacuum_stale_claims(wal_dir, max_age_secs=3600)
    assert gone == [0]  # the fresh claim at 1 survives

    # still blocked by the LIVE claim at 1 — seal it empty... a claim with
    # no shards can simply be vacuumed by its own producer; here the
    # producer finishes instead
    ingest.stage_drop(rd.from_arrow(pa.table({
        "uri": pa.array(["https://v/2"], pa.string()),
        "text": pa.array(["second"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"], pa.string())})),
        wal_dir, epoch=1)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan_table(columns=["doc_id"]).num_rows == 2

    # CLI surface
    assert main(["wal-vacuum", "--wal", wal_dir, "--age-secs", "3600"]) == 0


def test_canonicalize_uri_variants_collapse():
    c = ingest.canonicalize_uri
    assert c("HTTP://Example.COM:80/a/#frag") == "http://example.com/a"
    assert c("https://example.com:443/a") == "https://example.com/a"
    assert c("https://example.com:8443/a/") == "https://example.com:8443/a"
    assert c("http://u:p@Example.com/x") == "http://u:p@example.com/x"
    assert c("https://example.com/") == "https://example.com/"  # root kept
    assert c("https://example.com/a?b=2&a=1") == "https://example.com/a?b=2&a=1"
    assert c("not a uri") == "not a uri"
    assert c(c("HTTP://X.com/p/")) == c("HTTP://X.com/p/")  # idempotent


def test_stage_drop_canonicalize_collapses_variants(tmp_path):
    wal_dir = str(tmp_path / "wal")
    docs = rd.from_arrow(pa.table({
        "uri": pa.array(["HTTP://Site.com:80/page/#top",
                         "http://site.com/page"], pa.string()),
        "text": pa.array(["old body", "new body"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z", "2026-01-01T00:01:00Z"],
                         pa.string()),
    }))
    ingest.stage_drop(docs, wal_dir, canonicalize=True)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan_table(columns=["doc_id", "tokens"])
    assert got.num_rows == 1  # one page, latest fetch wins
    assert got["tokens"][0].as_py() == _expected_tokens(
        "new body", "http://site.com/page")


def test_canonicalize_uri_edge_cases():
    c = ingest.canonicalize_uri
    # junk ports pass through instead of crashing the ingest task
    assert c("http://example.com:99999/x") == "http://example.com:99999/x"
    assert c("http://example.com:8a/x") == "http://example.com:8a/x"
    # IPv6 brackets preserved; idempotent
    assert c("http://[::1]:8080/x") == "http://[::1]:8080/x"
    assert c("https://[2001:DB8::1]/x") == "https://[2001:db8::1]/x"
    assert c(c("https://[2001:DB8::1]/x")) == c("https://[2001:DB8::1]/x")
    # RFC 3986 §6.2.3: empty path with authority == '/'
    assert c("https://example.com") == "https://example.com/"
    assert c("https://example.com#top") == c("https://example.com/#top")
    assert c("https://x.com?a=1") == "https://x.com/?a=1"


def test_takedown_cli_canonicalize_keys_match(tmp_path):
    from go_tfdata_ray.cdc.cli import main

    wal_dir = str(tmp_path / "wal")
    docs = rd.from_arrow(pa.table({
        "uri": pa.array(["http://site.com/page"], pa.string()),
        "text": pa.array(["body"], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"], pa.string())}))
    ingest.stage_drop(docs, wal_dir, canonicalize=True)
    # takedown under a cosmetic VARIANT of the uri — only --canonicalize
    # lands on the same doc_id
    assert main(["takedown", "--wal", wal_dir,
                 "--uris", "HTTP://Site.com:80/page/#frag",
                 "--canonicalize"]) == 0
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan_table(columns=["doc_id"]).num_rows == 0


# -- HTML → text (the first curation step on crawl payloads) -----------------

def test_html_to_text_extraction():
    from go_tfdata_ray.functions.text import html_to_text

    html_doc = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>body { color: red }</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<BODY><h1>Heading</h1>"
        "<p>First &amp; second &lt;para&gt;.</p>"
        "<!-- a comment with <p>markup</p> -->"
        "<div>block one</div><div>block two</div>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<noscript>enable js</noscript>"
        "spaced   out\ttext</BODY></html>")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(["h1", "plain"], pa.string()),
        "text": pa.array([html_doc, "already plain text"], pa.string()),
    }))
    out = html_to_text(ds).to_pandas().set_index("doc_id")

    got = out.loc["h1", "text"]
    # script/style/noscript/comments gone, entities unescaped
    assert "color: red" not in got and "not text" not in got
    assert "a comment" not in got and "enable js" not in got
    assert "First & second <para>." in got
    # block boundaries became newlines: words from different blocks
    # never fuse
    assert "block one\nblock two" in got
    assert "alpha\nbeta" in got
    assert got.startswith("T\nHeading")
    assert "spaced out text" in got  # whitespace runs collapsed

    # plain text passes through unchanged (mixed drops are safe); NOTE
    # extraction is one-pass by contract — unescaped entities can surface
    # markup-looking text a second pass would wrongly strip
    assert out.loc["plain", "text"] == "already plain text"


def test_html_to_text_out_col_and_crawl_chain(tmp_path):
    """WARC drop of HTML pages → extract → ingest: the tokens in the lake
    come from the EXTRACTED text."""
    from go_tfdata_ray.functions.text import html_to_text

    pages = [f"<html><body><p>page {i} body</p></body></html>"
             for i in range(4)]
    d = str(tmp_path / "h.warc.gz")
    warcmod.write_warc(d, ({"warc_type": "response", "uri": f"https://h/{i}",
                            "date": "2026-01-01T00:00:00Z",
                            "payload": b"HTTP/1.1 200 OK\r\n\r\n" + p.encode()}
                           for i, p in enumerate(pages)))
    docs = warcmod.read_warc(d).map_batches(
        lambda t: t.append_column("text", pa.array(
            [bytes(x).decode() for x in t["payload"].to_pylist()], pa.string())),
        batch_format="pyarrow")
    docs = html_to_text(docs)
    wal_dir = str(tmp_path / "wal")
    ingest.stage_drop(docs, wal_dir)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan_table(columns=["doc_id", "tokens"])
    assert got.num_rows == 4
    want = _expected_tokens("page 0 body", "https://h/0")
    by_id = {d: t for d, t in zip(got["doc_id"].to_pylist(),
                                  got["tokens"].to_pylist())}
    doc0 = ingest.doc_id_for_uri(["https://h/0"]).to_pylist()[0]
    assert by_id[doc0] == want


def test_http_body_dechunk_and_decompress(tmp_path):
    """Archived HTTP bodies keep their wire encodings — http_body undoes
    chunked transfer coding and gzip/deflate content codings from spec."""
    import zlib

    text = b"hello chunked world, " * 20

    def chunkify(b, sizes):
        out, pos = bytearray(), 0
        for s in sizes:
            part = b[pos:pos + s]
            if not part:
                break
            out += f"{len(part):x}".encode() + b";ext=1\r\n" + part + b"\r\n"
            pos += len(part)
        out += b"0\r\nX-Trailer: t\r\n\r\n"
        return bytes(out)

    chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: Chunked\r\n\r\n"
               + chunkify(text, [7, 100, 400]))
    assert warcmod.http_body(chunked) == text

    gz = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
          + gzip.compress(text))
    assert warcmod.http_body(gz) == text

    # chunked THEN gzip (transfer coding wraps the content coding)
    both = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            + chunkify(gzip.compress(text), [11, 1000]))
    assert warcmod.http_body(both) == text

    # deflate, both zlib-wrapped and raw
    raw_co = zlib.compressobj(wbits=-15)
    raw_blob = raw_co.compress(text) + raw_co.flush()
    for blob in (zlib.compress(text), raw_blob):
        d = b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + blob
        assert warcmod.http_body(d) == text

    # malformed chunking / bogus gzip: raw body survives, no crash
    bad = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nnot-hex\r\nx"
    assert warcmod.http_body(bad) == b"not-hex\r\nx"
    badgz = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip"
    assert warcmod.http_body(badgz) == b"not gzip"
    # TRUNCATED gzip (EOFError, not OSError) and a valid-header/corrupt-body
    # stream (zlib.error): the crawl-junk policy still keeps the raw body
    trunc = gzip.compress(text)[:10]
    tgz = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + trunc
    assert warcmod.http_body(tgz) == trunc
    corrupt = bytearray(gzip.compress(text))
    corrupt[12] ^= 0xFF  # flip a deflate-stream byte, keep the header
    cgz = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bytes(corrupt)
    assert warcmod.http_body(cgz) == bytes(corrupt)

    # end-to-end: a WARC response with a chunked+gzip body reads back as
    # the decoded text through read_warc's http_strip
    p = str(tmp_path / "enc.warc.gz")
    warcmod.write_warc(p, [{"warc_type": "response", "uri": "https://e/1",
                            "payload": both}])
    t = warcmod.read_warc(p).to_pandas()
    assert bytes(t.iloc[0]["payload"]) == text


def test_decode_text_charsets(tmp_path):
    dt = warcmod.decode_text
    assert dt("héllo".encode("utf-8")) == "héllo"
    assert dt(b"\xef\xbb\xbf" + "bom utf8".encode()) == "bom utf8"
    assert dt(b"\xff\xfe" + "u16".encode("utf-16-le")) == "u16"
    assert dt(b"\xfe\xff" + "u16b".encode("utf-16-be")) == "u16b"
    assert dt("héllo".encode("latin-1"),
              'text/html; charset="ISO-8859-1"') == "héllo"
    # unknown charset label falls through to utf-8/latin-1
    assert dt(b"plain", "text/html; charset=bogus-enc") == "plain"
    # invalid utf-8 with no hint: latin-1 total fallback, never raises
    assert dt(b"\xe9\xff") == "\xe9\xff".encode("latin-1").decode("latin-1")

    # the batch helper wires content_type per row
    t = pa.table({
        "payload": pa.array(["héllo".encode("latin-1"), "ütf".encode()],
                            pa.large_binary()),
        "content_type": pa.array(["text/html; charset=iso-8859-1", ""],
                                 pa.string()),
    })
    out = warcmod.decoded_text_column(t)
    assert out["text"].to_pylist() == ["héllo", "ütf"]
