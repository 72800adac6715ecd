"""Ingest-time data-quality expectations: routing, quarantine store, CLI."""

import json
import os

import pyarrow as pa
import pytest

import ray.data as rd

from go_tfdata_ray.cdc import expect as ex
from go_tfdata_ray.cdc import ingest
from go_tfdata_ray.cdc.engine import CDCEngine


def _docs(rows):
    return rd.from_arrow(pa.table({
        "uri": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "date": pa.array(["2026-01-01T00:00:00Z"] * len(rows), pa.string()),
    }))


# -- block-level evaluation ---------------------------------------------------

def test_apply_expectations_routing_and_priority():
    t = pa.table({
        "uri": ["https://a/1", "ftp://bad", None, "https://a/4", "https://a/5"],
        "text": ["long enough body", "also long enough", "x", "", "ok body here"],
    })
    rules = [ex.expect_url("uri"),           # charges rows 1 (ftp) and 2 (null)
             ex.expect_min_len("text", 5)]   # then row 3 ("" among survivors)
    passed, quar, counts = ex.apply_expectations(t, rules)
    assert passed["uri"].to_pylist() == ["https://a/1", "https://a/5"]
    assert counts == {"url:uri": 2, "min_len:text:5": 1}
    # first violated rule wins the label; later rules see only survivors
    lab = dict(zip(quar["uri"].to_pylist(), quar["_violation"].to_pylist()))
    assert lab["ftp://bad"] == "url:uri" and lab[None] == "url:uri"
    assert lab["https://a/4"] == "min_len:text:5"


def test_apply_expectations_warn_keeps_rows_and_counts():
    t = pa.table({"text": ["tiny", "long enough body"]})
    passed, quar, counts = ex.apply_expectations(
        t, [ex.expect_min_len("text", 10, on_fail="warn")])
    assert len(passed) == 2 and quar is None
    assert counts == {"min_len:text:10": 1}


def test_apply_expectations_fail_raises():
    t = pa.table({"text": ["", "ok"]})
    with pytest.raises(ex.ExpectationFailed, match="nonempty:text"):
        ex.apply_expectations(t, [ex.expect_nonempty("text", on_fail="fail")])


def test_null_result_counts_as_failure():
    # in_range over a non-numeric string → cast nulls → fail, not pass
    t = pa.table({"n": pa.array([1.0, 50.0, None], pa.float64())})
    passed, quar, counts = ex.apply_expectations(
        t, [ex.expect_in_range("n", 0, 10)])
    assert passed["n"].to_pylist() == [1.0]
    assert counts["in_range:n:0:10"] == 2


def test_parse_expect_spec_grammar():
    r = ex.parse_expect_spec("minlen:text:20")
    assert r.name == "min_len:text:20" and r.on_fail == "quarantine"
    r = ex.parse_expect_spec("match:uri:^https://x:8080/=warn")
    assert r.on_fail == "warn"  # regex keeps its own colons
    ok = r.passes(pa.table({"uri": ["https://x:8080/a", "https://y/a"]}))
    assert ok.to_pylist() == [True, False]
    # '=' INSIDE a match regex is data, not a policy suffix (query strings)
    r = ex.parse_expect_spec(r"match:uri:[?&]id=\d+")
    assert r.on_fail == "quarantine"
    ok = r.passes(pa.table({"uri": ["https://x/p?id=7", "https://x/p?id=x"]}))
    assert ok.to_pylist() == [True, False]
    assert ex.parse_expect_spec("url:uri=fail").on_fail == "fail"
    assert ex.parse_expect_spec("range:n:0:1").name == "in_range:n:0.0:1.0"
    for bad in ("minlen:text", "nope:uri", "minlen:text:x", "url:uri=boom",
                "match:uri:", "minlen:text:20=wrn"):
        with pytest.raises(ValueError):
            ex.parse_expect_spec(bad)


# -- stage_drop integration ---------------------------------------------------

def test_stage_drop_quarantines_and_lake_gets_passing_rows(tmp_path):
    wal_dir = str(tmp_path / "wal")
    rows = [(f"https://site/{i}", f"document body number {i} with length")
            for i in range(20)]
    rows += [("https://site/empty", "   "),          # nonempty violation
             ("gopher://old/1", "fine body here"),   # url violation
             ("https://site/short", "tiny")]         # minlen violation
    out = ingest.stage_drop(
        _docs(rows), wal_dir,
        expectations=[ex.expect_url("uri"), ex.expect_nonempty("text"),
                      ex.expect_min_len("text", 10)])
    assert out["rows"] == 20 and out["quarantined"] == 3
    assert out["violations"] == {"url:uri": 1, "nonempty:text": 1,
                                 "min_len:text:10": 1}

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    got = eng.scan(columns=["doc_id"]).to_pandas()
    assert len(got) == 20

    q = ex.read_quarantine(wal_dir).to_pandas()
    assert len(q) == 3 and set(q["_epoch"]) == {out["epoch"]}
    by_uri = q.set_index("uri")["_violation"]
    assert by_uri["https://site/empty"] == "nonempty:text"
    assert by_uri["gopher://old/1"] == "url:uri"
    assert by_uri["https://site/short"] == "min_len:text:10"


def test_stage_drop_fail_policy_abandons_claim(tmp_path):
    wal_dir = str(tmp_path / "wal")
    bad = _docs([("https://a/1", "good body here"), ("https://a/2", "")])
    with pytest.raises(Exception, match="nonempty:text"):
        ingest.stage_drop(bad, wal_dir,
                          expectations=[ex.expect_nonempty("text",
                                                           on_fail="fail")])
    # the claim is tombstoned, not left open to block the ordering barrier
    names = sorted(os.listdir(wal_dir))
    assert "epoch-00000.vacuumed" in names and "epoch-00000" not in names
    assert ex.read_quarantine(wal_dir).count() == 0

    # the next drop claims a FRESH id and applies cleanly
    ok = ingest.stage_drop(_docs([("https://a/3", "good body three")]), wal_dir)
    assert ok["epoch"] == 1
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan(columns=["doc_id"]).count() == 1


def test_stage_drop_expectations_retry_idempotent(tmp_path):
    wal_dir = str(tmp_path / "wal")
    rows = [("https://a/1", "body long enough one"),
            ("https://a/2", "nope"),
            ("https://a/3", "body long enough three")]
    exps = [ex.expect_min_len("text", 10)]
    r1 = ingest.stage_drop(_docs(rows), wal_dir, epoch=0, expectations=exps)
    seg1 = sorted(os.listdir(r1["seg_dir"]))  # includes the quar-* sidecars
    assert any(f.startswith("quar-") for f in seg1)
    r2 = ingest.stage_drop(_docs(rows), wal_dir, epoch=0, expectations=exps)
    assert sorted(os.listdir(r2["seg_dir"])) == seg1
    assert r1["rows"] == r2["rows"] == 2
    assert r1["quarantined"] == r2["quarantined"] == 1


def test_quarantine_shard_names_digest_payload(tmp_path):
    """Two blocks with the SAME (key, violation) pairs but different
    payloads must land in distinct shards (a later block must not silently
    overwrite an earlier one); identical tables stay retry-idempotent."""
    seg = str(tmp_path / "seg")
    os.makedirs(seg)
    a = pa.table({"uri": ["u1"], "text": ["payload A"],
                  "_violation": ["nonempty:text"]})
    b = pa.table({"uri": ["u1"], "text": ["payload B"],
                  "_violation": ["nonempty:text"]})
    p1 = ex.write_quarantine_shard(a, seg)
    p2 = ex.write_quarantine_shard(b, seg)
    p3 = ex.write_quarantine_shard(a, seg)  # retry: same bytes, same file
    assert p1 != p2 and p1 == p3
    assert len([f for f in os.listdir(seg) if f.startswith("quar-")]) == 2


def test_all_quarantined_drop_does_not_wedge_consumers(tmp_path):
    """A drop whose rows are ALL quarantined seals a zero-shard segment;
    the consumer must commit it as a zero-row epoch and keep advancing
    (feeding [] to the reader used to wedge the feed forever)."""
    wal_dir = str(tmp_path / "wal")
    bad = _docs([("https://a/1", "  "), ("https://a/2", "")])
    out = ingest.stage_drop(bad, wal_dir,
                            expectations=[ex.expect_nonempty("text")])
    assert out["rows"] == 0 and out["quarantined"] == 2
    ok = ingest.stage_drop(_docs([("https://a/3", "good body three")]), wal_dir)
    assert ok["epoch"] == out["epoch"] + 1

    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.scan(columns=["doc_id"]).count() == 1
    assert eng.manifest.committed_epoch == ok["epoch"]
    # the quarantined rows stay queryable under the sealed empty epoch
    q = ex.read_quarantine(wal_dir, epoch=out["epoch"]).to_pandas()
    assert len(q) == 2 and set(q["_violation"]) == {"nonempty:text"}
    # idempotent re-tail
    before = eng.manifest.version
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    assert eng.manifest.version == before


def test_cli_ingest_expect_and_quarantine(tmp_path, capsys):
    from go_tfdata_ray.cdc.cli import main

    p = str(tmp_path / "drop.jsonl")
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"uri": f"https://c/{i}",
                                "text": f"cli body number {i} long enough",
                                "date": "2026-01-01T00:00:00Z"}) + "\n")
        f.write(json.dumps({"uri": "https://c/bad", "text": "x",
                            "date": "2026-01-01T00:00:00Z"}) + "\n")
    wal_dir = str(tmp_path / "wal")
    rc = main(["ingest", "--wal", wal_dir, "--jsonl", p,
               "--expect", "minlen:text:10"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] == 5 and out["quarantined"] == 1

    rc = main(["quarantine", "--wal", wal_dir])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and rep["rows"] == 1
    assert rep["by_rule"] == {"min_len:text:10": 1}

    # fail policy through the CLI surfaces as structured JSON, exit 3
    rc = main(["ingest", "--wal", wal_dir, "--jsonl", p,
               "--expect", "minlen:text:10=fail"])
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3 and err["error"] == "expectation_failed"
    assert "min_len:text:10" in err["detail"]


# -- lake-wide audit ----------------------------------------------------------

def test_count_expectations_priority_semantics():
    """Counting twin of apply_expectations: a quarantine rule's violators
    leave the view of later rules; warn violators stay visible."""
    t = pa.table({
        "uri": ["https://a/1", "ftp://bad", "https://a/3"],
        "text": ["x", "y", "long enough body"],
    })
    # quarantine url first: ftp row leaves before min_len sees it
    c = ex.count_expectations(
        t, [ex.expect_url("uri"), ex.expect_min_len("text", 5)])
    assert c == {"url:uri": 1, "min_len:text:5": 1}
    # warn url first: ftp row STAYS, so min_len charges both short rows
    c = ex.count_expectations(
        t, [ex.expect_url("uri", on_fail="warn"),
            ex.expect_min_len("text", 5)])
    assert c == {"url:uri": 1, "min_len:text:5": 2}
    # empty block: every rule still reports a zero
    c = ex.count_expectations(t.slice(0, 0), [ex.expect_url("uri")])
    assert c == {"url:uri": 0}


def test_audit_expectations_distributed_and_engine_surface(tmp_path):
    rows = [(f"https://a/{i}",
             "short" if i % 7 == 0 else f"document body number {i} padded out")
            for i in range(200)]
    ds = _docs(rows).repartition(8)
    rules = [ex.expect_min_len("text", 10, on_fail="warn"),
             ex.expect_matches("text", "padded", on_fail="warn")]
    out = ex.audit_expectations(ds, rules).to_pandas()
    n_short = sum(1 for i in range(200) if i % 7 == 0)
    # declared rule order, exact distributed counts
    assert list(out["rule"]) == ["min_len:text:10", "matches:text"]
    assert list(out["violations"]) == [n_short, n_short]

    # engine.audit() runs the same counts over the merged live view.
    # stage_drop TOKENIZES text away (lake columns: doc_id/tokens/n_tok/
    # source/uri), so lake-side rules target the stored columns.
    wal_dir = str(tmp_path / "wal")
    ingest.stage_drop(_docs(rows), wal_dir)
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)
    lake_rules = [ex.expect_in_range("n_tok", 2, 100, on_fail="warn"),
                  ex.expect_min_len("uri", 12, on_fail="warn")]
    got = eng.audit(lake_rules, columns=["n_tok", "uri"]).to_pandas()
    n_short_uri = sum(1 for i in range(200) if len(f"https://a/{i}") < 12)
    assert list(got["violations"]) == [n_short, n_short_uri]
    # filtered snapshot audits the filtered view only
    got = eng.audit([ex.expect_in_range("n_tok", 2, 100, on_fail="warn")],
                    columns=["n_tok"],
                    where=[("n_tok", "<", 2)]).to_pandas()
    assert list(got["violations"]) == [n_short]
    # a requested column absent from EVERY fragment reads back as nulls
    # with the full row count (add-column evolution contract) — never a
    # silent 0-row scan
    t = eng.scan_table(columns=["doc_id", "text"])
    assert t.num_rows == 200 and t["text"].null_count == 200


def test_cli_audit_counts_and_derived_columns(tmp_path, capsys):
    """CLI audit: rule-violation counts over the merged live view, scan
    columns derived from the rule specs (n_tok/uri are lake columns)."""
    from go_tfdata_ray.cdc.cli import main

    rows = [(f"https://a/{i}", "tiny" if i % 4 == 0
             else f"cli audit body number {i} padded")
            for i in range(40)]
    wal_dir, lake = str(tmp_path / "wal"), str(tmp_path / "lake")
    ingest.stage_drop(_docs(rows), wal_dir)
    eng = CDCEngine(lake, num_partitions=2)
    eng.tail(wal_dir, idle_limit=1, poll_secs=0.01)

    rc = main(["audit", "--lake", lake,
               "--expect", "range:n_tok:2:99",
               "--expect", "url:uri"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_tiny = sum(1 for i in range(40) if i % 4 == 0)
    assert rc == 0
    assert out["violations"] == {"in_range:n_tok:2.0:99.0": n_tiny,
                                 "url:uri": 0}
    assert out["at_version"] == eng.manifest.version

    # where-filtered audit counts only the matching live rows
    rc = main(["audit", "--lake", lake, "--expect", "range:n_tok:2:99",
               "--where", "n_tok:<:2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and list(out["violations"].values()) == [n_tiny]
