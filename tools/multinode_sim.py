"""Multi-node readiness evidence for the object-store exchange primitives.

A single `ray.init(address="local")` box can't falsify the cross-node
assumptions in ``stages/exchange.py`` / the exchange joins (every object
lives in ONE shared local object store, so a task "fetching its shard's
slices" never crosses a node boundary). This script stands up a real
multi-raylet cluster on one machine — `ray start --head` + N worker
raylets, each with its OWN object store and CPU slice — and drives the
exchange-heavy pipelines across it:

- the headline CDC replay (fused per-shard apply tasks),
- ``join_bucketed`` (object-store exchange join),
- ``sessionize`` (exchange_group_map over user shards),
- ``cluster_duplicates_distributed`` (ref-passing label propagation).

Each query's result is checked against the same DuckDB oracle the driver
uses, so "ran across nodes" also means "still correct across nodes" —
slices produced on one raylet are consumed by finalize tasks scheduled on
another, exercising the inter-node object transfer path that local mode
skips. Results + timings land in stdout as one JSON line for BASELINE.md.

Usage:  python tools/multinode_sim.py [sf_dir] [n_workers] [cpus_per_node]
(defaults: /root/testdata/sf0.1, 2 workers + head, 8 cpus each).
Runs `ray stop --force` on exit — do not run concurrently with another Ray
session on this box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, os, sys, time
import ray
import ray.data as rd

ray.init(address="127.0.0.1:6379", log_to_driver=False)
rd.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})

nodes = [n for n in ray.nodes() if n["Alive"]]
out = {{"nodes": len(nodes),
        "cpus": int(ray.cluster_resources().get("CPU", 0))}}

from go_tfdata_ray.pipelines import queries as Q
import duckdb
import pandas as pd

sf_dir = {sf_dir!r}
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{{t}}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{p}}')")

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)

checks = {{}}
for name in ("join_bucketed", "sessionize", "dedup_clusters_planted"):
    walls = []
    for _ in range(2):  # first run absorbs worker warmup on every raylet
        t0 = time.perf_counter()
        res = Q.QUERIES[name](sf_dir)
        got = (res.to_pandas() if hasattr(res, "to_pandas")
               else pd.DataFrame(res))
        walls.append(time.perf_counter() - t0)
    want = con.execute(Q.ORACLE_SQL[name]).df()
    a, b = canon(got), canon(want)
    ok = a.shape == b.shape and bool(
        (a.values == b.values).all()) if a.shape == b.shape else False
    checks[name] = {{"cold_sec": round(walls[0], 3),
                     "warm_sec": round(walls[1], 3),
                     "rows": len(got), "match": bool(ok)}}

# headline replay across the cluster (fresh lake, sf-linked WAL)
from go_tfdata_ray.cdc.engine import CDCEngine
from go_tfdata_ray.sources import wal as walmod
wal_dir, files = walmod.ensure_wal_for_sf(sf_dir)
lake = "/tmp/graft_lake/multinode-sim"
import shutil
shutil.rmtree(lake, ignore_errors=True)
eng = CDCEngine(lake, num_partitions=16)
t0 = time.perf_counter()
stats = eng.apply_wal(wal_dir)
wall = time.perf_counter() - t0
n_events = sum(s.get("delta_rows", 0) for s in stats)
out["replay"] = {{"sec": round(wall, 3), "events": int(n_events),
                  "events_per_sec": round(n_events / wall, 1)}}
out["checks"] = checks
ray.shutdown()
print("MULTINODE_RESULT " + json.dumps(out))
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force the explicit cluster address
    env["PYTHONPATH"] = REPO

    def run(cmd, **kw):
        return subprocess.run(cmd, shell=True, env=env, check=True, **kw)

    run("ray stop --force >/dev/null 2>&1 || true")
    try:
        run(f"ray start --head --port=6379 --num-cpus={cpus} "
            f"--object-store-memory={2 * 10**9} --disable-usage-stats "
            ">/dev/null")
        for _ in range(n_workers):
            run(f"ray start --address=127.0.0.1:6379 --num-cpus={cpus} "
                f"--object-store-memory={2 * 10**9} --disable-usage-stats "
                ">/dev/null")
        time.sleep(3)
        script = DRIVER.format(repo=REPO, sf_dir=sf_dir)
        p = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=900)
        for line in p.stdout.splitlines():
            if line.startswith("MULTINODE_RESULT "):
                print(line)
                data = json.loads(line.split(" ", 1)[1])
                ok = all(c["match"] for c in data["checks"].values())
                return 0 if ok and data["nodes"] == n_workers + 1 else 1
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
        return 1
    finally:
        run("ray stop --force >/dev/null 2>&1 || true")


if __name__ == "__main__":
    raise SystemExit(main())
