"""Soak harness: 24M-event WAL, kill -9 mid-apply, resume from manifest, verify final state vs DuckDB. Run: python tools/soak.py (wipes /dev/shm/soak_*)."""
import json, os, shutil, signal, subprocess, sys, time

REPO = "/root/repo"
WAL, LAKE = "/dev/shm/soak_wal", "/dev/shm/soak_lake"
env = dict(os.environ, PYTHONPATH=REPO)

shutil.rmtree(LAKE, ignore_errors=True)
t0 = time.time()
subprocess.run([sys.executable, "-m", "go_tfdata_ray.cdc.cli", "generate-wal",
                "--wal", WAL, "--events", "24000000", "--epochs", "4", "--parallel"],
               env=env, check=True, cwd=REPO, capture_output=True)
print("gen_wal_sec", round(time.time() - t0, 1), flush=True)

# phase 1: start apply, kill -9 mid-flight
p = subprocess.Popen([sys.executable, "-m", "go_tfdata_ray.cdc.cli", "apply",
                      "--wal", WAL, "--lake", LAKE, "--partitions", "64"],
                     env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
time.sleep(14)  # mid-replay (warmup ~6s + a couple epochs)
p.send_signal(signal.SIGKILL)
p.wait()
print("killed mid-apply", flush=True)
time.sleep(3)
import glob
manifests = sorted(glob.glob(f"{LAKE}/_manifests/manifest-v*.json"))
print("manifests after crash:", len(manifests), flush=True)

# phase 2: resume
t0 = time.time()
out = subprocess.run([sys.executable, "-m", "go_tfdata_ray.cdc.cli", "apply",
                      "--wal", WAL, "--lake", LAKE, "--partitions", "64"],
                     env=env, check=True, cwd=REPO, capture_output=True, text=True)
resume_sec = time.time() - t0
line = json.loads(out.stdout.strip().splitlines()[-1])
print("resume:", line, "resume_sec", round(resume_sec, 1), flush=True)
assert line["committed_epoch"] == 3, line

# phase 3: verify merged state vs DuckDB over the raw WAL
t0 = time.time()
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, REPO)
from go_tfdata_ray.cdc.engine import CDCEngine
import pandas as pd
eng = CDCEngine(LAKE)
got = (
    eng.scan(columns=["doc_id", "n_tok", "source"])
    .map_batches(lambda df: df.groupby("source", as_index=False).agg(
        n=("doc_id", "size"), tok=("n_tok", "sum")), batch_format="pandas")
    .to_pandas().groupby("source", as_index=False).sum()
)
scan_sec = time.time() - t0
ray.shutdown()
import duckdb
want = duckdb.sql(f"""
  WITH last AS (SELECT * FROM read_parquet('{WAL}/epoch-*/shard-*.parquet')
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1)
  SELECT source, COUNT(*) AS n, SUM(n_tok) AS tok FROM last WHERE op <> 'D'
  GROUP BY source ORDER BY source
""").df()
got = got.sort_values("source").reset_index(drop=True)
want = want.sort_values("source").reset_index(drop=True)
assert (got["n"].astype(int).values == want["n"].astype(int).values).all(), (got, want)
assert (got["tok"].astype(int).values == want["tok"].astype(int).values).all()
print("verified vs duckdb:", got.to_dict("records"), "scan_sec", round(scan_sec, 1), flush=True)
print("SOAK PASS", flush=True)
shutil.rmtree(LAKE, ignore_errors=True); shutil.rmtree(WAL, ignore_errors=True)
