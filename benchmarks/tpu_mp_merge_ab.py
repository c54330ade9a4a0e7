"""A/B the tournament cross-probe merge (VERDICT r4 #5) at nprobe=8:
batched pairwise rank-selects vs the flat topk_smallest sort path that
w = p*k > 64 used to take. Identical outputs (bit-tested incl. tie
order in tests/test_fused_binned.py); the A/B is pure throughput.

The toggle is env VERS_MERGE_TOURNAMENT (read at trace time), so each
variant runs in its own subprocess against the same on-disk compile
cache; the parent compares.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_mp_merge_ab.py
Env: BENCH_N (100000), BENCH_D (300), BENCH_Q (16384), BENCH_K (256),
NPROBES ("8,4"), VERS_PLATFORM.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from vers_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()
import jax
if os.environ.get("VERS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
import jax.numpy as jnp
from vers_tpu.index.ivfflat import IVFFlatIndex
from vers_tpu.ops import binned
from vers_tpu.ops.pallas_topk import distance_topk
from vers_tpu.utils.data import synthetic_gaussian
from vers_tpu.utils.harness import recall_at_k
from vers_tpu.utils.profiling import timed_device, tunnel_canary

n, d, q_n, k = %(n)d, %(d)d, %(q)d, %(k)d
nprobes = %(nprobes)r
canary = tunnel_canary()
print(f"child tournament={os.environ.get('VERS_MERGE_TOURNAMENT','1')} "
      f"canary={canary:.4f}", file=sys.stderr, flush=True)
vectors, queries = synthetic_gaussian(
    n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
    query_noise=0.5)
idx = IVFFlatIndex.build_index(k, 1, 8, vectors)
layout = idx._ensure_layout()
qd = jnp.asarray(queries)
_, ti = distance_topk(qd, jnp.asarray(vectors), n, 10)
truth = np.asarray(ti)
out = {}
for p in nprobes:
    fn = lambda q, p=p: binned.binned_topk_pallas(
        q, idx._centroids_dev, p, layout, top_k=10)
    t, res = timed_device(fn, qd, depth=8)
    ids = np.asarray(res[1])
    out[str(p)] = dict(
        qps=int(q_n / t),
        recall=round(float(recall_at_k(ids, truth)), 4),
        ids_hash=int(np.sum(
            ids.astype(np.int64).ravel()
            * (np.arange(ids.size, dtype=np.int64) * 2654435761 + 1)
        ) %% np.int64(2**61 - 1)),
    )
    print(f"nprobe={p}: {out[str(p)]}", file=sys.stderr, flush=True)
print(json.dumps(dict(canary=round(canary, 4), results=out)), flush=True)
"""


def run_child(tournament: str, n, d, q, k, nprobes):
    env = dict(os.environ, VERS_MERGE_TOURNAMENT=tournament)
    script = CHILD % dict(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        n=n, d=d, q=q, k=k, nprobes=nprobes,
    )
    r = subprocess.run(
        [sys.executable, "-u", "-c", script], env=env,
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        raise RuntimeError(f"child rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    n = int(os.environ.get("BENCH_N", 100_000))
    d = int(os.environ.get("BENCH_D", 300))
    q_n = int(os.environ.get("BENCH_Q", 16384))
    k = int(os.environ.get("BENCH_K", 256))
    nprobes = [int(s) for s in os.environ.get("NPROBES", "8,4").split(",")]

    old = run_child("0", n, d, q_n, k, nprobes)
    new = run_child("1", n, d, q_n, k, nprobes)
    results = {}
    for p in nprobes:
        o, w = old["results"][str(p)], new["results"][str(p)]
        assert o["ids_hash"] == w["ids_hash"], f"outputs differ at nprobe={p}"
        results[f"nprobe{p}"] = dict(
            qps_sort=o["qps"], qps_tournament=w["qps"],
            recall=w["recall"], identical=True,
        )
    rec = dict(ts=time.time(), what="ivf_merge_tournament_ab", n=n, d=d,
               q=q_n, k=k, canary_old=old["canary"], canary_new=new["canary"],
               results=results)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
