"""A/B the HNSW BUILD layer-0 insertion beam: classic gather beam vs
the neighborhood-inlined beam (build_graph(insert_inline=True), the
build-side D17 — VERDICT r3 #8 stretch) at the reference's
main.rs:70-79 params.

Each mode builds twice (cold-with-cache, then warm) and reports warm
wall-clock + recall@10 at ef=32 over the batched query path. Same-day
pairing only — the tunnel's throughput swings ~2.5x day to day.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_build_inline_ab.py
Env: N (default 131072), Q (default 8192), MODES ("classic,inline"),
INLINE_DP (32), INLINE_R (64), INLINE_STEPS (0 = inherit beam_steps),
WAVE_CAP (2048), EXPAND (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from vers_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if os.environ.get("VERS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
    import jax.numpy as jnp

    from vers_tpu.core import round_up, to_device
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import tunnel_canary

    canary = tunnel_canary()
    log(f"backend={jax.default_backend()} canary={canary:.4f}s/call")
    n = int(os.environ.get("N", 131_072))
    q_n = int(os.environ.get("Q", 8_192))
    modes = os.environ.get("MODES", "classic,inline").split(",")
    dp = int(os.environ.get("INLINE_DP", 32))
    refine = int(os.environ.get("INLINE_R", 64))
    isteps = int(os.environ.get("INLINE_STEPS", 0))
    wave_cap = int(os.environ.get("WAVE_CAP", 2048))
    expand = int(os.environ.get("EXPAND", 8))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(n, 128)
    # sliced upload: a single >~1GB transfer wedges the tunnel (1M x 300)
    corpus = to_device(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)
    del corpus, ti

    results = []
    for mode in modes:
        kw = dict(wave_cap=wave_cap, expand=expand)
        if mode == "inline":
            kw.update(insert_inline=True, inline_dp=dp, inline_refine=refine)
            if isteps:
                kw["inline_steps"] = isteps
        times = []
        h = None
        for p in range(2):
            t0 = time.time()
            h = HNSWIndex.build_index_batched(12, 100, 32, 24, vectors, **kw)
            times.append(round(time.time() - t0, 1))
            log(f"{mode} pass{p}: {times[-1]}s layers={h.get_num_nodes_in_layers()}")
        ids = np.asarray(h.search_batch(queries, 10).ids)
        rec = round(float(recall_at_k(ids, truth)), 4)
        log(f"{mode}: warm={times[-1]}s recall@10={rec}")
        results.append(dict(mode=mode, cold_s=times[0], warm_s=times[1],
                            recall_at_10_ef32=rec))
        del h, ids

    rec_out = dict(ts=time.time(), what="hnsw_build_inline_ab", n=n, d=d,
                   q=q_n, canary_s=round(canary, 4), inline_dp=dp,
                   inline_refine=refine, inline_steps=isteps,
                   wave_cap=wave_cap, expand=expand, results=results)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec_out) + "\n")
    print(json.dumps(rec_out), flush=True)


if __name__ == "__main__":
    main()
