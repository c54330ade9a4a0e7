"""1M x 300 HNSW with the DEFAULT config — the VERDICT r3 #3 criterion:
a user calling `build_index_batched(12, 100, 32, 24, vectors)` (the
reference's exact main.rs params, `vers/src/main.rs:70-79`) and then
`search_batch(q, 10)` must get the headline operating point
(>= 35k qps @ recall >= 0.985) with NO manual knobs — the size-aware
auto policy (config.nav_inline_dp="auto", beam_expand=None) does the
configuring.

Run from /root/repo, strictly serialized with other TPU jobs:
    python -u benchmarks/tpu_1m_hnsw_default.py
Env: N (1_000_000), Q (16384), AB (=1: also time the steps-uncapped
control on the same build).
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
    import jax.numpy as jnp

    from vers_tpu.core import round_up, to_device
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device, tunnel_canary

    canary = tunnel_canary()
    log(f"backend={jax.default_backend()} canary={canary:.4f}s/call")
    n = int(os.environ.get("N", 1_000_000))
    q_n = int(os.environ.get("Q", 16_384))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=4096, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    t0 = time.time()
    h = HNSWIndex.build_index_batched(12, 100, 32, 24, vectors)
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s layers={h.get_num_nodes_in_layers()}")

    n_pad = round_up(n, 128)
    corpus = to_device(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)
    del corpus, ti

    import dataclasses

    base_cfg = h.config
    variants = [("auto", base_cfg)]
    if os.environ.get("AB", "1") == "1":
        # the pre-steps-cap default (legacy max(4*ef,64) bound) on the
        # SAME build — the same-day A/B the auto-steps change is
        # judged by (2026-08-20 earlier window: 29.4k @ 0.9896)
        variants.append(
            ("steps_uncapped",
             dataclasses.replace(base_cfg, beam_steps=128)),
        )
    rec_out = dict(
        ts=time.time(),
        what="hnsw_1m_default_config",
        n=n, d=d, q=q_n, ef=32, build_s=round(build_s, 1),
        canary_s=round(canary, 4),
    )
    for name, cfg in variants:
        h.config = cfg
        h._device_cache = None  # drop the previous variant's tables
        res = h.search_batch(qd, 10)
        rec = recall_at_k(res.ids, truth)
        t, _ = timed_device(
            lambda: h.search_batch_device(qd, 10), warmup=1, iters=2,
            depth=8,
        )
        cache = h._device_cache
        inline = cache.get("inline")
        dp = int(inline["proj"].shape[1]) if inline else 0
        deg = int(cache["adjs"][0].shape[1])
        log(
            f"{name}: qps={q_n / t:.0f} recall@10={rec:.4f} "
            f"(inline dp={dp}, deg={deg})"
        )
        if name == "auto":
            rec_out.update(
                qps=round(q_n / t), recall=round(rec, 4), auto_dp=dp,
                auto_deg=deg,
            )
        else:
            rec_out[name] = dict(
                qps=round(q_n / t), recall=round(rec, 4), dp=dp, deg=deg
            )
        # Drop every local that pins this variant's device buffers —
        # without this the previous variant's ~4GB inline table stays
        # alive (via these refs) while the next variant allocates its
        # own, and the second search_batch dies RESOURCE_EXHAUSTED
        # (observed 2026-08-20, /tmp/hnsw1m_r4b.log).
        del res, cache, inline
    h.config = base_cfg
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec_out) + "\n")
    print(json.dumps(rec_out))


if __name__ == "__main__":
    main()
