"""1M HNSW build steps-cap attack (VERDICT r4 #3 / r3 #8 stretch):
the wave profile attributes ~60% of the 518s classic build to the
layer-0 insertion beam (ef=100, auto beam_steps=26, ~25ms/step/wave),
so cap it harder and measure build time + recall@10 ef=32 vs the
same-day classic control (518.2s @ 0.937, hnsw_build_inline_ab r5).

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_build_steps_ab.py
Env: N (1_000_000), Q (8192), STEPS ("13"), WAVE_CAP (2048),
EXPAND (8).
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
    n = int(os.environ.get("N", 1_000_000))
    q_n = int(os.environ.get("Q", 8_192))
    steps_list = [int(s) for s in os.environ.get("STEPS", "13").split(",")]
    wave_cap = int(os.environ.get("WAVE_CAP", 2048))
    expand = int(os.environ.get("EXPAND", 8))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    n_pad = round_up(n, 128)
    corpus = to_device(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)
    del corpus, ti

    results = []
    for steps in steps_list:
        times = []
        h = None
        for p in range(2):
            t0 = time.time()
            h = HNSWIndex.build_index_batched(
                12, 100, 32, 24, vectors, wave_cap=wave_cap,
                expand=expand, beam_steps=steps,
            )
            times.append(round(time.time() - t0, 1))
            log(f"steps={steps} pass{p}: {times[-1]}s "
                f"layers={h.get_num_nodes_in_layers()[:4]}")
        ids = np.asarray(h.search_batch(queries, 10).ids)
        rec = round(float(recall_at_k(ids, truth)), 4)
        log(f"steps={steps}: warm={times[-1]}s recall@10={rec}")
        results.append(dict(beam_steps=steps, cold_s=times[0],
                            warm_s=times[1], recall_at_10_ef32=rec))
        del h, ids

    rec_out = dict(ts=time.time(), what="hnsw_build_steps_ab", n=n, d=d,
                   q=q_n, canary_s=round(canary, 4), wave_cap=wave_cap,
                   expand=expand,
                   control="same-day classic auto steps=26: warm 518.2s "
                           "@ 0.937 (hnsw_build_inline_ab r5)",
                   results=results)
    with open(os.path.join(os.path.dirname(__file__), "tpu_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec_out) + "\n")
    print(json.dumps(rec_out), flush=True)


if __name__ == "__main__":
    main()
