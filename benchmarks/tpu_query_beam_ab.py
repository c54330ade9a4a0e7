"""A/B the HNSW *query* beam knobs (expand_per_step, max_steps cap).

The batched query path (`index/hnsw.py _search_batch_rows`) uses
expand_per_step=4 and max_steps=max(4*ef, 64). The build-side A/B
(tpu_results.jsonl 2026-08-17) showed expand=8 + a steps cap is a big
win for construction beams; this probe measures the same knobs on the
query side at ef_search=32 / ef_route=8.

Builds one 20k index (warm batched build), then times
search_batch_device (pipelined depth=8) for each (expand, cap) combo by
wrapping `beam_search_layer`, and reports recall@10 per combo so
accuracy losses are visible.

Run from /root/repo, serialized with other TPU jobs:
    python -u benchmarks/tpu_query_beam_ab.py
Env: N (default 20000), Q (default 16384), EF (default 32).
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

    from vers_tpu.core import round_up
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k
    from vers_tpu.utils.profiling import timed_device

    log(f"backend={jax.default_backend()}")
    n = int(os.environ.get("N", 20_000))
    q_n = int(os.environ.get("Q", 16_384))
    ef = int(os.environ.get("EF", 32))
    d = 300
    vectors, queries = synthetic_gaussian(
        n, d, n_clusters=1024, n_queries=q_n, seed=0, normalized=True,
        query_noise=0.5,
    )
    t0 = time.time()
    h = HNSWIndex.build_index_batched(8, 100, ef, 16, vectors, wave_cap=2048)
    log(f"build: {time.time() - t0:.1f}s layers={h.get_num_nodes_in_layers()}")

    n_pad = round_up(n, 128)
    corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
    qd = jnp.asarray(queries)
    _, ti = distance_topk(qd, corpus, n, 10)
    truth = np.asarray(ti)

    import dataclasses

    base_cfg = h.config
    results = []
    # (expand, steps_cap): None = current defaults
    combos = [
        ("default e=4 cap=4ef", 4, None),
        ("e=8 cap=4ef", 8, None),
        ("e=4 cap=24", 4, 24),
        ("e=8 cap=24", 8, 24),
        ("e=8 cap=16", 8, 16),
        ("e=4 cap=16", 4, 16),
    ]
    for name, e, cap in combos:
        h.config = dataclasses.replace(base_cfg, beam_expand=e,
                                       beam_steps=cap)
        # warm compile + recall
        bd, bi = h.search_batch_device(qd, 10)
        rec = recall_at_k(
            np.where(np.asarray(bi) >= 0, np.asarray(bi), -1), truth
        )
        t, _ = timed_device(
            lambda: h.search_batch_device(qd, 10)[1],
            warmup=1, iters=3, depth=8,
        )
        qps = q_n / t
        log(f"{name}: {t*1e3:.1f} ms/batch  {qps/1e3:.1f}k qps  "
            f"recall {float(rec):.4f}")
        results.append(dict(name=name, expand=e, cap=cap,
                            ms=round(t * 1e3, 1),
                            qps=round(qps),
                            recall_at_10=round(float(rec), 4)))
    h.config = base_cfg

    print(json.dumps(dict(config="hnsw-query-beam-ab", n=n, d=d, q=q_n,
                          ef=ef, results=results, ts="2026-08-17")),
          flush=True)


if __name__ == "__main__":
    main()
