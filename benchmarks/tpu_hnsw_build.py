"""HNSW device-build timing probe (verdict r1 item 2).

Phase A: 100k x 300 at the probe params (8, 100, 32, 16), built twice
         (cold-with-cache, then warm) + ef=32 recall check.
Phase B: 1M x 300 at the reference's main.rs:70-79 params
         (L=12, efc=100, M=24), corpus synthesized ON DEVICE
         (host->device of 1.2GB wedges the tunnel), one build, layer
         stats + recall probe.

Emits one JSON line per phase on stdout; run with python -u from
/root/repo, strictly serialized with other TPU jobs.

Env: PHASE=A|B|AB (default A), N1M overrides the phase-B corpus size.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from vers_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if os.environ.get("VERS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VERS_PLATFORM"])
    import jax.numpy as jnp
    from vers_tpu.core import round_up
    from vers_tpu.index.hnsw import HNSWIndex
    from vers_tpu.ops.pallas_topk import distance_topk
    from vers_tpu.utils.data import synthetic_gaussian
    from vers_tpu.utils.harness import recall_at_k

    log(f"backend={jax.default_backend()}")
    phase = os.environ.get("PHASE", "A")

    if "V" in phase:
        # variant sweep: raw build_graph timing at 100k, expand/route
        # from env (EXPAND, ROUTE); two passes (cold-with-cache, warm)
        from vers_tpu.ops.hnsw_build import build_graph

        expand = int(os.environ.get("EXPAND", 4))
        route = os.environ.get("ROUTE", "1") == "1"
        nav = os.environ.get("NAV", "bfloat16")
        wave_cap = int(os.environ.get("WAVE_CAP", 2048))
        dedup = os.environ.get("DEDUP", "1") == "1"
        steps_env = os.environ.get("STEPS", "auto")
        steps = "auto" if steps_env == "auto" else (int(steps_env) or None)
        rsteps = int(os.environ.get("ROUTE_STEPS", 0)) or None
        rexpand = int(os.environ.get("ROUTE_EXPAND", 4))
        n, d = 100_000, 300
        vectors, queries = synthetic_gaussian(
            n, d, n_clusters=1024, n_queries=4096, seed=0, normalized=True,
            query_noise=0.5,
        )
        times = []
        for p in range(2):
            t0 = time.time()
            ins, layers = build_graph(
                vectors, 8, 100, 16, wave_cap=wave_cap, expand=expand,
                route_expand=rexpand, route_layers=route, nav_dtype=nav,
                dedup_self=dedup, beam_steps=steps, route_steps=rsteps,
            )
            times.append(time.time() - t0)
            log(f"variant expand={expand} rexpand={rexpand} route={route} "
                f"nav={nav} cap={wave_cap} dedup={dedup} steps={steps} "
                f"rsteps={rsteps} pass {p}: {times[-1]:.1f}s")
        # recall probe: assemble the index from the built layers
        idx = HNSWIndex(100, 32, 8, 16)
        idx._vecs = vectors.copy()
        idx._rows_used = n
        idx._id_row = {i: i for i in range(n)}
        idx.dim = d
        from vers_tpu.index.hnsw import _Layer
        from vers_tpu.models.candidates import AdjacencyItem

        for l, layer_map in enumerate(layers):
            layer = _Layer()
            for gid, nbrs in layer_map.items():
                item = AdjacencyItem()
                for cid, dist in nbrs:
                    item.insert(int(cid), float(dist))
                item.neighbours = set(int(c) for c, _ in nbrs)
                layer.adjacency[int(gid)] = item
            idx.layers[l] = layer
        n_pad = round_up(n, 128)
        corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
        qd = jnp.asarray(queries)
        _, ti = distance_topk(qd, corpus, n, 10)
        rec = recall_at_k(idx.search_batch(qd, 10).ids, np.asarray(ti))
        emit(config="hnsw-build-variant", n=n, d=d, expand=expand,
             route_expand=rexpand,
             route=route, nav=nav, wave_cap=wave_cap, dedup=dedup,
             steps=steps, route_steps=rsteps,
             build_s_cold=round(times[0], 1),
             build_s_warm=round(times[1], 1),
             recall_at_10_ef32=round(float(rec), 4),
             layers=[len(l) for l in layers], ts=time.strftime("%Y-%m-%d"))
        return

    if "A" in phase:
        n, d = 100_000, 300
        vectors, queries = synthetic_gaussian(
            n, d, n_clusters=1024, n_queries=4096, seed=0, normalized=True,
            query_noise=0.5,
        )
        t0 = time.time()
        h = HNSWIndex.build_index_batched(8, 100, 32, 16, vectors,
                                          wave_cap=2048)
        cold_s = time.time() - t0
        log(f"100k build pass 1 (incl compiles): {cold_s:.1f}s")
        t0 = time.time()
        h = HNSWIndex.build_index_batched(8, 100, 32, 16, vectors,
                                          wave_cap=2048)
        warm_s = time.time() - t0
        log(f"100k build pass 2 (warm): {warm_s:.1f}s")
        n_pad = round_up(n, 128)
        corpus = jnp.asarray(np.pad(vectors, ((0, n_pad - n), (0, 0))))
        qd = jnp.asarray(queries)
        _, ti = distance_topk(qd, corpus, n, 10)
        truth = np.asarray(ti)
        res = h.search_batch(qd, 10)
        rec = recall_at_k(res.ids, truth)
        emit(config="wiki-hnsw-100k-device", n=n, d=d,
             engine="wave build expand=8 route-beam",
             build_s_cold=round(cold_s, 1), build_s_warm=round(warm_s, 1),
             recall_at_10_ef32=round(float(rec), 4),
             layers=h.get_num_nodes_in_layers(), ts=time.strftime("%Y-%m-%d"))

    if "B" in phase:
        from vers_tpu.utils.profiling import timed_device

        n = int(os.environ.get("N1M", 1_000_000))
        d = 300
        n_pad = round_up(n, 128)
        key = jax.random.PRNGKey(0)
        # clustered corpus on device (matches the synthetic_gaussian
        # recipe shape-wise; clustering affects beam convergence)
        kc, kx, kq = jax.random.split(key, 3)
        n_clusters = 4096
        # device re-enactment of utils.data.synthetic_gaussian: centers
        # scaled 2x, query noise added to the UNNORMALIZED corpus point
        # (raw norm ~sqrt(5d)) before renormalizing. Adding 0.5*N(0,I)
        # to an already unit-norm row buries the signal under ~8.7x
        # noise and makes queries near-random — that bug produced a
        # bogus 0.085 "recall collapse" at 1M (the graph was fine).
        centers = 2.0 * jax.random.normal(kc, (n_clusters, d), jnp.float32)
        assign = jax.random.randint(kx, (n_pad,), 0, n_clusters)
        raw = centers[assign] + jax.random.normal(
            jax.random.fold_in(key, 7), (n_pad, d), jnp.float32
        )
        vecs = raw / jnp.linalg.norm(raw, axis=1, keepdims=True)
        # queries: UNNORMALIZED corpus points + noise, then renormalize
        nq = 4096
        qrows = jax.random.randint(jax.random.fold_in(key, 11), (nq,), 0, n)
        qd = raw[qrows] + 0.5 * jax.random.normal(kq, (nq, d), jnp.float32)
        qd = qd / jnp.linalg.norm(qd, axis=1, keepdims=True)
        del raw, centers
        _ = np.asarray(qd[:1])  # real sync (block_until_ready is a no-op)
        log("1M corpus synthesized on device")

        wave_cap = int(os.environ.get("WAVE_CAP", 2048))
        t0 = time.time()
        # fully device-resident build (the corpus never crosses the
        # tunnel; graph arrays come back as part of the build)
        idx = HNSWIndex.build_index_device(12, 100, 32, 24, vecs,
                                           n_valid=n, wave_cap=wave_cap)
        _ = np.asarray(vecs[:1])
        build_s = time.time() - t0
        layer_counts = idx.get_num_nodes_in_layers()
        log(f"1M build: {build_s:.1f}s layers={layer_counts}")

        # optional graph snapshot for query-side iteration w/o rebuilds
        save_to = os.environ.get("GRAPH_SAVE")
        if save_to:
            arrs = {}
            for l, (mem, adj, dist) in enumerate(idx._pending_graph):
                arrs[f"mem{l}"] = mem
                arrs[f"adj{l}"] = adj
                arrs[f"dist{l}"] = dist
            np.savez(save_to, n=n, layers=len(idx._pending_graph), **arrs)
            log(f"graph saved to {save_to}")

        # recall + throughput probe, ef sweep
        _, ti = distance_topk(qd, vecs, n, 10)
        truth = np.asarray(ti)
        probes = {}
        for ef in (32, 64):
            idx.ef_search = ef
            idx._device_cache = None
            sec, res = timed_device(
                idx.search_batch_device, qd, 10, warmup=1, iters=3, depth=8
            )
            rec = recall_at_k(np.asarray(res[1]), truth)
            qps = nq / sec
            probes[ef] = (rec, qps)
            log(f"1M query ef={ef}: recall@10={rec:.4f} qps={qps:,.0f}")

        emit(config="wiki1m-hnsw-device-build", n=n, d=d,
             params="L=12 efc=100 M=24 (main.rs:70-79)",
             engine="wave build expand=8 bf16-nav route-beam steps-cap "
                    "device-resident",
             wave_cap=wave_cap,
             build_s=round(build_s, 1), layers=layer_counts,
             recall_at_10_ef32=round(float(probes[32][0]), 4),
             qps_ef32_depth8=round(probes[32][1]),
             recall_at_10_ef64=round(float(probes[64][0]), 4),
             qps_ef64_depth8=round(probes[64][1]),
             ts=time.strftime("%Y-%m-%d"))


if __name__ == "__main__":
    main()
