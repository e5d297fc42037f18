"""Scaling-efficiency harness: throughput vs device count on a dp(xtp) mesh.

North-star target (BASELINE.json): >=85% scaling efficiency from 1 chip to
N>=2 hosts.  On real hardware, run this per-process under
`jax.distributed.initialize`; without a pod slice it runs the identical code
path on a virtual CPU mesh to validate the methodology:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py

Note: virtual CPU devices share host cores, so CPU "efficiency" reflects
host-core contention, not ICI behavior — the number that matters is measured
on TPU.  The data plane is dp-parallel (zero collectives), so TPU scaling is
expected near-linear minus input-feed overheads.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(dp: int, tp: int, batch_per_device: int, seq: int, iters: int) -> float:
    import jax

    from embedding_cpp_tpu.gguf.constants import GGUFFileType
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.models.config import BertConfig
    from embedding_cpp_tpu.models.params import random_params
    from embedding_cpp_tpu.parallel import distributed as dist
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import shard_params_and_make_forward

    multiprocess = jax.process_count() > 1
    config = BertConfig(
        n_vocab=2048, n_ctx=512, n_embd=384, n_layer=6, n_head=12, n_ff=1536,
        name="scaling",
    )
    params = random_params(config, GGUFFileType.MOSTLY_Q4_0, seed=0)
    mesh = make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])
    sharded, fwd = shard_params_and_make_forward(
        params, config, ComputeOptions(dtype="float32", attn_impl="xla"), mesh
    )

    batch = batch_per_device * dp
    rng = np.random.default_rng(jax.process_index())

    if multiprocess:
        # the per-host batch stream: each host feeds ONLY its local dp
        # shard (jax.make_array_from_process_local_data) — no cross-host
        # data-plane traffic, the SURVEY §2.4 scaling model
        local_rows = batch // jax.process_count()
        def make_batch():
            ids = rng.integers(0, config.n_vocab,
                               size=(local_rows, seq)).astype(np.int32)
            mask = np.ones((local_rows, seq), np.int32)
            return dist.local_batch(mesh, ids), dist.local_batch(mesh, mask)

        def run_once(gids, gmask):
            out = fwd(sharded, gids, gmask)
            dist.fetch_local(out)  # each host fetches its own rows
    else:
        def make_batch():
            ids = rng.integers(0, config.n_vocab,
                               size=(batch, seq)).astype(np.int32)
            return ids, np.ones((batch, seq), np.int32)

        def run_once(ids, mask):
            np.asarray(fwd(sharded, ids, mask))

    gids, gmask = make_batch()
    run_once(gids, gmask)  # compile
    best = float("inf")
    for _ in range(iters):
        if multiprocess:
            dist.barrier("scaling_iter")
        t0 = time.perf_counter()
        run_once(gids, gmask)
        best = min(best, time.perf_counter() - t0)
    return batch / best  # sentences/sec (global)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-per-device", type=int, default=64)
    p.add_argument("--seq", type=int, default=64)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    from embedding_cpp_tpu.parallel import distributed as dist

    dist.add_args(p)
    args = p.parse_args()
    multihost = dist.init_from_args(args)

    import jax

    n = len(jax.devices())
    if multihost:
        # one process per host: every process runs the SAME program over the
        # full global mesh, each feeding its per-host stream (run this
        # script once per host with --process-id 0..N-1)
        counts = [n // args.tp]
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c * args.tp <= n]
    results = {}
    base = None
    for dp in counts:
        sps = measure(dp, args.tp, args.batch_per_device, args.seq, args.iters)
        if base is None:
            base = sps
        if multihost:
            # cross-host efficiency = this global number vs a single-host
            # run of the same script; compute it across runs
            results[dp] = {"sentences_per_sec": round(sps, 1)}
            dist.log_once(f"dp={dp:3d} tp={args.tp} x "
                          f"{jax.process_count()} processes: "
                          f"{sps:10.1f} sentences/s (global)")
        else:
            eff = sps / (base * dp)
            results[dp] = {"sentences_per_sec": round(sps, 1),
                           "efficiency": round(eff, 3)}
            dist.log_once(f"dp={dp:3d} tp={args.tp}: {sps:10.1f} sentences/s"
                          f"  efficiency {eff*100:5.1f}%")
    if not multihost or jax.process_index() == 0:
        print(json.dumps({
            "metric": "dp_scaling_efficiency",
            "platform": jax.devices()[0].platform,
            "processes": jax.process_count(),
            "batch_per_device": args.batch_per_device,
            "seq": args.seq,
            "results": results,
        }))


if __name__ == "__main__":
    main()
