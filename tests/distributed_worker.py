"""Worker process for tests/test_distributed.py.

Spawned N times (one per simulated host) with 4 virtual CPU devices each;
joins the JAX distributed system, then exercises:

1. the identical-inputs GSPMD path (ShardedForward auto-globalizes numpy),
2. the per-host batch stream (distributed.local_batch -> fetch_local),
3. the Engine on a multi-host mesh under the leader-follower serving plane
   (process 0 broadcasts batches; followers replay — distributed.py).

Outputs land in <outdir> as .npy files for the parent test to compare
against the single-process reference.
"""
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord_port = sys.argv[3]
    outdir = sys.argv[4]

    import jax

    jax.distributed.initialize(
        f"127.0.0.1:{coord_port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nprocs * n_local, (n_global, nprocs, n_local)

    import numpy as np

    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions, random_params
    from embedding_cpp_tpu.parallel import distributed as dist
    from embedding_cpp_tpu.parallel.mesh import make_mesh
    from embedding_cpp_tpu.parallel.sharding import shard_params_and_make_forward
    from embedding_cpp_tpu.runtime.engine import Engine

    CFG = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        name="dist-test",
    )
    OPTS = ComputeOptions(dtype="float32")
    dp, tp = n_global // 2, 2

    # --- raw forward paths ---------------------------------------------------
    params = random_params(CFG, GGUFFileType.MOSTLY_Q4_0, seed=0)
    mesh = make_mesh(dp=dp, tp=tp)
    sharded, fwd = shard_params_and_make_forward(params, CFG, OPTS, mesh)

    rng = np.random.default_rng(0)
    batch = 2 * dp
    ids = rng.integers(0, CFG.n_vocab, size=(batch, 16)).astype(np.int32)
    mask = np.ones((batch, 16), np.int32)
    mask[:, 12:] = 0
    gidx = np.arange(batch, dtype=np.int32)

    # 1. identical numpy inputs on every host -> replicated compact output
    out_bcast = np.asarray(fwd.gather(sharded, ids, mask, gidx))

    # 2. per-host stream: this host feeds only its rows; row order follows
    #    the dp axis, which is laid out process-major on the mesh
    rows = batch // nprocs
    lo = pid * rows
    out_stream = np.asarray(
        fwd.gather(
            sharded,
            dist.local_batch(mesh, ids[lo : lo + rows]),
            dist.local_batch(mesh, mask[lo : lo + rows]),
            gidx,
        )
    )

    # 3. plain dp-sharded output, local fetch only
    local_rows = dist.fetch_local(fwd(sharded, ids, mask))
    np.save(f"{outdir}/local_rows_{pid}.npy", local_rows)

    if pid == 0:
        np.save(f"{outdir}/out_bcast.npy", out_bcast)
        np.save(f"{outdir}/out_stream.npy", out_stream)

    # --- Engine under the leader-follower serving plane ----------------------
    # mlm_head=True so the SAME engine also exercises the sparse plane
    # (encoder weights are seed-identical: mlm tensors draw last)
    import dataclasses

    SCFG = dataclasses.replace(CFG, mlm_head=True)
    engine = Engine.synthetic(SCFG, ftype="q4_0", opts=OPTS, mesh=mesh)

    # --- multi-host sharded index: save/load roundtrip (SPMD lockstep) ------
    # Both processes run the identical op sequence; save() all-gathers the
    # dp-sharded corpus over DCN and every process writes its local file.
    from embedding_cpp_tpu.runtime.search import VectorIndex

    vecs = np.random.default_rng(7).standard_normal(
        (37, engine.n_embd)
    ).astype(np.float32)
    queries = vecs[:5].copy()
    sidx = VectorIndex(engine, mesh=mesh)
    sidx.add_vectors(vecs)
    i1, s1 = sidx.search_vectors(queries, k=3)
    idx_path = f"{outdir}/dist_index_{pid}.npz"
    sidx.save(idx_path)
    sidx2 = VectorIndex(engine, mesh=mesh)
    assert sidx2.load(idx_path) == 37
    i2, s2 = sidx2.search_vectors(queries, k=3)
    if pid == 0:
        np.savez(f"{outdir}/index_roundtrip.npz", i1=i1, s1=s1, i2=i2, s2=s2,
                 vecs=vecs)

    token_lists = [
        [2] + rng2.tolist() + [3]
        for rng2 in np.random.default_rng(1).integers(
            4, CFG.n_vocab, size=(12, 9)
        )
    ]
    if pid == 0:
        dist.make_leader(engine)
        out = engine.embed_tokens(token_lists)
        np.save(f"{outdir}/engine_out.npy", out)
        # serving-plane index persistence: save() broadcasts OP_SAVE so the
        # follower joins the corpus all-gather from inside follower_loop
        lidx = dist.make_leader_index(engine)
        lidx.add_vectors(vecs)
        lidx.save(f"{outdir}/leader_index.npz")
        li, ls = lidx.search_vectors(queries, k=3)
        np.savez(f"{outdir}/leader_index_results.npz", li=li, ls=ls)
        # sparse plane: encode (OP_SPARSE_ENCODE via the make_leader patch)
        # + dp-sharded device index commit/search (OP_SPARSE_INDEX/SEARCH)
        sp = dist.make_leader_sparse_index(engine)
        pairs = engine.sparse_tokens(token_lists, k=16)
        sp.add_vectors(pairs)
        si, ss = sp.search_vectors(pairs[:3], k=4)
        np.savez(f"{outdir}/sparse_leader_results.npz", si=si, ss=ss)
        dist.broadcast_stop()
    else:
        dist.follower_loop(engine)
    print(f"worker {pid}: done", flush=True)


if __name__ == "__main__":
    main()
