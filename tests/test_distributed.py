"""Multi-host distributed runtime (VERDICT r1 missing #1).

Spawns 2 real OS processes x 4 virtual CPU devices each, joined through
`jax.distributed.initialize` (coordination service + Gloo collectives — the
CPU stand-in for ICI/DCN), and asserts every multi-host path produces the
single-process numbers:

- identical-inputs GSPMD forward (numpy auto-globalized),
- per-host batch streams (make_array_from_process_local_data + local fetch),
- Engine serving under the leader-follower broadcast plane,
- the full TCP server with --coordinator/--num-processes/--process-id.

The reference has no collective plane at all (its only inter-process channel
is the client socket, examples/server.cpp:78-118); SURVEY §2.4 specifies
this runtime as the TPU-native replacement.
"""
import os
import socket
import struct
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT)  # drops any sitecustomize that forces TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    return env


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    """Run the 2-process worker once; yield its output dir."""
    outdir = tmp_path_factory.mktemp("dist")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "distributed_worker.py"),
             str(pid), "2", str(port), str(outdir)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            logs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outdir


def _reference():
    from embedding_cpp_tpu.gguf import GGUFFileType
    from embedding_cpp_tpu.models import (
        BertConfig, ComputeOptions, bert_embed_batch, random_params,
    )

    CFG = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        name="dist-test",
    )
    params = random_params(CFG, GGUFFileType.MOSTLY_Q4_0, seed=0)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.n_vocab, size=(8, 16)).astype(np.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 12:] = 0
    ref = np.asarray(
        bert_embed_batch(params, ids, mask, CFG, ComputeOptions(dtype="float32"))
    )
    return CFG, ref


def test_multiprocess_identical_inputs_parity(worker_outputs):
    """GSPMD forward over 2 processes == single-process forward (the numpy
    inputs are auto-globalized by ShardedForward)."""
    _, ref = _reference()
    got = np.load(worker_outputs / "out_bcast.npy")
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_multiprocess_per_host_streams_parity(worker_outputs):
    """Each host feeding only its local dp shard reassembles to the same
    global batch result (the data plane has no cross-host traffic)."""
    _, ref = _reference()
    got = np.load(worker_outputs / "out_stream.npy")
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_multiprocess_local_fetch(worker_outputs):
    """Plain dp-sharded output: per-process local fetches concatenate to the
    global result in dp order (process-major mesh layout)."""
    _, ref = _reference()
    local0 = np.load(worker_outputs / "local_rows_0.npy")
    local1 = np.load(worker_outputs / "local_rows_1.npy")
    assert local0.shape[0] == local1.shape[0] == 4
    np.testing.assert_allclose(
        np.concatenate([local0, local1]), ref, atol=2e-5, rtol=1e-4
    )


def test_multiprocess_engine_leader_follower(worker_outputs):
    """Engine.embed_tokens on the 2-process mesh under the broadcast serving
    plane == single-process Engine on the same weights and token lists."""
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine

    CFG = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        name="dist-test", mlm_head=True,
    )
    single = Engine.synthetic(
        CFG, ftype="q4_0", opts=ComputeOptions(dtype="float32")
    )
    token_lists = [
        [2] + row.tolist() + [3]
        for row in np.random.default_rng(1).integers(4, CFG.n_vocab, size=(12, 9))
    ]
    ref = single.embed_tokens(token_lists)
    got = np.load(worker_outputs / "engine_out.npy")
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_multiprocess_index_save_load_roundtrip(worker_outputs):
    """Multi-host sharded VectorIndex persists and reloads (VERDICT r2
    missing #2): save() all-gathers the dp-sharded corpus over the
    collective plane; a fresh index loading the file searches identically."""
    data = np.load(worker_outputs / "index_roundtrip.npz")
    np.testing.assert_array_equal(data["i1"], data["i2"])
    np.testing.assert_allclose(data["s1"], data["s2"], atol=1e-6)
    # top hit of query j (== vec j) is document j itself
    np.testing.assert_array_equal(data["i1"][:, 0], np.arange(5))
    # both processes wrote the standard single-host file format with the
    # unit-normalized rows
    for pid in (0, 1):
        with np.load(worker_outputs / f"dist_index_{pid}.npz") as f:
            saved = f["vectors"]
        expect = data["vecs"] / np.linalg.norm(
            data["vecs"], axis=1, keepdims=True
        )
        assert saved.shape == expect.shape
        np.testing.assert_allclose(saved, expect, atol=2e-2)  # bf16 corpus


def test_multiprocess_leader_index_save(worker_outputs):
    """The serving plane's OP_SAVE: the leader saved while the follower was
    inside follower_loop (it joined the all-gather), and search results on
    the leader index match the lockstep index."""
    lead = np.load(worker_outputs / "leader_index_results.npz")
    data = np.load(worker_outputs / "index_roundtrip.npz")
    np.testing.assert_array_equal(lead["li"], data["i1"])
    np.testing.assert_allclose(lead["ls"], data["s1"], atol=1e-6)
    with np.load(worker_outputs / "leader_index.npz") as f:
        assert f["vectors"].shape == (37, 128)


def test_multiprocess_server_end_to_end(tmp_path):
    """The real TCP server on a 2-process mesh: process 0 serves clients,
    process 1 follows; replies match the single-process engine."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.client import EmbeddingClient
    from embedding_cpp_tpu.runtime.engine import Engine

    model = tmp_path / "m.gguf"
    make_test_model(str(model), "tiny", "f32")

    coord = _free_port()
    sport = _free_port()
    # --output-dtype float32: this test asserts bit-level numeric parity of
    # the distributed plane; the int8 transfer default would add ~1e-3
    # quantization noise (int8-on-mesh is covered by dryrun_multichip)
    cmd = [sys.executable, "-m", "embedding_cpp_tpu.runtime.server",
           "-m", str(model), "--host", "127.0.0.1", "--port", str(sport),
           "--dtype", "float32", "--output-dtype", "float32",
           "--coordinator", f"127.0.0.1:{coord}", "--num-processes", "2"]
    procs = [
        subprocess.Popen(cmd + ["--process-id", str(pid)], env=_worker_env(),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for pid in (0, 1)
    ]
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            for p in procs:
                if p.poll() is not None:
                    out, _ = p.communicate()
                    pytest.fail(f"server process died:\n{out[-4000:]}")
            try:
                s = socket.create_connection(("127.0.0.1", sport), 0.5)
                s.close()
                break
            except OSError:
                time.sleep(1.0)
        else:
            pytest.fail("multihost server never came up")

        texts = ["hello world", "the quick brown fox", "distributed serving"]
        with EmbeddingClient("127.0.0.1", sport) as c:
            vecs = c.embed(texts)
        single = Engine.from_gguf(str(model))
        from embedding_cpp_tpu.models.bert import ComputeOptions

        single = Engine.from_gguf(
            str(model), opts=ComputeOptions(dtype="float32")
        )
        np.testing.assert_allclose(vecs, single.encode(texts), atol=2e-5,
                                   rtol=1e-4)
        # distributed vector index: the corpus shards across both processes'
        # devices; index + search ops broadcast to the follower (OP_INDEX /
        # OP_SEARCH replay) and results come back correct
        corpus = [f"distributed document {i}" for i in range(10)]
        with EmbeddingClient("127.0.0.1", sport) as c2:
            assert c2.index(corpus) == 10
            idx, scores = c2.search([corpus[4], corpus[8]], k=2)
            assert idx[0, 0] == 4 and idx[1, 0] == 8
            assert np.all(scores[:, 0] >= scores[:, 1])
        # graceful shutdown: SIGTERM to the leader broadcasts STOP, which
        # releases the follower from its blocking broadcast
        procs[0].terminate()
        try:
            assert procs[1].wait(timeout=60) == 0, "follower died uncleanly"
        except subprocess.TimeoutExpired:
            pytest.fail("follower not released by the leader's STOP")
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def test_token_list_broadcast_codec():
    """The leader-follower batch codec roundtrips ragged id lists exactly
    (pure host logic, no processes needed)."""
    from embedding_cpp_tpu.parallel.distributed import (
        _decode_token_lists, _encode_token_lists,
    )

    cases = [
        [[1, 2, 3], [], [7]],
        [[5] * 100],
        [[]],
    ]
    for lists in cases:
        assert _decode_token_lists(_encode_token_lists(lists)) == lists
    assert _encode_token_lists([]).shape == (0, 1)


def test_multiprocess_sparse_leader_follower(worker_outputs):
    """Sparse plane over 2 processes: the leader's dp-sharded device
    SparseIndex (encode broadcast + commit/search replay) == the
    single-process device index on the same weights and token lists."""
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.sparse_search import SparseIndex

    CFG = BertConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_layer=2, n_head=4, n_ff=256,
        name="dist-test", mlm_head=True,
    )
    single = Engine.synthetic(
        CFG, ftype="q4_0", opts=ComputeOptions(dtype="float32")
    )
    token_lists = [
        [2] + row.tolist() + [3]
        for row in np.random.default_rng(1).integers(4, CFG.n_vocab,
                                                     size=(12, 9))
    ]
    pairs = single.sparse_tokens(token_lists, k=16)
    idx = SparseIndex(single)
    idx.add_vectors(pairs)
    ri, rs = idx.search_vectors(pairs[:3], k=4)
    got = np.load(worker_outputs / "sparse_leader_results.npz")
    np.testing.assert_array_equal(got["si"], ri)
    np.testing.assert_allclose(got["ss"], rs, atol=1e-4, rtol=1e-4)
