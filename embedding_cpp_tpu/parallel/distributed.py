"""Multi-host distributed runtime (SURVEY.md §2.4, "Communication backend").

The reference's only inter-process channel is the client TCP socket
(examples/server.cpp:78-118); it has no collective plane at all.  The
TPU-native equivalent is the JAX distributed runtime:

- `initialize()` wraps `jax.distributed.initialize` — N host processes
  connect to one coordinator and form a single system; `jax.devices()`
  becomes the global device list and GSPMD-inserted collectives ride ICI
  within a slice and DCN (Gloo on CPU meshes) across hosts.
- **Data plane** — embarrassingly parallel: each host feeds its local dp
  shard via `local_batch` (`jax.make_array_from_process_local_data`); no
  collective touches activations except the compact output gather.
- **Control plane for serving** — under SPMD every process must join every
  collective in the same order, so a multi-host server is leader-follower
  lockstep: process 0 owns the client sockets, broadcasts each token batch
  (`multihost_utils.broadcast_one_to_all`), and every process replays the
  same engine dispatches (`follower_loop`).

Tested by tests/test_distributed.py on a 2-process x 4-virtual-CPU-device
mesh, asserting output parity with the single-process path.
"""
from __future__ import annotations

import sys
import threading
from typing import Sequence

import numpy as np

from .mesh import DP_AXIS

# one lock orders EVERY leader-side broadcast+dispatch pair (engine embeds
# and index ops alike): followers replay strictly in broadcast order, so the
# leader must execute in that same order
_LEADER_LOCK = threading.Lock()

# leader -> follower opcodes (first slot of the fixed-size header broadcast)
OP_STOP = 0
OP_EMBED = 1
OP_INDEX = 2  # vector-index append (payload: f32 [n, E] normalized vectors)
OP_SEARCH = 3  # index search (payload: f32 padded queries; header[3] = k)
OP_SAVE = 4  # index persistence: followers join the corpus all-gather
# sparse (SPLADE) plane: the encode forward and the device sparse-index ops
# all run collectives on the global mesh, so followers must replay them too
OP_SPARSE_ENCODE = 5  # payload: i32 token matrix; header[3] = top-k width
OP_SPARSE_INDEX = 6  # payloads: i32 ids [n, Kd], f32 weights [n, Kd]
OP_SPARSE_SEARCH = 7  # payloads: i32 q ids, f32 q weights, i32 [n_real, k]
_HEADER_SHAPE = (4,)  # [op, n_rows, payload_width, k]


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
) -> None:
    """Join the JAX distributed system.  Call before any jax array work.

    coordinator: "host:port" of process 0 (every process passes the same
    address; process 0 binds it).
    """
    import jax

    kw = {}
    if local_device_count is not None:
        kw["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def add_args(parser) -> None:
    """Attach the standard multi-host flags to an argparse parser."""
    parser.add_argument(
        "--coordinator", default=None, metavar="HOST:PORT",
        help="JAX distributed coordinator address (process 0 binds it); "
             "enables the multi-host runtime",
    )
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)


def init_from_args(args) -> bool:
    """initialize() from add_args flags; returns True if multi-host."""
    if args.coordinator is None:
        if getattr(args, "num_processes", 1) > 1:
            raise SystemExit("--num-processes > 1 requires --coordinator")
        return False
    initialize(args.coordinator, args.num_processes, args.process_id)
    return True


# --- data plane --------------------------------------------------------------
def global_batch(mesh, arr: np.ndarray, spec=None):
    """Identical-on-all-hosts numpy batch -> global dp-sharded jax.Array.

    Every process passes the SAME array (leader-broadcast serving, tests);
    each host materializes only its addressable shards.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh, spec if spec is not None else P(DP_AXIS, *([None] * (arr.ndim - 1)))
    )
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def local_batch(mesh, local: np.ndarray, spec=None):
    """Per-host rows -> global dp-sharded jax.Array (the per-host batch
    stream: global row count = sum of local rows across processes)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh,
        spec if spec is not None else P(DP_AXIS, *([None] * (local.ndim - 1))),
    )
    return jax.make_array_from_process_local_data(sharding, local)


def fetch_local(arr) -> np.ndarray:
    """This process's rows of a dp-sharded output (no cross-host traffic).
    Shards replicated over other mesh axes (tp) are deduplicated by their
    global index before concatenating in dp order."""
    unique: dict = {}
    for s in arr.addressable_shards:
        key = tuple(sl.start or 0 for sl in s.index)
        unique.setdefault(key, s.data)
    return np.concatenate(
        [np.asarray(data) for _, data in sorted(unique.items())]
    )


# --- serving control plane (leader-follower lockstep) ------------------------
def _encode_token_lists(token_lists: Sequence[Sequence[int]]) -> np.ndarray:
    """Ragged id lists -> one padded i32 matrix [n, 1+maxlen] (col 0 = len),
    the broadcastable wire form of a batch."""
    n = len(token_lists)
    maxlen = max((len(t) for t in token_lists), default=0)
    m = np.zeros((n, maxlen + 1), dtype=np.int32)
    for i, t in enumerate(token_lists):
        m[i, 0] = len(t)
        m[i, 1 : 1 + len(t)] = t
    return m


def _decode_token_lists(m: np.ndarray) -> list[list[int]]:
    return [row[1 : 1 + row[0]].tolist() for row in m]


def _broadcast(arr: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(arr))


def make_leader(engine) -> None:
    """Patch engine.embed_tokens on process 0 so every device dispatch is
    announced to the followers first (they replay the identical call, which
    keeps all processes in SPMD lockstep).  encode()/server frames all route
    through embed_tokens, so one patch covers the serving surface.

    The shared _LEADER_LOCK makes broadcast + execution atomic per request:
    the server drives the engine from several executor threads, and without
    it two threads could interleave their broadcasts or execute in a
    different order than the followers replay — mismatched collective
    sequences across processes.  Index ops (make_leader_index) serialize
    through the same lock for the same reason."""
    import jax

    assert jax.process_index() == 0, "make_leader runs on process 0 only"
    real = engine.embed_tokens

    def embed_tokens(token_lists):
        with _LEADER_LOCK:
            payload = _encode_token_lists(token_lists)
            _broadcast(
                np.array([OP_EMBED, payload.shape[0], payload.shape[1], 0],
                         np.int32)
            )
            _broadcast(payload)
            return real(token_lists)

    engine.embed_tokens = embed_tokens

    if engine.config.mlm_head:
        # the SPLADE encode forward also runs collectives on the global
        # mesh — announce it so followers replay sparse_tokens in lockstep
        real_sparse = engine.sparse_tokens

        def sparse_tokens(token_lists, k=256):
            with _LEADER_LOCK:
                payload = _encode_token_lists(token_lists)
                _broadcast(np.array(
                    [OP_SPARSE_ENCODE, payload.shape[0], payload.shape[1],
                     int(k)], np.int32,
                ))
                _broadcast(payload)
                return real_sparse(token_lists, k=k)

        engine.sparse_tokens = sparse_tokens


def make_leader_index(engine):
    """Leader-side VectorIndex over the multi-host mesh: the corpus shards
    across every host's devices, so every index device op (vector append,
    search dispatch) broadcasts to the followers first and they replay it
    with bitwise-identical inputs (follower_loop OP_INDEX/OP_SEARCH)."""
    import jax

    from ..runtime.search import VectorIndex

    assert jax.process_index() == 0

    class LeaderIndex(VectorIndex):
        _host_ingest_only = True  # every commit must broadcast to followers

        def _commit_vectors(self, vecs):
            with _LEADER_LOCK:
                _broadcast(np.array(
                    [OP_INDEX, vecs.shape[0], vecs.shape[1], 0], np.int32
                ))
                _broadcast(np.ascontiguousarray(vecs, np.float32))
                return super()._commit_vectors(vecs)

        def _run_search(self, q, k):
            with _LEADER_LOCK:
                _broadcast(np.array(
                    [OP_SEARCH, q.shape[0], q.shape[1], k], np.int32
                ))
                _broadcast(np.ascontiguousarray(q, np.float32))
                return super()._run_search(q, k)

        def _snapshot_rows(self):
            # save(): the corpus rows all-gather across hosts, so the
            # followers must join the collective — announce it first.
            # Lock order matches the other ops: VectorIndex._lock (held by
            # save) -> _LEADER_LOCK.
            with _LEADER_LOCK:
                _broadcast(np.array([OP_SAVE, 0, 0, 0], np.int32))
                return super()._snapshot_rows()

    return LeaderIndex(engine, mesh=engine.mesh)


def make_leader_sparse_index(engine):
    """Leader-side device SparseIndex over the multi-host mesh: the
    padded-COO corpus dp-shards across every host's devices, so every
    device op (doc-row commit, search dispatch) broadcasts to the
    followers first and they replay it with identical inputs
    (follower_loop OP_SPARSE_INDEX/OP_SPARSE_SEARCH)."""
    import jax

    from ..runtime.sparse_search import SparseIndex

    assert jax.process_index() == 0

    class LeaderSparseIndex(SparseIndex):
        def _commit_device(self, padded, base):
            di, dv = padded
            with _LEADER_LOCK:
                _broadcast(np.array(
                    [OP_SPARSE_INDEX, di.shape[0], di.shape[1], 0], np.int32
                ))
                _broadcast(np.ascontiguousarray(di, np.int32))
                _broadcast(np.ascontiguousarray(dv, np.float32))
                return super()._commit_device(padded, base)

        def _run_device_search(self, q_idx, q_val, n_real, k, nb, vocab_pad):
            # nb/vocab_pad re-derive deterministically on the followers
            # (identical corpus shapes + the engine vocab)
            with _LEADER_LOCK:
                _broadcast(np.array(
                    [OP_SPARSE_SEARCH, q_idx.shape[0], q_idx.shape[1], k],
                    np.int32,
                ))
                _broadcast(np.ascontiguousarray(q_idx, np.int32))
                _broadcast(np.ascontiguousarray(q_val, np.float32))
                _broadcast(np.array([n_real], np.int32))
                return super()._run_device_search(
                    q_idx, q_val, n_real, k, nb, vocab_pad
                )

    return LeaderSparseIndex(engine, device=True, mesh=engine.mesh)


def broadcast_stop() -> None:
    """Leader: release the followers (end of serving)."""
    _broadcast(np.array([OP_STOP, 0, 0, 0], np.int32))


def follower_loop(engine) -> None:
    """Processes 1..N-1: replay the leader's device dispatches until STOP.

    The engine's batching is deterministic in its inputs, so replaying
    embed_tokens with the broadcast token lists issues the same jit calls in
    the same order as the leader — the SPMD contract.  Index ops replay into
    a follower-local VectorIndex over the same global mesh (the corpus is
    dp-sharded across hosts; search results replicate, the follower just
    discards its copy).
    """
    import jax

    assert jax.process_index() != 0, "follower_loop runs on processes > 0"
    fidx = None
    fsparse = None
    sparse_rows = 0
    while True:
        header = _broadcast(np.zeros(_HEADER_SHAPE, np.int32))
        op, n, width = int(header[0]), int(header[1]), int(header[2])
        if op == OP_STOP:
            return
        if op == OP_EMBED:
            payload = _broadcast(np.zeros((n, width), np.int32))
            engine.embed_tokens(_decode_token_lists(payload))
            continue
        if op == OP_SPARSE_ENCODE:
            payload = _broadcast(np.zeros((n, width), np.int32))
            engine.sparse_tokens(_decode_token_lists(payload),
                                 k=int(header[3]))
            continue
        if op in (OP_SPARSE_INDEX, OP_SPARSE_SEARCH):
            if fsparse is None:
                from ..runtime.sparse_search import SparseIndex

                fsparse = SparseIndex(engine, device=True, mesh=engine.mesh)
            if op == OP_SPARSE_INDEX:
                di = _broadcast(np.zeros((n, width), np.int32))
                dv = _broadcast(np.zeros((n, width), np.float32))
                with fsparse._lock:
                    fsparse._commit_device((di, dv), sparse_rows)
                sparse_rows += n
            else:
                q_idx = _broadcast(np.zeros((n, width), np.int32))
                q_val = _broadcast(np.zeros((n, width), np.float32))
                n_real = int(_broadcast(np.zeros(1, np.int32))[0])
                from ..runtime.sparse_search import _doc_block

                with fsparse._lock:
                    # header[3] carries the leader's already-clamped k
                    k = int(header[3])
                    nb = _doc_block(
                        n, fsparse.nnz_width,
                        fsparse._didx.shape[0] // fsparse._dp,
                    )
                    fsparse._run_device_search(
                        q_idx, q_val, n_real, k, nb, fsparse._vocab_pad()
                    )
            continue
        if fidx is None:
            from ..runtime.search import VectorIndex

            fidx = VectorIndex(engine, mesh=engine.mesh)
        if op == OP_SAVE:
            # join the leader's corpus all-gather; the leader's process
            # writes the file, this copy is discarded
            with fidx._lock:
                fidx._snapshot_rows()
            continue
        payload = _broadcast(np.zeros((n, width), np.float32))
        if op == OP_INDEX:
            with fidx._lock:
                fidx._commit_vectors(payload)
        elif op == OP_SEARCH:
            with fidx._lock:
                fidx._run_search(payload, int(header[3]))


def barrier(name: str = "barrier") -> None:
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def log_once(msg: str) -> None:
    """Print from process 0 only."""
    import jax

    if jax.process_index() == 0:
        print(msg, file=sys.stderr)
