"""Serving throughput benchmark: concurrent clients against the TCP server.

The reference serves ONE client at a time (`listen(fd, 1)`,
examples/server.cpp:92) and evaluates one sentence per request; here N
concurrent connections feed the continuous batcher, which merges their
requests into shared device batches.  This measures end-to-end served
sentences/s (tokenize + embed + framing) on the current default device.

Usage:
    python benchmarks/serving.py [--clients 4] [--batch 64] [--sentences 2048]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--batch", type=int, default=64,
                   help="sentences per client request")
    p.add_argument("--sentences", type=int, default=2048,
                   help="sentences per client")
    p.add_argument("--preset", default="minilm-l6")
    p.add_argument("--ftype", default="q4_0")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output-dtype", default="float32",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   help="engine device->host transfer dtype (the wire stays "
                        "f32 unless --wire int8)")
    p.add_argument("--dp", type=int, default=0,
                   help="serve from a dp(xtp) mesh (0 = single device); on "
                        "a CPU run pair with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--wire", choices=["f32", "int8"], default="f32",
                   help="client-side reply compression (tcp protocol)")
    p.add_argument("--protocol", choices=["tcp", "http"], default="tcp",
                   help="drive the framed TCP protocol or the HTTP/JSON "
                        "endpoint (POST /v1/embeddings)")
    p.add_argument("--http-encoding", choices=["float", "base64"],
                   default="float",
                   help="HTTP reply encoding (base64 skips JSON float "
                        "formatting — much cheaper for large batches)")
    p.add_argument("--json-out", help="also write the JSON result to a file")
    p.add_argument("--overhead-ab", action="store_true",
                   help="same-run serving-tax A/B: alternate direct "
                        "Engine.encode vs through-server rounds on one "
                        "workload (relay drift makes cross-run comparisons "
                        "meaningless — CLAUDE.md); reports the ratio")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    from bench import synthetic_sentences

    from embedding_cpp_tpu.cli.make_test_model import PRESETS
    from embedding_cpp_tpu.models.bert import ComputeOptions
    from embedding_cpp_tpu.runtime.client import EmbeddingClient
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.server import serve

    mesh = None
    if args.dp or args.tp > 1:
        import jax

        from embedding_cpp_tpu.parallel.mesh import make_mesh

        dp = args.dp or (len(jax.devices()) // args.tp)
        mesh = make_mesh(dp=dp, tp=args.tp,
                         devices=jax.devices()[: dp * args.tp])
    engine = Engine.synthetic(
        PRESETS[args.preset], ftype=args.ftype,
        opts=ComputeOptions(dtype=args.dtype, output_dtype=args.output_dtype),
        mesh=mesh,
    )

    import socket

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    http_port = None
    if args.protocol == "http":
        hsock = socket.socket()
        hsock.bind(("127.0.0.1", 0))
        http_port = hsock.getsockname()[1]
        hsock.close()

    loop = asyncio.new_event_loop()

    def run_server():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            serve(engine, "127.0.0.1", port, http_port=http_port)
        )
        try:
            loop.run_until_complete(task)
        except asyncio.CancelledError:
            pass

    t = threading.Thread(target=run_server, daemon=True)
    t.start()
    for _ in range(200):
        try:
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)

    texts = synthetic_sentences(args.sentences)

    if args.overhead_ab:
        # warm both paths on the exact shapes, then interleave A/B rounds
        # within this one run so relay throughput drift hits both sides
        engine.encode(texts[: args.batch])
        warm = EmbeddingClient("127.0.0.1", port)
        warm.embed(texts[: args.batch], wire=args.wire)

        def run_direct() -> float:
            t0 = time.perf_counter()
            for start in range(0, len(texts), args.batch):
                engine.encode(texts[start : start + args.batch])
            return len(texts) / (time.perf_counter() - t0)

        def run_server_path() -> float:
            t0 = time.perf_counter()
            for start in range(0, len(texts), args.batch):
                warm.embed(texts[start : start + args.batch],
                           wire=args.wire)
            return len(texts) / (time.perf_counter() - t0)

        direct, served = [], []
        for _ in range(args.rounds):
            direct.append(run_direct())
            served.append(run_server_path())
        warm.close()
        d = float(np.median(direct))
        s = float(np.median(served))
        result = {
            "metric": f"serving_tax_{args.preset}_{args.ftype}_b{args.batch}",
            "direct_sentences_per_sec": round(d, 1),
            "served_sentences_per_sec": round(s, 1),
            "tax_pct": round(100.0 * (1.0 - s / d), 1),
            "rounds": args.rounds,
            "direct_all": [round(x, 1) for x in direct],
            "served_all": [round(x, 1) for x in served],
        }
        print(json.dumps(result))
        if args.json_out:
            Path(args.json_out).write_text(json.dumps(result, indent=1))
        return  # daemon server thread dies with the process

    if args.protocol == "http":
        import http.client as _http
        import json as _json

        def _embed_http(conn, chunk):
            conn.request("POST", "/v1/embeddings",
                         _json.dumps({"input": chunk,
                                      "encoding_format": args.http_encoding}),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            body = _json.loads(r.read())
            assert r.status == 200, body
            return body["data"]

        warm_conn = _http.HTTPConnection("127.0.0.1", http_port, timeout=600)
        for start in range(0, len(texts), args.batch):
            _embed_http(warm_conn, texts[start : start + args.batch])
        warm_conn.close()

        done = []

        def client_main(cid: int):
            conn = _http.HTTPConnection("127.0.0.1", http_port, timeout=600)
            n = 0
            for start in range(0, len(texts), args.batch):
                n += len(_embed_http(conn, texts[start : start + args.batch]))
            conn.close()
            done.append(n)
    else:
        # warmup: compile the shapes this traffic will hit
        warm = EmbeddingClient("127.0.0.1", port)
        for start in range(0, len(texts), args.batch):
            warm.embed(texts[start : start + args.batch], wire=args.wire)
        warm.close()

        done = []

        def client_main(cid: int):
            c = EmbeddingClient("127.0.0.1", port)
            n = 0
            for start in range(0, len(texts), args.batch):
                chunk = texts[start : start + args.batch]
                vecs = c.embed(chunk, wire=args.wire)
                n += len(vecs)
            c.close()
            done.append(n)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client_main, args=(i,))
               for i in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dt = time.perf_counter() - t0
    total = int(np.sum(done))
    sps = total / dt

    import jax

    print(f"# {args.clients} clients x {args.sentences} sentences "
          f"(batch {args.batch}): {total} served in {dt:.2f}s", file=sys.stderr)
    mesh_tag = f"_dp{args.dp}_tp{args.tp}" if mesh is not None else ""
    if args.protocol == "http":
        mesh_tag += "_http"
        if args.http_encoding != "float":
            mesh_tag += f"_{args.http_encoding}"
    od_tag = "" if args.output_dtype == "float32" else f"_{args.output_dtype}"
    result = {
        "metric": f"served_sentences_per_sec_{args.preset}_{args.ftype}"
                  f"{mesh_tag}{od_tag}",
        "value": round(sps, 1),
        "unit": "sentences/s",
        "clients": args.clients,
        "platform": jax.devices()[0].platform,
        "wire": args.wire,
    }
    print(json.dumps(result))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
