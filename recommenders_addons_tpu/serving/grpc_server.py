"""gRPC serving front-end for frozen dynamic-embedding tables.

Role parity: the reference's TF-Serving/Triton gRPC deployment
(tools/config_tfserving.sh, README.md:300-360) — its serving fleets speak
gRPC PredictionService; this is the equivalent front-end for this
framework's FrozenTable exports, sharing the micro-batching core with the
HTTP server (serving/server.py).

Design: no generated protobuf stubs — the service registers generic
bytes-in/bytes-out method handlers (grpc.method_handlers_generic_handler)
with a compact little-endian wire format, so the dependency surface stays
at grpcio alone and the hot path never JSON-encodes embedding payloads:

  Lookup request :  u16 name_len | name utf8 | u32 n | i64 ids[n]
  Lookup response:  u32 n | u32 dim | f32 values[n*dim] | u8 found[n]
  Status         :  empty request -> JSON bytes (same shape as /v1/status)

Auth: optional shared-token check (``authorization: Bearer <token>``
metadata) via a server interceptor; optional TLS via
``grpc.ssl_server_credentials`` with PEM cert/key paths.
"""

from __future__ import annotations

import json
import struct
from concurrent import futures
from typing import Any, Dict, Optional

import numpy as np

from recommenders_addons_tpu.serving.server import _Batcher, _TableEntry

SERVICE = "tfra.dynamic_embedding.EmbeddingService"


def _pack_lookup_request(table: str, ids: np.ndarray) -> bytes:
    name = table.encode("utf-8")
    ids = np.ascontiguousarray(ids, np.int64)
    return (struct.pack("<HI", len(name), len(ids)) + name
            + ids.tobytes())


def _unpack_lookup_request(data: bytes):
    name_len, n = struct.unpack_from("<HI", data, 0)
    off = 6
    name = data[off:off + name_len].decode("utf-8")
    off += name_len
    ids = np.frombuffer(data, np.int64, count=n, offset=off)
    return name, ids


def _pack_lookup_response(vals: np.ndarray, found: np.ndarray) -> bytes:
    vals = np.ascontiguousarray(vals, np.float32)
    found = np.ascontiguousarray(found, np.uint8)
    n, dim = vals.shape
    return (struct.pack("<II", n, dim) + vals.tobytes() + found.tobytes())


def _unpack_lookup_response(data: bytes):
    n, dim = struct.unpack_from("<II", data, 0)
    off = 8
    vals = np.frombuffer(data, np.float32, count=n * dim,
                         offset=off).reshape(n, dim)
    off += n * dim * 4
    found = np.frombuffer(data, np.uint8, count=n, offset=off).astype(bool)
    return vals, found


class _TokenInterceptor:
    """Rejects calls without the shared bearer token (UNAUTHENTICATED)."""

    def __init__(self, token: str):
        import grpc

        self._grpc = grpc
        self._expect = f"Bearer {token}"

        def abort(request, context):
            context.abort(grpc.StatusCode.UNAUTHENTICATED, "bad token")

        self._reject = grpc.unary_unary_rpc_method_handler(abort)

    def intercept_service(self, continuation, handler_call_details):
        md = dict(handler_call_details.invocation_metadata or ())
        if md.get("authorization") == self._expect:
            return continuation(handler_call_details)
        return self._reject


class GrpcEmbeddingServer:
    """gRPC front-end over one or more tables (FrozenTable or any object
    with ``.lookup(ids, return_exists=True)`` / ``.spec`` / ``.size()``).

    ``token``: require ``authorization: Bearer <token>`` metadata.
    ``tls_cert``/``tls_key``: PEM file paths -> TLS server credentials.
    """

    def __init__(self, tables: Dict[str, Any],
                 tiers: Optional[Dict[str, Any]] = None,
                 host: str = "127.0.0.1", port: int = 8500,
                 token: Optional[str] = None,
                 tls_cert: Optional[str] = None,
                 tls_key: Optional[str] = None,
                 max_batch: int = 16384, max_wait_ms: float = 2.0,
                 max_workers: int = 16):
        import grpc

        tiers = tiers or {}
        self._entries = {
            name: _TableEntry(tbl, tiers.get(name))
            for name, tbl in tables.items()
        }
        self._batchers = {
            name: _Batcher(e, max_batch, max_wait_ms)
            for name, e in self._entries.items()
        }

        def lookup(request: bytes, context) -> bytes:
            name, ids = _unpack_lookup_request(request)
            batcher = self._batchers.get(name)
            if batcher is None:
                context.abort(grpc.StatusCode.NOT_FOUND,
                              f"no table {name}")
            out = batcher.lookup(ids)
            if isinstance(out, Exception):
                context.abort(grpc.StatusCode.INTERNAL,
                              f"{type(out).__name__}: {out}")
            vals, found = out
            return _pack_lookup_response(np.asarray(vals), np.asarray(found))

        def status(request: bytes, context) -> bytes:
            return json.dumps({
                "tables": {n: e.info() for n, e in self._entries.items()}
            }).encode()

        handlers = {
            "Lookup": grpc.unary_unary_rpc_method_handler(lookup),
            "Status": grpc.unary_unary_rpc_method_handler(status),
        }
        interceptors = [_TokenInterceptor(token)] if token else []
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            interceptors=interceptors,
        )
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, handlers),)
        )
        addr = f"{host}:{port}"
        if tls_cert and tls_key:
            with open(tls_key, "rb") as f:
                key = f.read()
            with open(tls_cert, "rb") as f:
                cert = f.read()
            creds = grpc.ssl_server_credentials(((key, cert),))
            self.port = self._server.add_secure_port(addr, creds)
        else:
            self.port = self._server.add_insecure_port(addr)
        self.host = host

    def start(self):
        self._server.start()
        return self

    def stop(self, grace: float = 1.0):
        self._server.stop(grace)
        for b in self._batchers.values():
            b.shutdown()

    def __enter__(self):
        return self.start()

    def __exit__(self, *a):
        self.stop()


class GrpcEmbeddingClient:
    """Client for :class:`GrpcEmbeddingServer`.

    ``token`` adds the bearer metadata; ``tls_root`` (PEM path) switches to
    a TLS channel (pass the server cert for self-signed deployments).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 8500,
                 token: Optional[str] = None,
                 tls_root: Optional[str] = None,
                 timeout: float = 30.0):
        import grpc

        self._timeout = timeout
        self._md = (("authorization", f"Bearer {token}"),) if token else ()
        target = f"{host}:{port}"
        if tls_root:
            with open(tls_root, "rb") as f:
                creds = grpc.ssl_channel_credentials(f.read())
            self._channel = grpc.secure_channel(target, creds)
        else:
            self._channel = grpc.insecure_channel(target)
        self._lookup = self._channel.unary_unary(f"/{SERVICE}/Lookup")
        self._status = self._channel.unary_unary(f"/{SERVICE}/Status")

    def lookup(self, table: str, ids):
        ids = np.asarray(ids, np.int64).reshape(-1)
        resp = self._lookup(
            _pack_lookup_request(table, ids), timeout=self._timeout,
            metadata=self._md,
        )
        return _unpack_lookup_response(resp)

    def status(self) -> dict:
        return json.loads(self._status(
            b"", timeout=self._timeout, metadata=self._md))

    def close(self):
        self._channel.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def serve_directory_grpc(directory: str, host: str = "127.0.0.1",
                         port: int = 8500, **kw) -> GrpcEmbeddingServer:
    """gRPC twin of server.serve_directory: load every ``*_serving``
    compressed export under ``directory`` and serve it."""
    import glob
    import os

    from recommenders_addons_tpu.ops.serving import load_compressed

    tables = {}
    for meta in glob.glob(os.path.join(directory, "*_serving-meta.json")):
        prefix = meta[: -len("-meta.json")]
        name = os.path.basename(prefix)[: -len("_serving")]
        tables[name] = load_compressed(prefix)
    if not tables:
        raise FileNotFoundError(
            f"no *_serving-meta.json exports under {directory}")
    return GrpcEmbeddingServer(tables, host=host, port=port, **kw)
