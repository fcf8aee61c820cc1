"""Serving runtime: a standalone embedding-lookup server.

The reference ships deployment integration for TF-Serving and Triton
(tools/config_tfserving.sh; README.md:300-360 — a server process that loads
the exported model and answers lookup RPCs, with the Redis backend shared
by replicas). The TPU-native equivalent is this package: a dependency-free
server process that loads frozen/compressed tables (ops/serving.py) plus an
optional host-DRAM spill tier and serves batched lookups over HTTP and
gRPC (binary framing; optional bearer-token auth + TLS on both).

    python -m recommenders_addons_tpu.serving --dir <export_dir> --port 8501
"""

from recommenders_addons_tpu.serving.grpc_server import (  # noqa: F401
    GrpcEmbeddingClient,
    GrpcEmbeddingServer,
    serve_directory_grpc,
)
from recommenders_addons_tpu.serving.kv import (  # noqa: F401
    HostKVServer,
    RemoteKVStore,
    ShardedRemoteKVStore,
)
from recommenders_addons_tpu.serving.server import (  # noqa: F401
    EmbeddingClient,
    EmbeddingServer,
    serve_directory,
)
