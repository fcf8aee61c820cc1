from recommenders_addons_tpu.parallel.mesh import create_mesh  # noqa: F401
from recommenders_addons_tpu.parallel.sharded import (  # noqa: F401
    ShardedVariable,
    ShardedLookupContext,
)
