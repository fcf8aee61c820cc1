"""Public `dynamic_embedding` API — parity with the reference's
``tfra.dynamic_embedding`` (reference dynamic_embedding/__init__.py:17-52).

Usage::

    from recommenders_addons_tpu import dynamic_embedding as de
"""

from recommenders_addons_tpu.ops.hashing import (  # noqa: F401
    EMPTY_KEY,
    default_partition_fn,
    hash_strings,
)
from recommenders_addons_tpu.ops.hashtable import (  # noqa: F401
    TableSpec,
    TableState,
    unique_static,
)
from recommenders_addons_tpu.ops import hashtable as raw_table  # noqa: F401
