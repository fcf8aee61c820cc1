"""Native (C++) runtime components, loaded lazily via ctypes.

The reference builds its runtime in C++ (table engines, streaming
checkpoint ops — SURVEY.md §2.1); here the device compute path is XLA/Pallas
and the HOST runtime (spill-tier store, buffered checkpoint IO) is C++,
compiled on first use with the system toolchain. Everything degrades to the
pure-numpy implementations if no compiler is available.
"""

from recommenders_addons_tpu.native.build import (  # noqa: F401
    get_lib,
    native_available,
)
from recommenders_addons_tpu.native.host_store import (  # noqa: F401
    NativeHostKVStore,
)
