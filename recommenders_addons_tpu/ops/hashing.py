"""Key hashing / mixing utilities.

TPU-native equivalent of the reference's ``HybridHash`` murmur-style mixers
(reference: dynamic_embedding/core/kernels/lookup_impl/lookup_table_op_cpu.h:91-101)
and the mod/string-hash partition functions
(reference: python/ops/dynamic_embedding_variable.py:165-197).

All functions are pure jnp and jit-safe. 64-bit paths require
``jax.config.jax_enable_x64`` (enabled by the package ``__init__``).
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

# Reserved sentinel marking an empty hashtable slot AND the canonical padding
# id. Inputs equal to this value are never found and never inserted.
EMPTY_KEY = np.int64(np.iinfo(np.int64).min)  # -2**63
# int32 tables get their own sentinel.
EMPTY_KEY32 = np.int32(np.iinfo(np.int32).min)

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_MURMUR32_C1 = np.uint32(0x85EBCA6B)
_MURMUR32_C2 = np.uint32(0xC2B2AE35)


def empty_key_for(dtype) -> np.generic:
    dtype = np.dtype(dtype)
    if dtype == np.int64:
        return EMPTY_KEY
    if dtype == np.int32:
        return EMPTY_KEY32
    raise ValueError(f"unsupported key dtype {dtype}; use int32 or int64")


def mix64(keys: jnp.ndarray) -> jnp.ndarray:
    """SplitMix64 finalizer: int64/uint64 keys -> well-mixed uint64."""
    z = keys.astype(jnp.uint64)
    z = z ^ (z >> np.uint64(30))
    z = z * _SPLITMIX_C1
    z = z ^ (z >> np.uint64(27))
    z = z * _SPLITMIX_C2
    z = z ^ (z >> np.uint64(31))
    return z


def mix32(keys: jnp.ndarray) -> jnp.ndarray:
    """Murmur3 fmix32 finalizer: int32/uint32 keys -> well-mixed uint32."""
    z = keys.astype(jnp.uint32)
    z = z ^ (z >> np.uint32(16))
    z = z * _MURMUR32_C1
    z = z ^ (z >> np.uint32(13))
    z = z * _MURMUR32_C2
    z = z ^ (z >> np.uint32(16))
    return z


_SPLITMIX_C1_INV = np.uint64(0x96DE1B173F119089)  # C1^-1 mod 2^64
_SPLITMIX_C2_INV = np.uint64(0x319642B2D24D8EC3)  # C2^-1 mod 2^64
_MURMUR32_C1_INV = np.uint32(0xA5CB9243)
_MURMUR32_C2_INV = np.uint32(0x7ED1B41D)


def unmix64(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`mix64` (SplitMix64 is a bijection on uint64).

    Lets sort-based key pipelines carry only the mixed form and recover the
    original keys afterwards — one fewer 8-byte operand through the sort
    (see hashtable.plan_lookup)."""
    z = z.astype(jnp.uint64)
    z = z ^ (z >> np.uint64(31)) ^ (z >> np.uint64(62))
    z = z * _SPLITMIX_C2_INV
    z = z ^ (z >> np.uint64(27)) ^ (z >> np.uint64(54))
    z = z * _SPLITMIX_C1_INV
    z = z ^ (z >> np.uint64(30)) ^ (z >> np.uint64(60))
    return z


def unmix32(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`mix32` (murmur3 fmix32 is a bijection on uint32)."""
    z = z.astype(jnp.uint32)
    z = z ^ (z >> np.uint32(16))
    z = z * _MURMUR32_C2_INV
    z = z ^ (z >> np.uint32(13)) ^ (z >> np.uint32(26))
    z = z * _MURMUR32_C1_INV
    z = z ^ (z >> np.uint32(16))
    return z


def unmix(z: jnp.ndarray, key_dtype) -> jnp.ndarray:
    """Inverse of :func:`mix` for the given original key dtype."""
    if np.dtype(key_dtype).itemsize == 8:
        return unmix64(z).astype(jnp.int64).astype(key_dtype)
    return unmix32(z).astype(jnp.int32).astype(key_dtype)


def mix(keys: jnp.ndarray) -> jnp.ndarray:
    """Dtype-dispatching mixer; returns unsigned array of same width."""
    if keys.dtype in (jnp.int64, jnp.uint64):
        return mix64(keys)
    if keys.dtype in (jnp.int32, jnp.uint32):
        return mix32(keys)
    raise ValueError(f"unsupported key dtype {keys.dtype}")


def bucket_of(keys: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Bucket index in [0, num_buckets) from the LOW mixed bits (int32).

    ``num_buckets`` must be a power of two.
    """
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be pow2"
    m = mix(keys)
    mask = np.uint32(num_buckets - 1)
    return (m.astype(jnp.uint32) & mask).astype(jnp.int32)


def shard_of(keys: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """Shard index in [0, num_shards) — decorrelated from ``bucket_of``.

    Uses the HIGH mixed bits so that a shard's local buckets stay uniformly
    loaded (same role as the reference's ``default_partition_fn``,
    dynamic_embedding_variable.py:165-197, but collision-free by construction).
    """
    m = mix(keys)
    if m.dtype == jnp.uint64:
        hi = (m >> np.uint64(32)).astype(jnp.uint32)
    else:
        # second mix round for 32-bit keys
        hi = mix32(m)
    return (hi % np.uint32(num_shards)).astype(jnp.int32)


def default_partition_fn(keys: jnp.ndarray, shard_num: int) -> jnp.ndarray:
    """API-parity alias (reference dynamic_embedding_variable.py:165)."""
    return shard_of(keys, shard_num)


def _mix64_np(keys: np.ndarray) -> np.ndarray:
    z = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z ^ (z >> np.uint64(30))
        z = z * _SPLITMIX_C1
        z = z ^ (z >> np.uint64(27))
        z = z * _SPLITMIX_C2
        z = z ^ (z >> np.uint64(31))
    return z


def _mix32_np(keys: np.ndarray) -> np.ndarray:
    z = keys.astype(np.uint32)
    with np.errstate(over="ignore"):
        z = z ^ (z >> np.uint32(16))
        z = z * _MURMUR32_C1
        z = z ^ (z >> np.uint32(13))
        z = z * _MURMUR32_C2
        z = z ^ (z >> np.uint32(16))
    return z


def shard_of_np(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Host-side (numpy) twin of :func:`shard_of` — bit-identical, used by
    the checkpoint loader to partition saved keys by their CURRENT owner
    before any device transfer (so bulk restores never route through
    fixed-capacity all-to-all buffers)."""
    keys = np.asarray(keys)
    if keys.dtype in (np.int64, np.uint64):
        hi = (_mix64_np(keys) >> np.uint64(32)).astype(np.uint32)
    elif keys.dtype in (np.int32, np.uint32):
        hi = _mix32_np(_mix32_np(keys))
    else:
        raise ValueError(f"unsupported key dtype {keys.dtype}")
    return (hi % np.uint32(num_shards)).astype(np.int32)


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _fnv1a64_vectorized(strings) -> np.ndarray:
    """Column-vectorized FNV-1a64 + splitmix finalizer over a string batch
    (bit-identical to the native hkv_fnv1a64_batch)."""
    bs = [s.encode("utf-8") if isinstance(s, str) else bytes(s)
          for s in strings]
    n = len(bs)
    maxlen = max((len(b) for b in bs), default=0)
    mat = np.zeros((n, maxlen), np.uint8)
    lens = np.fromiter((len(b) for b in bs), np.int64, count=n)
    for i, b in enumerate(bs):
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
    h = np.full((n,), _FNV_OFFSET, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):  # vectorized over the batch per column
            active = j < lens
            hj = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(active, hj, h)
        h = h + _GOLDEN
        h = (h ^ (h >> np.uint64(30))) * _SPLITMIX_C1
        h = (h ^ (h >> np.uint64(27))) * _SPLITMIX_C2
        h = h ^ (h >> np.uint64(31))
    out = h.view(np.int64)
    out[out == EMPTY_KEY] += 1
    return out


def hash_strings(strings, dtype=np.int64, algo: str = "fnv1a") -> np.ndarray:
    """Host-side fingerprint of string keys to int64 (boundary op, not
    jitted).

    The reference supports string keys in its CPU tables (README.md:247-257);
    on TPU we fingerprint at the feature-pipeline boundary instead (SURVEY.md
    §7 "String keys"). ``fnv1a`` (default) runs through the multithreaded
    native batch hasher when built; ``blake2`` keeps the cryptographic
    variant. Both avoid the reserved EMPTY sentinel.
    """
    if algo == "blake2":
        out = np.empty(len(strings), dtype=np.uint64)
        for i, s in enumerate(strings):
            if isinstance(s, str):
                s = s.encode("utf-8")
            out[i] = np.frombuffer(
                hashlib.blake2b(s, digest_size=8).digest(), dtype=np.uint64
            )[0]
        out = out.view(np.int64).copy()
        out[out == EMPTY_KEY] += 1
        return out.astype(dtype)
    if algo != "fnv1a":
        raise ValueError(f"unknown algo {algo}")
    native = _native_hash(strings)
    if native is not None:
        return native.astype(dtype)
    return _fnv1a64_vectorized(strings).astype(dtype)


def _native_hash(strings):
    try:
        from recommenders_addons_tpu.native import get_lib
    except ImportError:
        return None
    lib = get_lib()
    if lib is None:
        return None
    import ctypes

    bs = [s.encode("utf-8") if isinstance(s, str) else bytes(s)
          for s in strings]
    data = b"".join(bs)
    offsets = np.zeros(len(bs) + 1, np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    out = np.empty(len(bs), np.int64)
    buf = ctypes.create_string_buffer(data, len(data) or 1)
    lib.hkv_fnv1a64_batch(
        ctypes.cast(buf, ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        len(bs),
        out.ctypes.data_as(ctypes.c_void_p),
        8,
    )
    return out
