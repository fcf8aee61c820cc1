"""Table observability (reference exposes only `Variable.size()` and
export_keys_and_scores — SURVEY.md §5 'Metrics'; this is a superset)."""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from recommenders_addons_tpu.ops import hashtable


@dataclasses.dataclass
class TableStats:
    capacity: int
    live: int
    load_factor: float
    bucket_p50: float
    bucket_p99: float
    bucket_max: int
    full_buckets: int
    score_min: int
    score_max: int

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


def table_stats(spec: hashtable.TableSpec,
                state: hashtable.TableState) -> TableStats:
    """Occupancy / bucket-skew / score-range stats (host-side; one
    device->host transfer of the key and score columns)."""
    mask = np.asarray(jax.device_get(hashtable.occupancy_mask(spec, state)))
    scores = np.asarray(jax.device_get(state.scores))
    per_bucket = mask.reshape(spec.num_buckets, spec.bucket_size).sum(1)
    live = int(mask.sum())
    live_scores = scores[mask] if live else np.zeros((1,), scores.dtype)
    return TableStats(
        capacity=spec.capacity,
        live=live,
        load_factor=live / spec.capacity,
        bucket_p50=float(np.percentile(per_bucket, 50)),
        bucket_p99=float(np.percentile(per_bucket, 99)),
        bucket_max=int(per_bucket.max()),
        full_buckets=int((per_bucket == spec.bucket_size).sum()),
        score_min=int(live_scores.min()),
        score_max=int(live_scores.max()),
    )


def lookup_hit_rate(ctx) -> jax.Array:
    """Fraction of (non-padding) unique keys found by a training lookup —
    jit-safe scalar from a LookupContext."""
    valid = ctx.unique_keys != jnp.iinfo(jnp.int64).min
    hits = jnp.sum(ctx.found & valid)
    return hits / jnp.maximum(jnp.sum(valid), 1)
