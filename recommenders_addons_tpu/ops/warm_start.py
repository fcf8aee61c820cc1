"""Warm-starting tables from a previous run's checkpoint
(reference python/ops/warm_start_util.py:69-198).

The reference rewrites saveable spec names `{var}_mht_{i}of{n}` so a new
variable restores from an old variable's shards. Here the same capability is
a name-mapped sidecar load: point a variable at another variable's KV files
(possibly under a different name and shard topology) and bulk-insert — the
owner-routing import re-shards automatically.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Union

from recommenders_addons_tpu.ops import hashtable
from recommenders_addons_tpu.train import checkpoint as ckpt_lib


def warm_start(
    vars_and_states: Dict[object, hashtable.TableState],
    ckpt_to_initialize_from: str,
    vars_to_warm_start: Union[str, Sequence[str]] = ".*",
    var_name_to_prev_var_name: Optional[Dict[str, str]] = None,
    global_step: Optional[int] = "latest",
) -> Dict[object, hashtable.TableState]:
    """Load matching variables' rows from a previous checkpoint directory.

    Args mirror the reference `warm_start` (warm_start_util.py:69-148):
    ``vars_to_warm_start`` is a regex (or list of regexes/names) matched
    against variable names; ``var_name_to_prev_var_name`` maps a current
    variable name to the name it had in the old checkpoint.

    Returns {var_or_sharded: new_state} for every entry (warm-started or
    passed through).
    """
    import dataclasses

    name_map = var_name_to_prev_var_name or {}
    if isinstance(vars_to_warm_start, str):
        patterns = [vars_to_warm_start]
    else:
        patterns = list(vars_to_warm_start)
    if global_step == "latest":
        global_step = ckpt_lib.latest_checkpoint(ckpt_to_initialize_from)

    out = {}
    for var_or_sharded, state in vars_and_states.items():
        var = ckpt_lib._var_of(var_or_sharded)
        if not any(re.match(p + r"$", var.name) or p == var.name
                   for p in patterns):
            out[var_or_sharded] = state
            continue
        prev = name_map.get(var.name, var.name)
        loader = var_or_sharded
        if prev != var.name:
            # read the old name's files through a renamed view
            if hasattr(var_or_sharded, "var"):
                loader = dataclasses.replace(
                    var_or_sharded,
                    var=dataclasses.replace(var, name=prev),
                )
            else:
                loader = dataclasses.replace(var, name=prev)
        out[var_or_sharded] = ckpt_lib.load_dynamic_embedding(
            loader, state, ckpt_to_initialize_from, global_step=global_step
        )
    return out


class WarmStartHook:
    """Parity shim for the reference's SessionRunHook
    (warm_start_util.py:151-198): call once before training."""

    def __init__(self, ckpt_dir: str, vars_to_warm_start=".*", **kwargs):
        self.ckpt_dir = ckpt_dir
        self.vars_to_warm_start = vars_to_warm_start
        self.kwargs = kwargs

    def __call__(self, vars_and_states):
        return warm_start(
            vars_and_states, self.ckpt_dir, self.vars_to_warm_start,
            **self.kwargs,
        )
