"""Parameter freezing: frozen backbones vs trainable adapters + heads.

The reference freezes by name scan at driver level (requires_grad=False for
'swin'/'htsat', True for 'adapter_blocks'/'CMBS'/'temporal_attn'/'mlp_class',
ref: AVMOE/AVE/main_trans_v3.py:268-315). The TPU-native equivalent partitions
the param pytree so gradients are only ever computed/materialized for the
trainable subtree - frozen backbone weights never get grad buffers or
optimizer state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
from flax import traverse_util

FROZEN_SCOPES = ("swin", "htsat")
# adapter/head modules living inside the encoder scope stay trainable
TRAINABLE_MARKERS = ("moe", "adapter")


def is_trainable_path(path: Tuple[str, ...]) -> bool:
    """True if the param at `path` should train.

    Frozen: anything under a backbone scope ('swin', 'htsat') unless the path
    also crosses an adapter/MoE scope. Everything else (heads, temporal attn,
    MoE adapters, task projections) trains."""
    if any(any(m in part for m in TRAINABLE_MARKERS) for part in path):
        return True
    return not any(part in FROZEN_SCOPES for part in path)


def trainable_mask(params) -> Any:
    """Pytree of bools, True where trainable."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: is_trainable_path(k) for k in flat}
    return traverse_util.unflatten_dict(mask)


def partition_params(params) -> Tuple[Dict, Dict]:
    """Split params into (trainable, frozen) flat-path dicts."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if is_trainable_path(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable_path(k)}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable, frozen) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def param_report(params) -> Dict[str, float]:
    """Trainable / additional / total parameter stats, as the reference prints
    (main_trans_v3.py:317-319)."""
    trainable, frozen = partition_params(params)
    t, f = count_params(trainable), count_params(frozen)
    total = t + f
    return {
        "trainable": t,
        "frozen": f,
        "total": total,
        "trainable_pct": 100.0 * t / total,
        "additional_pct": 100.0 * t / max(f, 1),
    }
