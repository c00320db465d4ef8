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


def is_trainable_path(path: Tuple[str, ...],
                      frozen_scopes: Tuple[str, ...] = FROZEN_SCOPES) -> bool:
    """True if the param at `path` should train.

    Frozen: anything under a backbone scope in `frozen_scopes` unless the
    path also crosses an adapter/MoE scope. Everything else (heads, temporal
    attn, MoE adapters, task projections) trains.

    `frozen_scopes` exists because the reference drivers disagree per task:
    AVE/AVVP/AVQA and AVS-MS3 freeze both backbones, but the AVS-S4 scan only
    matches 'ViT'/'swin' names so its HTS-AT audio backbone TRAINS
    (avs_s4/train_v2.py:146-163 has no htsat branch, unlike
    avs_ms3/train_v2.py:128-131) — S4 passes ('swin',)."""
    if any(any(m in part for m in TRAINABLE_MARKERS) for part in path):
        return True
    return not any(part in frozen_scopes for part in path)


def trainable_mask(params, frozen_scopes: Tuple[str, ...] = FROZEN_SCOPES) -> Any:
    """Pytree of bools, True where trainable."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: is_trainable_path(k, frozen_scopes) for k in flat}
    return traverse_util.unflatten_dict(mask)


def partition_params(
    params, frozen_scopes: Tuple[str, ...] = FROZEN_SCOPES
) -> Tuple[Dict, Dict]:
    """Split params into (trainable, frozen) flat-path dicts."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items()
                 if is_trainable_path(k, frozen_scopes)}
    frozen = {k: v for k, v in flat.items()
              if not is_trainable_path(k, frozen_scopes)}
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


def param_report(params,
                 frozen_scopes: Tuple[str, ...] = FROZEN_SCOPES) -> Dict[str, float]:
    """Trainable / additional / total parameter stats, as the reference prints
    (main_trans_v3.py:317-319)."""
    trainable, frozen = partition_params(params, frozen_scopes)
    t, f = count_params(trainable), count_params(frozen)
    total = t + f
    return {
        "trainable": t,
        "frozen": f,
        "total": total,
        "trainable_pct": 100.0 * t / total,
        "additional_pct": 100.0 * t / max(f, 1),
    }
