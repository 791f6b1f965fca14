"""Full training checkpoints (resume support).

The reference's only checkpoint is the Gaussian PLY, with NO resume — Adam
moments, step count and RNG state are lost (reference: trainer.cpp:318-328,
SURVEY.md §5.4). Here the complete train state round-trips: parameters, alive
mask, Adam moments + count, densification accumulators, RNG key, and step.
PLY export remains the interop format; this is the recovery format.
"""
from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_train_checkpoint(path: str, state, step: int):
    """state: tpugs.train.trainer.TrainState. Writes one .npz + sidecar json."""
    flat = {}
    flat.update(_flatten(state.params, "params/"))
    flat["alive"] = np.asarray(state.alive)
    flat.update(_flatten(state.adam.m, "adam_m/"))
    flat.update(_flatten(state.adam.v, "adam_v/"))
    flat["adam_count"] = np.asarray(state.adam.count)
    flat["adc_grad_accum"] = np.asarray(state.adc.grad_accum)
    flat["adc_grad_count"] = np.asarray(state.adc.grad_count)
    flat["adc_max_radii"] = np.asarray(state.adc.max_radii)
    flat["key"] = np.asarray(state.key)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    with open(path + ".json", "w") as f:
        json.dump({"step": step, "format": "tpugs-ckpt-v1"}, f)


def load_train_checkpoint(path: str) -> Tuple[object, int]:
    """-> (TrainState, step)."""
    from tpugs.optim.adam import AdamState
    from tpugs.optim.densify_adc import ADCState
    from tpugs.train.trainer import TrainState

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    adam_m = _unflatten({k[len("adam_m/"):]: v for k, v in flat.items()
                         if k.startswith("adam_m/")})
    adam_v = _unflatten({k[len("adam_v/"):]: v for k, v in flat.items()
                         if k.startswith("adam_v/")})
    state = TrainState(
        params=params,
        alive=jnp.asarray(flat["alive"]),
        adam=AdamState(
            m=adam_m, v=adam_v, count=jnp.asarray(flat["adam_count"])
        ),
        adc=ADCState(
            grad_accum=jnp.asarray(flat["adc_grad_accum"]),
            grad_count=jnp.asarray(flat["adc_grad_count"]),
            max_radii=jnp.asarray(flat["adc_max_radii"]),
        ),
        key=jnp.asarray(flat["key"]),
    )
    with open(path + ".json") as f:
        meta = json.load(f)
    return state, int(meta["step"])
