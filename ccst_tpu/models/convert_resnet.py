"""torchvision ResNet (ImageNet) -> flax zoo weight conversion.

The reference initializes its classifiers from torchvision ImageNet weights
with ``strict=False`` so the renamed ``class_classifier`` head stays random
(nets/resnet.py:326-345,350-370). Equivalent here: convert every backbone
tensor, leave the head at its fresh init. File-gated — this environment has
no network, so the ``.pth`` must be provided (torch hub cache or an explicit
path); absent weights fall back to random init with a warning.

Key mapping (torchvision state dict -> our flax tree):
  conv1.weight                 -> params['conv1']['kernel']          (OIHW->HWIO)
  bn1.{weight,bias}            -> params['bn1']{scale,bias}
  bn1.running_{mean,var}       -> batch_stats['bn1']{mean,var}
  layer{L}.{B}.conv{k}.weight  -> params['layer{L}_{B-0}']['Conv_{k-1}']
  layer{L}.{B}.bn{k}.*         -> params['layer{L}_{B}']['bn{k}'] / stats
  layer{L}.{B}.downsample.0/1  -> Conv_{n}/bn_down of the same block
  fc.*                         -> skipped (head renamed; random init)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np


def _to_np(v) -> np.ndarray:
    """ALWAYS copies. ``tensor.numpy()`` shares memory with the live torch
    tensor, and JAX CPU zero-copies contiguous numpy arrays — without the
    copy, converted params silently track subsequent in-place updates of
    the source torch model (observed: a torch optimizer step mutating
    already-converted jax params)."""
    if hasattr(v, "detach"):
        return np.array(v.detach().cpu().numpy(), copy=True)
    return np.array(v, copy=True)


def convert_torchvision_resnet(
    state_dict: Mapping[str, Any],
    params: Dict,
    batch_stats: Dict,
) -> Tuple[Dict, Dict]:
    """Overlay torchvision backbone weights onto freshly-initialized flax
    variables (returned trees are new; inputs untouched). Unknown/renamed
    head keys ('fc.*') are skipped like the reference's strict=False load."""
    import copy

    params = copy.deepcopy(jnp_to_np_tree(params))
    batch_stats = copy.deepcopy(jnp_to_np_tree(batch_stats))

    n_convs_per_block: Dict[str, int] = {}

    for key, val in state_dict.items():
        arr = _to_np(val)
        parts = key.split(".")
        if parts[0] == "fc" or "num_batches_tracked" in key:
            continue
        if parts[0] == "conv1":
            params["conv1"]["kernel"] = np.transpose(arr, (2, 3, 1, 0))
        elif parts[0] == "bn1":
            _assign_bn(params, batch_stats, ["bn1"], parts[1], arr)
        elif parts[0].startswith("layer"):
            stage = parts[0]              # layer1
            block = f"{stage}_{parts[1]}"  # layer1_0
            rest = parts[2:]
            if rest[0].startswith("conv"):
                k = int(rest[0][4:]) - 1
                params[block][f"Conv_{k}"]["kernel"] = np.transpose(arr, (2, 3, 1, 0))
                n_convs_per_block[block] = max(n_convs_per_block.get(block, 0), k + 1)
            elif rest[0].startswith("bn"):
                _assign_bn(params[block], batch_stats.get(block, {}), [rest[0]], rest[1], arr)
            elif rest[0] == "downsample":
                if rest[1] == "0":  # conv
                    # downsample conv is the LAST Conv_i created in the block
                    idx = max(
                        int(name.split("_")[1])
                        for name in params[block]
                        if name.startswith("Conv_")
                    )
                    params[block][f"Conv_{idx}"]["kernel"] = np.transpose(
                        arr, (2, 3, 1, 0)
                    )
                else:  # downsample.1 = bn
                    _assign_bn(
                        params[block], batch_stats.get(block, {}), ["bn_down"],
                        rest[2], arr,
                    )
        else:
            continue
    return np_to_jnp_tree(params), np_to_jnp_tree(batch_stats)


def _assign_bn(params_sub, stats_sub, path, kind, arr) -> None:
    name = path[0]
    if kind == "weight":
        params_sub[name]["scale"] = arr
    elif kind == "bias":
        params_sub[name]["bias"] = arr
    elif kind == "running_mean":
        if name in stats_sub:
            stats_sub[name]["mean"] = arr
    elif kind == "running_var":
        if name in stats_sub:
            stats_sub[name]["var"] = arr


def jnp_to_np_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def np_to_jnp_tree(tree):
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x), tree)


def load_imagenet_resnet(
    path: str, params: Dict, batch_stats: Dict
) -> Tuple[Dict, Dict, bool]:
    """Load torchvision weights from ``path`` if it exists; returns
    (params, batch_stats, loaded?). Mirrors the reference's local-cache-or-
    download gate (nets/resnet.py:339-345) minus the download."""
    import os

    if not path or not os.path.exists(path):
        return params, batch_stats, False
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    new_p, new_s = convert_torchvision_resnet(state, params, batch_stats)
    return new_p, new_s, True
