"""Torch-weight conversion into ccst_tpu parameter trees.

The reference depends on two externally downloaded torch checkpoints
(``vgg_normalised.pth``, ``decoder.pth`` — reference README.md:21) plus
torchvision ImageNet weights for the classifier zoo (nets/resnet.py:326-345).
These functions map torch state dicts (OIHW convs) into our NHWC/HWIO pytrees
without importing torch at module scope, so the framework runs torch-free.

Also supports a portable ``.npz`` native format for converted weights.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from ccst_tpu.models.vgg import Conv, DECODER_ARCH, ENCODER_ARCH, Params


def _conv_names(arch: Sequence) -> list:
    return [l.name for l in arch if isinstance(l, Conv)]


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def from_torch_sequential(
    state_dict: Mapping[str, "np.ndarray"], arch: Sequence, dtype=jnp.float32
) -> Params:
    """Convert a torch ``nn.Sequential`` state dict (keys like ``"2.weight"``)
    whose conv order matches ``arch``'s Conv layers.

    Values may be torch tensors or numpy arrays.
    """
    # Sort the sequential indices numerically; each conv has weight+bias.
    def to_np(v):
        # copy: tensor.numpy() aliases torch memory and JAX CPU zero-copies
        # contiguous arrays (see convert_resnet._to_np)
        if hasattr(v, "detach"):
            return np.array(v.detach().cpu().numpy(), copy=True)
        return np.array(v, copy=True)

    weights = {}
    for key, val in state_dict.items():
        idx_s, kind = key.rsplit(".", 1)
        weights.setdefault(int(idx_s), {})[kind] = to_np(val)

    conv_entries = [weights[i] for i in sorted(weights)]
    names = _conv_names(arch)
    if len(conv_entries) < len(names):
        raise ValueError(
            f"state dict has {len(conv_entries)} convs; arch needs {len(names)}"
        )
    params: Params = {}
    for name, entry in zip(names, conv_entries):  # extra convs (relu4_2+) ignored
        params[name] = {
            "w": jnp.asarray(_oihw_to_hwio(entry["weight"]), dtype),
            "b": jnp.asarray(entry["bias"], dtype),
        }
    return params


def load_torch_pth(path: str, arch: Sequence, dtype=jnp.float32) -> Params:
    """Load a reference ``.pth`` file (requires torch, CPU-only)."""
    import torch  # local import: framework itself is torch-free

    state = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_sequential(state, arch, dtype)


def save_npz(path: str, params: Params) -> None:
    flat = {}
    for name, entry in params.items():
        flat[f"{name}/w"] = np.asarray(entry["w"])
        flat[f"{name}/b"] = np.asarray(entry["b"])
    np.savez(path, **flat)


def load_npz(path: str, dtype=jnp.float32) -> Params:
    params: Params = {}
    with np.load(path) as data:
        for key in data.files:
            name, kind = key.rsplit("/", 1)
            params.setdefault(name, {})[kind] = jnp.asarray(data[key], dtype)
    return params


def load_weights(path: str, arch: Sequence, dtype=jnp.float32) -> Params:
    """Dispatch on extension: ``.pth`` (torch) or ``.npz`` (native)."""
    if path.endswith(".npz"):
        return load_npz(path, dtype)
    if path.endswith((".pth", ".pt")):
        return load_torch_pth(path, arch, dtype)
    raise ValueError(f"unknown weight format: {path}")


def load_encoder(path: str, dtype=jnp.float32) -> Params:
    return load_weights(path, ENCODER_ARCH, dtype)


def load_decoder(path: str, dtype=jnp.float32) -> Params:
    return load_weights(path, DECODER_ARCH, dtype)
