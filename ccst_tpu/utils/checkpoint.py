"""Checkpoint save/restore for federated training state.

Replaces the reference's ``torch.save({'server_model': ..., 'model_{k}': ...,
'a_iter': ...})`` scheme (federated/fed_run.py:734-766) with msgpack-
serialized pytrees (flax.serialization): one ``latest`` file per run plus a
``best`` file chosen by mean source-validation accuracy (:748-766).

An **Orbax** backend is available for deployments that want async /
multi-host-aware checkpointing: pass ``backend="orbax"`` (or point ``path``
at an existing Orbax directory for loading — the format is autodetected).
msgpack stays the default: single-file, atomic-rename, dependency-light.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, payload: Dict[str, Any], backend: str = "msgpack") -> None:
    if backend == "orbax":
        _orbax_checkpointer().save(
            os.path.abspath(path), _to_host(payload), force=True
        )
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never corrupts the latest ckpt


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):  # Orbax checkpoints are directories
        return _orbax_checkpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def checkpoint_paths(save_path: str, run_name: str) -> Dict[str, str]:
    base = os.path.join(save_path, run_name)
    return {"latest": base + "_latest.ckpt", "best": base + "_best.ckpt"}
