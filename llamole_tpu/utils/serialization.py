"""Param pytree persistence (msgpack via flax.serialization).

Counterpart of the reference's torch.save/torch.load model.pt handling
(diffusion_model.py:105-143 etc.) for JAX pytrees.
"""

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(host_tree))


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_state(tree: Any, path: str) -> None:
    """Persist pytrees containing tuples/namedtuples (e.g. optax state)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_state(target: Any, path: str) -> Any:
    """Restore into the structure of ``target``."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
