"""Model / training-state persistence.

Two formats:

* reference-compatible pickles (the 12-array Keras ``get_weights()`` list)
  via decoders.gnn_feedback.load_reference_weights / save_reference_weights
  — needed for BLER parity with the 4 shipped trained models;
* native msgpack-free pytree checkpoints for arbitrary params/opt-state
  (training resume), written atomically.  We use numpy's npz rather than a
  heavyweight dependency: every leaf is an array and the treedef is
  reconstructed from sorted flat keys.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p).strip("[].'") for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(tree, path: str):
    """Atomically save an arbitrary array pytree to ``path``."""
    flat = _flatten_with_paths(tree)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    os.replace(tmp, path)


def load_pytree(path: str, like):
    """Load a pytree saved by save_pytree into the structure of ``like``."""
    data = np.load(path, allow_pickle=False)
    flat = _flatten_with_paths(like)
    leaves = []
    for key in flat:
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        leaves.append(data[key])
    treedef = jax.tree_util.tree_structure(like)
    flat_like = jax.tree_util.tree_leaves(like)
    assert len(leaves) == len(flat_like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
