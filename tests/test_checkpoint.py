"""Pytree checkpoint robustness: load must map leaves BY KEY, independent of
the npz file's insertion order (a checkpoint written by a different code
version may enumerate leaves differently), and must refuse key-set drift."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feedback_gnn_tpu.io.checkpoint import load_pytree, save_pytree


def _tree():
    return {
        "a": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)},
        "b": [jnp.full((4,), 2.0), jnp.full((2, 2), 7.0)],
    }


def test_roundtrip(tmp_path):
    t = _tree()
    path = str(tmp_path / "ck.npz")
    save_pytree(t, path)
    out = load_pytree(path, like=jax.tree.map(jnp.zeros_like, t))
    jax.tree.map(np.testing.assert_array_equal, out, t)


def test_load_is_order_independent(tmp_path):
    """Rewrite the npz with REVERSED key insertion order — a stand-in for a
    checkpoint produced by a different code version enumerating leaves in a
    different order — and verify values still land on the right leaves."""
    t = _tree()
    path = str(tmp_path / "ck.npz")
    save_pytree(t, path)
    data = dict(np.load(path))
    shuffled = str(tmp_path / "ck_shuffled.npz")
    np.savez(shuffled, **{k: data[k] for k in reversed(list(data))})

    out = load_pytree(shuffled, like=jax.tree.map(jnp.zeros_like, t))
    jax.tree.map(np.testing.assert_array_equal, out, t)


def test_load_rejects_missing_leaf(tmp_path):
    t = _tree()
    path = str(tmp_path / "ck.npz")
    save_pytree(t, path)
    data = dict(np.load(path))
    data.pop(list(data)[0])
    pruned = str(tmp_path / "ck_pruned.npz")
    np.savez(pruned, **data)
    with pytest.raises(KeyError):
        load_pytree(pruned, like=t)
