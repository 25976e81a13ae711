"""Checkpoint / resume for solver and coreset state.

The reference's only resume machinery is coarse content-hash caching of
results and MCMC samples (SURVEY.md §5: results.py:13-17, mcmc_cache).
Here any pytree of arrays — snnls solver state, coreset slot arrays, PRNG
keys, MCMC chain state — round-trips through a single .npz file, so long
builds can stop and continue mid-stream (``build(itrs)`` is already
incremental).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree, meta: dict | None = None) -> None:
    """Save a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = _flatten(tree)
    arrays = {}
    for i, leaf in enumerate(leaves):
        # jax typed PRNG keys: serialize raw key data
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
                getattr(leaf, "dtype", None), jax.dtypes.prng_key):
            arrays[f"leaf_{i}__prngkey"] = np.asarray(jax.random.key_data(leaf))
            continue
        x = np.asarray(leaf)
        if x.dtype == object:
            raise TypeError(f"leaf {i} is not an array: {type(leaf)}")
        arrays[f"leaf_{i}"] = x
    arrays["__treedef__"] = np.frombuffer(
        str(jax.tree_util.tree_structure(tree)).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load(path: str, like=None):
    """Load a checkpoint.  If ``like`` (a pytree with the same structure) is
    given, the stored leaves are unflattened into that structure; otherwise a
    flat list of leaves is returned."""
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = []
        for i in range(n):
            if f"leaf_{i}__prngkey" in data.files:
                leaves.append(jax.random.wrap_key_data(
                    np.asarray(data[f"leaf_{i}__prngkey"])))
            else:
                leaves.append(data[f"leaf_{i}"])
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data.files else {}
    if like is None:
        return leaves, meta
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(f"checkpoint has {len(leaves)} leaves; template has "
                         f"{treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
