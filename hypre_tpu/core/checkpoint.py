"""Solver-state checkpointing.

The reference only checkpoints matrices/vectors (HYPRE_IJMatrixPrint/
Read; setup is always recomputed — SURVEY §5).  Here the setup phase is
the expensive host-side part, so the assembled hierarchy itself is
worth persisting: save writes every pytree leaf as numpy plus the
pickled tree structure; load restores device arrays.  Works for any
registered hierarchy pytree (BoomerAMG, PFMG, SMG, ParBoomerAMG).
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

# bump when any registered-pytree layout changes (e.g. the ELL
# transposition): a stale checkpoint would otherwise be reinterpreted
# silently as garbage
FORMAT_VERSION = 2


def save_pytree(tree, path: str) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    np_leaves = [np.asarray(x) for x in leaves]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": np_leaves}, f)


def load_pytree(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jnp.asarray(x) for x in blob["leaves"]]
    return jax.tree.unflatten(blob["treedef"], leaves)


def save_amg(amg, path: str) -> None:
    """Persist a BoomerAMG object's hierarchy + stats."""
    leaves, treedef = jax.tree.flatten(amg.hierarchy)
    with open(path, "wb") as f:
        pickle.dump({
            "version": FORMAT_VERSION,
            "treedef": treedef,
            "leaves": [np.asarray(x) for x in leaves],
            "level_sizes": list(amg.level_sizes),
            "level_nnz": list(amg.level_nnz),
            "config": amg.config,
        }, f)


def load_amg(path: str):
    from hypre_tpu.solvers.amg import BoomerAMG

    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob.get("version") != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint {path} has format {blob.get('version')}, "
            f"expected {FORMAT_VERSION}; re-run setup")
    amg = BoomerAMG(blob["config"])
    leaves = [jnp.asarray(x) for x in blob["leaves"]]
    amg.hierarchy = jax.tree.unflatten(blob["treedef"], leaves)
    amg.level_sizes = [int(x) for x in blob["level_sizes"]]
    amg.level_nnz = [int(x) for x in blob["level_nnz"]]
    if amg.level_nnz:
        amg.operator_complexity = sum(amg.level_nnz) / amg.level_nnz[0]
        amg.grid_complexity = sum(amg.level_sizes) / amg.level_sizes[0]
    return amg
