"""Checkpoint / resume of solver state pytrees via Orbax.

The reference's only 'recovery' story is warm-starting from x0 in memory
(SURVEY §5 — nothing is ever persisted).  Here any solver state — iterates,
duals, momentum terms, PRNG keys, P^2 quantile states — is a pytree and
round-trips through Orbax, so long solves on preemptible TPU pods can resume
mid-run.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_state", "load_state", "latest_checkpoint"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Persist a solver-state pytree (overwrites)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)


def load_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a solver-state pytree; with ``template`` the restored leaves
    adopt the template's structure/dtypes."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    if template is None:
        return restored

    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_r = jax.tree_util.tree_leaves(restored)
    if len(flat_t) != len(flat_r):
        raise ValueError("checkpoint does not match the template structure")
    import jax.numpy as jnp

    flat = [jnp.asarray(r, dtype=np.asarray(t).dtype) for r, t in zip(flat_r, flat_t)]
    return jax.tree_util.tree_unflatten(treedef, flat)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent checkpoint subdirectory of ``directory`` (by step suffix),
    or None."""
    if not os.path.isdir(directory):
        return None
    subs = [d for d in os.listdir(directory) if d.startswith("step_")]
    if not subs:
        return None
    best = max(subs, key=lambda d: int(d.split("_")[1]))
    return os.path.join(directory, best)
