"""Multi-chip sharding for the estimator and trainers.

Parallelism design (SURVEY.md §2.9): the models are ~10M-param CNNs with
400-token attention — no TP/PP is warranted. The scaling axes are:

1. *Hypothesis-batch parallelism* for registration: the N pose
   hypotheses shard across chips on a 1-D mesh; rendering, crop
   building and the conv trunks are embarrassingly parallel, and the
   scorer's cross-hypothesis attention triggers exactly one ICI
   all-gather of (N, D) pooled features — inserted by GSPMD from the
   sharding annotations, not hand-written collectives.
2. *Data parallelism* for training (refiner/scorer supervision and the
   neural-object-field): batch sharded, params replicated, gradient
   psum via GSPMD.

Both are expressed with jax.sharding + jit; the same jitted functions
run single-chip when given unsharded inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import jax_config  # noqa: F401

HYP_AXIS = "hyp"
DATA_AXIS = "data"


def make_device_mesh(n_devices: int | None = None, axis: str = HYP_AXIS) -> Mesh:
    """1-D device mesh over the first n (default: all) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str | None = None) -> NamedSharding:
    """Shard the leading (batch/hypothesis) dim across the mesh."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 0, fill=0):
    """Pad axis to a multiple (static), returning (padded, valid_mask)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    if pad == 0:
        return x, jnp.asarray(mask)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill), jnp.asarray(mask)


def shard_hypotheses(poses: jax.Array, mesh: Mesh):
    """Pad hypothesis batch to the mesh size and place it sharded.

    Returns (sharded_poses, valid_mask) — padded entries are identity
    poses masked out of the final argmax.
    """
    n_dev = mesh.devices.size
    n = poses.shape[0]
    pad = (-n) % n_dev
    if pad:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), (pad, 4, 4))
        poses = jnp.concatenate([poses, eye], axis=0)
    mask = jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]))
    sharding = batch_sharding(mesh)
    return (
        jax.device_put(poses, sharding),
        jax.device_put(mask, sharding),
    )


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf replicated on the mesh (params, mesh tensors, frame)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
