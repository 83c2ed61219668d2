"""Training steps for the refiner and scorer networks.

The reference shipped only the config schema of its (lost) trainer
(learning/training/training_config.py:18-100: adam lr 1e-4, batch 64,
loss l2/l1/add for the refiner, pairwise_valid for the scorer); this
module provides working TPU-native equivalents: pure jitted update steps
over optax state, data-parallel over a 1-D device mesh via sharding
annotations (gradient psum inserted by GSPMD).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from .. import jax_config  # noqa: F401
from .networks import (
    RefineNetCfg,
    ScoreNetCfg,
    apply_refine_net,
    apply_score_net,
)


@dataclasses.dataclass(frozen=True)
class TrainCfg:
    lr: float = 1e-4
    weight_decay: float = 0.0
    loss_type: str = "l2"  # l1 | l2 (refiner)
    compute_dtype: str = "bfloat16"


def make_optimizer(cfg: TrainCfg):
    if cfg.weight_decay > 0:
        return optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.lr)


def refine_loss_fn(params, net_cfg: RefineNetCfg, batch, loss_type: str, dtype):
    """batch: {'A','B': (N,160,160,c), 'trans_target': (N,3),
    'rot_target': (N,rot_dim)} — targets in the network's output space."""
    out = apply_refine_net(params, net_cfg, batch["A"], batch["B"], dtype=dtype)
    if loss_type == "l1":
        lt = jnp.abs(out["trans"] - batch["trans_target"]).mean()
        lr_ = jnp.abs(out["rot"] - batch["rot_target"]).mean()
    else:
        lt = jnp.square(out["trans"] - batch["trans_target"]).mean()
        lr_ = jnp.square(out["rot"] - batch["rot_target"]).mean()
    return lt + lr_


def score_loss_fn(params, net_cfg: ScoreNetCfg, batch, dtype):
    """Pairwise-valid contrastive loss (training_config.py:52): the
    hypothesis group's logits are softmaxed against ADD-derived soft
    targets in batch['target'] (L,)."""
    logits = apply_score_net(params, net_cfg, batch["A"], batch["B"], dtype=dtype)
    return optax.softmax_cross_entropy(
        logits[None], jax.nn.softmax(batch["target"])[None]
    ).mean()


@functools.partial(jax.jit, static_argnames=("net_cfg", "train_cfg"))
def refine_train_step(params, opt_state, net_cfg: RefineNetCfg, train_cfg: TrainCfg, batch):
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    loss, grads = jax.value_and_grad(refine_loss_fn)(
        params, net_cfg, batch, train_cfg.loss_type, dtype
    )
    updates, opt_state = make_optimizer(train_cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("net_cfg", "train_cfg"))
def score_train_step(params, opt_state, net_cfg: ScoreNetCfg, train_cfg: TrainCfg, batch):
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    loss, grads = jax.value_and_grad(score_loss_fn)(params, net_cfg, batch, dtype)
    updates, opt_state = make_optimizer(train_cfg).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
