"""Optimizers and LR schedules (optax).

Replaces the reference's optimizer layer (src/fairseq/optim/): FusedAdam /
FP16Optimizer / DynamicLossScaler collapse into optax adamw on fp32 params
with bf16 compute — no loss scaling needed on TPU. Schedules mirror
polynomial_decay (src/fairseq/optim/lr_scheduler/polynomial_decay_schedule.py)
and tri_stage (tri_stage_lr_scheduler.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 5e-4
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-6
    weight_decay: float = 0.01
    clip_norm: float = 0.0  # 0 disables (fairseq default)
    schedule: str = "polynomial_decay"  # polynomial_decay | tri_stage | fixed
    total_steps: int = 400_000
    warmup_steps: int = 32_000
    # polynomial_decay
    end_learning_rate: float = 0.0
    power: float = 1.0
    # tri_stage
    hold_steps: int = 0
    decay_steps: int = 0
    init_lr_scale: float = 0.01
    final_lr_scale: float = 0.05
    # inverse_sqrt
    warmup_init_lr: float = 0.0
    # group same-shape leaves into stacked arrays for the update
    # (stack_like_leaves): big single fusions instead of one per leaf.
    # Exact for uniform adamw + global clip; off by default (FSDP keeps
    # per-leaf opt-state sharding)
    stacked_update: bool = False


def polynomial_decay_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup from 0, then (lr-end)*(1-progress)^power + end
    (polynomial_decay_schedule.py:60-77)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warmup = jnp.maximum(cfg.warmup_steps, 1)
        warm_lr = cfg.lr * step / warmup
        total = jnp.maximum(cfg.total_steps - cfg.warmup_steps, 1)
        pct = jnp.clip((step - cfg.warmup_steps) / total, 0.0, 1.0)
        decayed = (cfg.lr - cfg.end_learning_rate) * (1.0 - pct) ** cfg.power + (
            cfg.end_learning_rate
        )
        return jnp.where(step < cfg.warmup_steps, warm_lr, decayed)

    return fn


def tri_stage_schedule(cfg: OptimConfig) -> optax.Schedule:
    """warmup (init_lr_scale*lr -> lr), hold, exp decay to final_lr_scale*lr
    (tri_stage_lr_scheduler.py:32-174)."""
    init_lr = cfg.init_lr_scale * cfg.lr
    final_lr = cfg.final_lr_scale * cfg.lr
    decay_steps = cfg.decay_steps or max(
        cfg.total_steps - cfg.warmup_steps - cfg.hold_steps, 1
    )
    decay_factor = -math.log(cfg.final_lr_scale) / decay_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (cfg.lr - init_lr) * jnp.clip(
            step / jnp.maximum(cfg.warmup_steps, 1), 0.0, 1.0
        )
        in_decay = step - cfg.warmup_steps - cfg.hold_steps
        dec = cfg.lr * jnp.exp(-decay_factor * jnp.clip(in_decay, 0.0, decay_steps))
        lr = jnp.where(
            step < cfg.warmup_steps,
            warm,
            jnp.where(step < cfg.warmup_steps + cfg.hold_steps, cfg.lr, dec),
        )
        return jnp.maximum(lr, final_lr * jnp.where(in_decay >= decay_steps, 1.0, 0.0))

    return fn


def inverse_sqrt_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Linear warmup from warmup_init_lr to lr, then lr * sqrt(warmup/step)
    (src/fairseq/optim/lr_scheduler/inverse_square_root_schedule.py:15-85:
    decay_factor = lr * sqrt(warmup_updates); lr_t = decay_factor/sqrt(t))."""
    warmup = max(cfg.warmup_steps, 1)
    lr_step = (cfg.lr - cfg.warmup_init_lr) / warmup
    decay_factor = cfg.lr * math.sqrt(warmup)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.warmup_init_lr + step * lr_step
        dec = decay_factor * jax.lax.rsqrt(jnp.maximum(step, 1.0))
        return jnp.where(step < warmup, warm, dec)

    return fn


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "polynomial_decay":
        return polynomial_decay_schedule(cfg)
    if cfg.schedule == "tri_stage":
        return tri_stage_schedule(cfg)
    if cfg.schedule == "inverse_sqrt":
        return inverse_sqrt_schedule(cfg)
    if cfg.schedule == "fixed":
        return lambda step: jnp.float32(cfg.lr)
    raise ValueError(cfg.schedule)


def stack_like_leaves(
    tx: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Run `tx` over same-shape/dtype leaf GROUPS stacked into single
    arrays.

    With unrolled transformer layers the param tree has ~60 small leaves
    and XLA emits one elementwise fusion per leaf for the adam update
    (~7.2 ms/step at WavLM-Base B=16 vs ~2.6 on the scan path's stacked
    params). MEASURED NEGATIVE on v5e (B=24 A/B: 1713 vs 1761
    audio-sec/s): the stack/unstack copy passes cost more than the
    per-leaf overhead they remove — that adam time is HBM-traffic-bound,
    not launch-bound. Kept as an opt-in for runtimes where per-fusion
    launch overhead dominates (e.g. many tiny leaves).

    Exact for any elementwise transform with uniform hyper-parameters
    (adam/adamw here: uniform decoupled decay) and for global-norm clipping
    (the norm is over all leaves either way). NOT safe around per-leaf
    masked/labelled transforms — compose those outside. Optimizer state
    takes the stacked structure (consistent within a run; checkpoints
    restore it verbatim; under FSDP the stacked m/v fall back to
    replicated placement, so leave this off for sharded-optimizer runs).
    """

    def _plan(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        groups = {}
        for i, leaf in enumerate(leaves):
            key = (tuple(leaf.shape), jnp.result_type(leaf).name)
            groups.setdefault(key, []).append(i)
        return treedef, [tuple(g) for g in groups.values()], len(leaves)

    def _stack(tree, plan):
        leaves = jax.tree_util.tree_leaves(tree)
        return [
            jnp.stack([leaves[i] for i in g]) if len(g) > 1 else leaves[g[0]]
            for g in plan
        ]

    def _unstack(stacked, plan, n, treedef):
        out = [None] * n
        for s, g in zip(stacked, plan):
            if len(g) > 1:
                for j, i in enumerate(g):
                    out[i] = s[j]
            else:
                out[g[0]] = s
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        _, plan, _ = _plan(params)
        return tx.init(_stack(params, plan))

    def update(grads, state, params=None):
        treedef, plan, n = _plan(grads)
        sg = _stack(grads, plan)
        sp = _stack(params, plan) if params is not None else None
        su, state = tx.update(sg, state, sp)
        return _unstack(su, plan, n, treedef), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW + optional global-norm clip, LR by schedule.

    Matches FairseqAdam (src/fairseq/optim/adam.py: betas (0.9,0.98),
    eps 1e-6 in pretrain recipes, decoupled weight decay).
    """
    sched = make_schedule(cfg)
    parts = []
    if cfg.clip_norm and cfg.clip_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_norm))
    parts.append(
        optax.adamw(
            learning_rate=sched,
            b1=cfg.adam_betas[0],
            b2=cfg.adam_betas[1],
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        )
    )
    tx = optax.chain(*parts)
    if cfg.stacked_update:
        tx = stack_like_leaves(tx)
    return tx
