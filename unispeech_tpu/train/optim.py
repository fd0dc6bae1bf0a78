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
    return optax.chain(*parts)
