"""LR schedule semantics vs the reference formulas
(src/fairseq/optim/lr_scheduler/)."""

import math

import numpy as np

from unispeech_tpu.train.optim import (
    OptimConfig,
    inverse_sqrt_schedule,
    make_schedule,
    polynomial_decay_schedule,
    tri_stage_schedule,
)


def test_inverse_sqrt_schedule_matches_reference():
    """inverse_square_root_schedule.py:70-85: linear warmup from
    warmup_init_lr, then decay_factor / sqrt(step) with
    decay_factor = lr * sqrt(warmup_updates)."""
    cfg = OptimConfig(
        lr=5e-4, schedule="inverse_sqrt", warmup_steps=4000,
        warmup_init_lr=1e-7,
    )
    fn = make_schedule(cfg)
    # warmup: linear from warmup_init_lr to lr
    lr_step = (cfg.lr - cfg.warmup_init_lr) / 4000
    for step in (0, 1, 1000, 3999):
        expect = cfg.warmup_init_lr + step * lr_step
        np.testing.assert_allclose(float(fn(step)), expect, rtol=1e-5)
    # post-warmup: lr * sqrt(warmup) / sqrt(step)
    for step in (4000, 8000, 100_000):
        expect = cfg.lr * math.sqrt(4000) / math.sqrt(step)
        np.testing.assert_allclose(float(fn(step)), expect, rtol=1e-5)
    # continuous at the boundary
    np.testing.assert_allclose(float(fn(4000)), cfg.lr, rtol=1e-5)


def test_inverse_sqrt_default_init():
    fn = inverse_sqrt_schedule(OptimConfig(lr=1e-3, warmup_steps=100))
    assert float(fn(0)) == 0.0
    np.testing.assert_allclose(float(fn(50)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(
        float(fn(400)), 1e-3 * math.sqrt(100) / math.sqrt(400), rtol=1e-5
    )
