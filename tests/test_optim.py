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


def test_stacked_update_matches_plain():
    """stack_like_leaves(adamw) regroups elementwise math only, so updates
    must match the per-leaf transform to reduction-order noise (the global
    clip norm sums squares in a different grouping: ulp-level rtol)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unispeech_tpu.train.optim import OptimConfig, make_optimizer

    rng = np.random.default_rng(0)
    params = {
        "a": {f"layer_{i}": jnp.asarray(rng.standard_normal((4, 6)),
                                        jnp.float32) for i in range(3)},
        "b": jnp.asarray(rng.standard_normal((5,)), jnp.float32),
        "c": jnp.asarray(rng.standard_normal((4, 6)), jnp.float32),
    }
    cfg = dict(lr=1e-2, schedule="fixed", clip_norm=1.0, weight_decay=0.01)
    plain = make_optimizer(OptimConfig(**cfg))
    stacked = make_optimizer(OptimConfig(**cfg, stacked_update=True))

    sp = plain.init(params)
    ss = stacked.init(params)
    p1, p2 = params, params
    for step in range(3):
        grads = jax.tree.map(
            lambda x: jnp.asarray(
                rng.standard_normal(x.shape) * (step + 1), jnp.float32
            ),
            params,
        )
        u1, sp = plain.update(grads, sp, p1)
        u2, ss = stacked.update(grads, ss, p2)
        for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-8)
        p1 = jax.tree.map(lambda p, u: p + u, p1, u1)
        p2 = jax.tree.map(lambda p, u: p + u, p2, u2)
