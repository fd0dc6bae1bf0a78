"""Experiment: scan-of-layers vs unrolled layers at Base bench shapes.

The r5 trace shows ~9.2 ms/step of dynamic-update-slice fusions copying the
whole (L, ...) stacked-dW buffers every scan iteration (no in-place
aliasing), ~2.8 ms of per-layer param dynamic-slices, ~1.5 ms of constant
slices and ~2 ms of stacked-residual DUS — all artifacts of nn.scan over
layers. The unrolled path (scan_layers=False) has per-layer params, so dW
tensors are written once each with no stacking. This measures both in one
process. Usage: python -u scripts/exp_unroll.py [unroll|scan|both]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, NSAMP = 8, 245_840


def build(scan_layers: bool, scan_unroll: bool = False):
    from unispeech_tpu.configs import (
        HubertPretrainConfig,
        MaskConfig,
        base_encoder_config,
    )
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    enc = base_encoder_config(
        relative_position_embedding=True,
        gru_rel_pos=True,
        encoder_layerdrop=0.05,
        dropout=0.1,
        attention_dropout=0.1,
        remat_ffn=True,
        scan_layers=scan_layers,
        scan_unroll=scan_unroll,
    )
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,),
        final_dim=256,
    )
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    T = cfg.encoder.num_frames(NSAMP)
    np_rng = np.random.default_rng(0)
    wav = jnp.asarray(np_rng.standard_normal((B, NSAMP)), jnp.float32)
    targets = jnp.asarray(np_rng.integers(0, 504, (B, T, 1)), jnp.int32)

    cfg_init = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(
            enc, use_flash_attention=False, use_fused_conv=False
        ),
    )
    model_init = HubertPretrainModel(cfg_init, dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        w_small = jnp.asarray(np_rng.standard_normal((1, 8000)), jnp.float32)
        t_small = jnp.asarray(
            np_rng.integers(0, 504, (1, cfg.encoder.num_frames(8000), 1)),
            jnp.int32,
        )
        variables = model_init.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            w_small, t_small, mask=True, deterministic=True,
        )
    tx = make_optimizer(OptimConfig(lr=5e-4, warmup_steps=100, total_steps=1000))
    state = create_train_state(variables["params"], tx)
    state = jax.device_put(state, jax.devices()[0])
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx)
    return step, state, {"source": wav, "targets": targets}


def run(tag, scan_layers, scan_unroll=False):
    step, state, batch = build(scan_layers, scan_unroll)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    print(f"{tag}: compile+step0 {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss_per_sample']):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch, rng)
    float(m["loss_per_sample"])
    dt = (time.perf_counter() - t0) / 20
    print(f"{tag}: {dt*1e3:.1f} ms/step "
          f"({B*NSAMP/16000.0/dt:.0f} audio-sec/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("unroll", "both"):
        run("unroll", False)
    if which in ("scan", "both"):
        run("scan", True)
    if which == "scanunroll":
        run("scanunroll", True, True)
