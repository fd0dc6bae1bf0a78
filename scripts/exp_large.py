"""WavLM-Large single-chip tuning (round-4 verdict item 2).

The r4 Large entry ran blanket scan-remat (recompute the whole layer in
backward, ~+1/3 FLOPs) at B=2. HBM arithmetic says that is unnecessary:
fp32 params+opt ~3.8 GB + per-layer activations at B=4/T=768 ~2 GB leaves
slack in 16 GB even with only remat_ffn. This sweeps
{scan+full-remat, scan+ffn-remat, unroll+ffn-remat} x batch.

Usage: python -u scripts/exp_large.py <variant> <B>
  variant in {scanfull, scanffn, unroll}
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

NSAMP = 245_840


def build(variant: str, b: int):
    from unispeech_tpu.configs import (
        HubertPretrainConfig,
        MaskConfig,
        large_encoder_config,
    )
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    enc = large_encoder_config(
        relative_position_embedding=True,
        gru_rel_pos=True,
        encoder_layerdrop=0.05,
        dropout=0.1,
        attention_dropout=0.1,
        scan_layers=variant != "unroll",
        remat_layers=variant == "scanfull",
        remat_ffn=True,
    )
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,),
        final_dim=768,
    )
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    T = cfg.encoder.num_frames(NSAMP)
    np_rng = np.random.default_rng(0)
    wav = jnp.asarray(np_rng.standard_normal((b, NSAMP)), jnp.float32)
    targets = jnp.asarray(np_rng.integers(0, 504, (b, T, 1)), jnp.int32)

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


def main():
    variant, b = sys.argv[1], int(sys.argv[2])
    step, state, batch = build(variant, b)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    print(f"{variant} B={b}: compile+step0 {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss_per_sample']):.3f}", flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(m["loss_per_sample"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant} B={b}: {dt*1e3:.1f} ms/step "
          f"({b*NSAMP/16000.0/dt:.1f} audio-sec/s)", flush=True)


if __name__ == "__main__":
    main()
