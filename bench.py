"""Benchmark: WavLM-Base masked-prediction pretraining throughput on 1 chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/s/chip", "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
is reported against a derived speed-of-light anchor for this workload on a
TPU v5e chip (394 bf16 TFLOP/s peak):

  Base fwd ≈ 15.5 GFLOP per audio-second (12-layer 768d transformer at
  50 frames/s ≈ 8.5 GF + conv frontend ≈ 45% of total, SURVEY.md §3.1);
  train step ≈ 3x fwd ≈ 46.5 GF/audio-sec
  => 100% MFU ≈ 8470 audio-sec/s/chip. Anchor = 40% MFU ≈ 3400 audio-sec/s
  (a strong GPU-era implementation's typical utilization), so
  vs_baseline = value / 3400. >1.0 beats that anchor.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: the full Pallas+scan+remat train step takes
# minutes to compile cold; warm runs (same machine, same jax) start in seconds.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_AUDIO_SEC_PER_S = 3400.0


def main():
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
    )
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,),
        final_dim=256,
    )
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)

    # reference batch anchor: max_tokens 1.4M samples/GPU ≈ 87.5 audio-sec
    # (examples/hubert/scripts/pretrain.sh); 6 x 15.6s crops ≈ 93.6 s
    B, n = 6, 250_000
    T = cfg.encoder.num_frames(n)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, n), jnp.float32)
    targets = jax.random.randint(rng, (B, T, 1), 0, 504)

    variables = model.init(
        {"params": rng, "mask": rng}, wav[:1, :50000], targets[:1, : cfg.encoder.num_frames(50000)],
        mask=True, deterministic=True,
    )
    tx = make_optimizer(OptimConfig(lr=5e-4, warmup_steps=100, total_steps=1000))
    state = create_train_state(variables["params"], tx)
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx)
    batch = {"source": wav, "targets": targets}

    rng_step = jax.random.PRNGKey(1)
    state, m = step(state, batch, rng_step)  # compile
    # NOTE: through the axon tunnel block_until_ready returns early; a host
    # scalar fetch is the only reliable synchronization point.
    float(m["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng_step)
    float(m["loss"])  # forces completion of the whole queue
    dt = (time.perf_counter() - t0) / iters

    audio_sec = B * n / 16000.0
    value = audio_sec / dt
    print(
        json.dumps(
            {
                "metric": "pretrain_audio_sec_per_s_chip_wavlm_base",
                "value": round(value, 1),
                "unit": "audio-sec/s/chip",
                "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
