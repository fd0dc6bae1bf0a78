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

Cold-start design (the driver runs this with NO warm caches and a hard
timeout; round-2 died in compile): exactly ONE program is compiled on the
TPU — the train step. Parameters are initialized by flax on the host CPU
backend (same shapes/dtypes; attention flag switched to the XLA path there
since Pallas doesn't lower on CPU), inputs are plain numpy, and the crop
length is chosen so the frame count (768 = 6×128) is lane-aligned — the
production bucket shapes do the same (data/dataset.py).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache (helps warm re-runs; cold runs are the design
# target). Derived from this file's location, never committed (.gitignore).
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_AUDIO_SEC_PER_S = 3400.0

# reference batch anchor: max_tokens 1.4M samples/GPU ≈ 87.5 audio-sec
# (examples/hubert/scripts/pretrain.sh); 6 crops of 245,840 samples
# (~15.4 s, exactly 768 output frames) ≈ 92 audio-sec per step matches it.
# Default B=24: the chip's best per-batch throughput (r5 final sweep with
# save-pre + bwd tile 512: B=8 1603, B=12 1613, B=16 1735, B=24 1764
# audio-sec/s; B=32 crashes the remote compile helper — the optimizer's
# ~7 ms is batch-independent, so bigger batches amortize it). The anchor
# is MFU-derived, not batch-specific, so the production-best batch is the
# fair number; B=8/B=6 numbers are reported in R5_NOTES.md.
B = int(os.environ.get("BENCH_B", "24"))
NSAMP = 245_840
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
# Optimizer steps per dispatch (train/state.py inner_steps: K DISTINCT
# microbatches, one full optimizer step each). The r5 sweep measured
# INNER in {1,4,8} flat at ~1260 audio-sec/s: the bench's async step loop
# already pipelines dispatch through the tunnel, so the step is device-
# bound (trace: 95.2 ms busy, 0.3 ms gaps) and the r4 assumption of
# ~20 ms/step un-amortized dispatch was wrong. Default 1 minimizes
# cold-compile time; the loop CLI exposes --inner-steps for production
# runtimes where the host loop (which syncs on metrics every step) does
# benefit.
INNER = int(os.environ.get("BENCH_INNER", "1"))


def build_step(b=B, nsamp=NSAMP, remat=REMAT, arch="base"):
    """Construct (step_fn, state, batch, rng) for the bench workload with
    host-side (CPU backend) parameter init — zero TPU compiles."""
    import dataclasses

    from unispeech_tpu.configs import (
        HubertPretrainConfig,
        MaskConfig,
        base_encoder_config,
        large_encoder_config,
    )
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    enc_fn = base_encoder_config if arch == "base" else large_encoder_config
    enc = enc_fn(
        relative_position_embedding=True,
        gru_rel_pos=True,
        encoder_layerdrop=0.05,
        dropout=0.1,
        attention_dropout=0.1,
        # r5 sweep (scripts/exp_large.py): full scan-remat is unnecessary —
        # Large at B<=4 fits HBM with FFN-only remat; unrolled + remat_ffn
        # B=3 measured 609 audio-sec/s vs 377 for the r4 scan-remat B=2.
        remat_layers=remat,
        remat_ffn=True,
        attention_q_tile=int(os.environ.get("BENCH_QTILE", "256")),
        # Unrolled layers for BOTH archs (no scan dW-stack DUS copies;
        # Base 97.5 -> 82.4 ms/step measured r5); BENCH_SCAN=1 restores
        # the scan path for comparison.
        scan_layers=os.environ.get("BENCH_SCAN", "0") == "1",
    )
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,),
        final_dim=256 if arch == "base" else 768,
    )
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)

    T = cfg.encoder.num_frames(nsamp)
    np_rng = np.random.default_rng(0)
    lead = (INNER, b) if INNER > 1 else (b,)
    wav = jnp.asarray(np_rng.standard_normal(lead + (nsamp,)), jnp.float32)
    targets = jnp.asarray(np_rng.integers(0, 504, lead + (T, 1)), jnp.int32)

    # ---- host-side init: zero TPU compiles. The Pallas kernel has no CPU
    # lowering, so init (whose params are implementation-independent) runs
    # the XLA attention path on the CPU backend.
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
    # stacked_update measured SLOWER here (B=24 A/B: 1713 vs 1761
    # audio-sec/s): the stack/unstack copies cost more than the per-leaf
    # fusion overhead they remove — the ~7 ms adam time is traffic-bound,
    # not launch-bound. Kept as an env knob + documented negative result.
    tx = make_optimizer(OptimConfig(
        lr=5e-4, warmup_steps=100, total_steps=1000,
        stacked_update=os.environ.get("BENCH_STACKED_OPT", "0") == "1",
    ))
    state = create_train_state(variables["params"], tx)
    state = jax.device_put(state, jax.devices()[0])
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx, inner_steps=INNER)
    batch = {"source": wav, "targets": targets}
    return step, state, batch, jax.random.PRNGKey(1)


# WavLM-Large anchor: the per-audio-second step FLOPs scale by
# (24/12) * (1024/768)^2 ~= 2.9x over Base (conv frontend is shared-shape),
# so the 40%-MFU anchor scales to 3400 / 2.9 ~= 1170 audio-sec/s/chip.
BASELINE_LARGE_AUDIO_SEC_PER_S = 1170.0


def _run_one(arch, b, iters_target=20, tag=""):
    step, state, batch, rng_step = build_step(b=b, arch=arch)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng_step)  # the ONE compile per arch
    # NOTE: through the axon tunnel block_until_ready returns early; a host
    # scalar fetch is the only reliable synchronization point. With INNER>1
    # metrics are stacked (INNER,) — fetch the last inner step's loss.
    loss0 = float(np.asarray(m["loss_per_sample"]).reshape(-1)[-1])
    print(f"# {tag}compile+step0 {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.3f}", flush=True)

    iters = max(iters_target // INNER, 2)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng_step)
    # forces completion of the whole queue
    float(np.asarray(m["loss_per_sample"]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / (iters * INNER)
    return b * NSAMP / 16000.0 / dt


def main():
    value = _run_one("base", B)

    # WavLM-Large single-chip entry (BASELINE config 4 / round-3 judge
    # item 6): 24L/1024d with scan-remat + bf16 at B=2. Printed BEFORE the
    # headline line so the driver's last-line parse stays the Base metric.
    if os.environ.get("BENCH_SKIP_LARGE", "0") != "1":
        try:
            # B=3: the unrolled+remat_ffn sweet spot (609 > B=4's 597 >
            # B=2's 475 audio-sec/s, scripts/exp_large.py r5 sweep)
            vl = _run_one("large", 3, iters_target=10, tag="large ")
            print(
                json.dumps(
                    {
                        "metric": "pretrain_audio_sec_per_s_chip_wavlm_large",
                        "value": round(vl, 1),
                        "unit": "audio-sec/s/chip",
                        "vs_baseline": round(
                            vl / BASELINE_LARGE_AUDIO_SEC_PER_S, 3
                        ),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep the headline metric alive
            print(f"# wavlm_large bench failed: {e!r}", flush=True)

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
