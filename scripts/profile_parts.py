"""Component-level timing on the real chip to localize train-step cost.

Run: python -u scripts/profile_parts.py [part ...]
Parts: attn conv fwd step step_noflash step_noremat
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NOTE: do NOT set PYTHONPATH for this repo — it breaks the axon jax-plugin
# discovery (backend 'axon' fails to register).

import jax
import jax.numpy as jnp

B, NSAMP = 6, 245_840  # 768 frames, lane-aligned (bench.py)
H, HD, D = 12, 64, 768


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    # axon tunnel: force a host fetch for reliable sync
    float(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_cfg(**over):
    from unispeech_tpu.configs import (
        HubertPretrainConfig, MaskConfig, base_encoder_config,
    )
    enc = base_encoder_config(
        relative_position_embedding=True, gru_rel_pos=True,
        encoder_layerdrop=0.05, dropout=0.1, attention_dropout=0.1, **over,
    )
    return HubertPretrainConfig(
        encoder=enc, time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,), final_dim=256,
    )


def part_attn():
    from unispeech_tpu.ops.pallas.flash_attention import fused_attention
    from unispeech_tpu.ops.attention import multihead_attention

    T = 781
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, H, HD), jnp.bfloat16)
    bias = jax.random.normal(rng, (H, T, T), jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(rng, (B, H, T), jnp.float32)) * 2

    flops_fwd = 4 * B * H * T * T * HD

    f_fwd = jax.jit(lambda *a: fused_attention(*a, dropout_rate=0.1,
                                               dropout_seed=jnp.int32(7)))
    dt = timeit(f_fwd, q, k, v, bias, gate)
    print(f"flash fwd(drop): {dt*1e3:.2f} ms  {flops_fwd/dt/1e12:.1f} TF/s", flush=True)

    def loss_flash(q, k, v, bias, gate):
        o = fused_attention(q, k, v, bias, gate, dropout_rate=0.1,
                            dropout_seed=jnp.int32(7))
        return (o.astype(jnp.float32) ** 2).sum()

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4)))
    dt = timeit(g_flash, q, k, v, bias, gate)
    print(f"flash fwd+bwd(drop): {dt*1e3:.2f} ms  {3*flops_fwd/dt/1e12:.1f} TF/s", flush=True)

    def loss_xla(q, k, v, bias, gate):
        bfull = gate[..., None] * bias[None]
        o = multihead_attention(q, k, v, bias=bfull,
                                dropout_rng=jax.random.PRNGKey(3),
                                dropout_rate=0.1, deterministic=False)
        return (o.astype(jnp.float32) ** 2).sum()

    f_xla = jax.jit(lambda *a: multihead_attention(
        a[0], a[1], a[2], bias=a[4][..., None] * a[3][None],
        dropout_rng=jax.random.PRNGKey(3), dropout_rate=0.1,
        deterministic=False))
    dt = timeit(f_xla, q, k, v, bias, gate)
    print(f"xla fwd(drop): {dt*1e3:.2f} ms  {flops_fwd/dt/1e12:.1f} TF/s", flush=True)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
    dt = timeit(g_xla, q, k, v, bias, gate)
    print(f"xla fwd+bwd(drop): {dt*1e3:.2f} ms  {3*flops_fwd/dt/1e12:.1f} TF/s", flush=True)


def part_conv():
    from unispeech_tpu.models.encoder import ConvFeatureExtractor
    cfg = bench_cfg().encoder
    m = ConvFeatureExtractor(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, NSAMP), jnp.float32)
    vs = m.init(rng, wav[:1, :50000])
    # conv stack FLOPs: sum over layers 2*T_out*k*cin*cout per item
    t = NSAMP
    flops = 0
    cin = 1
    for (cout, k, s) in cfg.conv_layers:
        t = (t - k) // s + 1
        flops += 2 * t * k * cin * cout
        cin = cout
    flops *= B
    f = jax.jit(lambda vs, w: m.apply(vs, w))
    dt = timeit(f, vs, wav)
    print(f"conv fwd: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)
    g = jax.jit(jax.grad(lambda vs, w: (m.apply(vs, w).astype(jnp.float32) ** 2).sum()))
    dt = timeit(g, vs, wav)
    print(f"conv fwd+bwd: {dt*1e3:.2f} ms  {3*flops/dt/1e12:.1f} TF/s", flush=True)


def _make_step(**over):
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    cfg = bench_cfg(**over)
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    T = cfg.encoder.num_frames(NSAMP)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, NSAMP), jnp.float32)
    targets = jax.random.randint(rng, (B, T, 1), 0, 504)
    variables = model.init(
        {"params": rng, "mask": rng}, wav[:1, :50000],
        targets[:1, : cfg.encoder.num_frames(50000)], mask=True,
        deterministic=True)
    tx = make_optimizer(OptimConfig(lr=5e-4, warmup_steps=100, total_steps=1000))
    state = create_train_state(variables["params"], tx)
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx, donate_state=False)
    batch = {"source": wav, "targets": targets}
    return step, state, batch


def _time_step(step, state, batch, iters=20):
    rng = jax.random.PRNGKey(1)
    state2, m = step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        _, m = step(state, batch, rng)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def part_fwd():
    from unispeech_tpu.models.hubert import HubertPretrainModel
    cfg = bench_cfg()
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    T = cfg.encoder.num_frames(NSAMP)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, NSAMP), jnp.float32)
    targets = jax.random.randint(rng, (B, T, 1), 0, 504)
    variables = model.init(
        {"params": rng, "mask": rng}, wav[:1, :50000],
        targets[:1, : cfg.encoder.num_frames(50000)], mask=True,
        deterministic=True)

    f = jax.jit(lambda vs, w, t: model.apply(
        vs, w, t, mask=True, deterministic=False,
        rngs={"mask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
              "layerdrop": jax.random.PRNGKey(4)}).logits[(12, 0)])
    dt = timeit(f, variables, wav, targets)
    print(f"full fwd (train-mode): {dt*1e3:.2f} ms", flush=True)


def part_step(**over):
    step, state, batch = _make_step(**over)
    dt = _time_step(step, state, batch)
    audio = B * NSAMP / 16000.0
    print(f"step{over}: {dt*1e3:.2f} ms  {audio/dt:.0f} audio-sec/s", flush=True)


PARTS = {
    "attn": part_attn,
    "conv": part_conv,
    "fwd": part_fwd,
    "step": lambda: part_step(),
    "step_noflash": lambda: part_step(use_flash_attention=False),
    "step_noremat": lambda: part_step(remat_layers=False),
    "step_nodrop": lambda: part_step(dropout=0.0, attention_dropout=0.0,
                                     encoder_layerdrop=0.0),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["attn", "conv", "fwd"]
    print(jax.devices(), flush=True)
    for n in names:
        t0 = time.time()
        PARTS[n]()
        print(f"[{n} total {time.time()-t0:.0f}s]", flush=True)
