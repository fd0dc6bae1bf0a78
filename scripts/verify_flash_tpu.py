"""On-chip verification of the fused attention kernel (run on the TPU).

Checks that can't run under interpret mode (the interpreter stubs the TPU
PRNG): dropout statistics/determinism/gradients, bf16 parity vs the XLA
path, presence of the kernel in the train-step HLO, and a micro-benchmark
at the bench shape. Run: python scripts/verify_flash_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from unispeech_tpu.ops.attention import multihead_attention
from unispeech_tpu.ops.pallas.flash_attention import fused_attention


def _make(B, T, S, H, hd, dtype=jnp.bfloat16, bias=True, gate=True, mask=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, T, H, hd), dtype)
    k = jax.random.normal(ks[1], (B, S, H, hd), dtype)
    v = jax.random.normal(ks[2], (B, S, H, hd), dtype)
    b = jax.random.normal(ks[3], (H, T, S), jnp.float32) if bias else None
    g = (jax.nn.sigmoid(jax.random.normal(ks[4], (B, H, T))) + 1.0) if gate else None
    kpm = None
    if mask:
        lengths = jnp.asarray([S] + [S - 37] * (B - 1))
        kpm = jnp.arange(S)[None, :] >= lengths[:, None]
    return q, k, v, b, g, kpm


def _ref(q, k, v, b, g, kpm):
    bias = None
    if b is not None:
        bias = b.astype(jnp.float32)[None]
        if g is not None:
            bias = g[..., None] * bias
    return multihead_attention(q, k, v, bias=bias, key_padding_mask=kpm,
                               deterministic=True)


def check_parity():
    q, k, v, b, g, kpm = _make(2, 781, 781, 12, 64)
    ref = jax.jit(_ref)(q, k, v, b, g, kpm)
    got = jax.jit(lambda *a: fused_attention(*a))(q, k, v, b, g, kpm)
    err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(f"fwd parity max err (bf16): {err:.5f}")
    assert err < 0.05, err

    def loss_f(q, k, v, b, g):
        return jnp.sum(fused_attention(q, k, v, b, g, kpm).astype(jnp.float32) ** 2)

    def loss_r(q, k, v, b, g):
        return jnp.sum(_ref(q, k, v, b, g, kpm).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3, 4)))(q, k, v, b, g)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(q, k, v, b, g)
    for name, a, r in zip("qkvbg", gf, gr):
        af = np.asarray(a, np.float32)
        rf = np.asarray(r, np.float32)
        denom = np.abs(rf).mean() + 1e-6
        rel = np.abs(af - rf).mean() / denom
        print(f"grad d{name}: mean rel err {rel:.4f}")
        assert rel < 0.05, (name, rel)


def check_dropout():
    q, k, v, b, g, _ = _make(2, 256, 256, 4, 64, mask=False)
    rate = 0.4
    f = jax.jit(lambda s: fused_attention(
        q, k, v, b, g, None, dropout_rate=rate, dropout_seed=s))
    o1, o2, o3 = f(jnp.int32(7)), f(jnp.int32(7)), f(jnp.int32(8))
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "same seed differs"
    assert not np.allclose(np.asarray(o1), np.asarray(o3)), "seed ignored"
    print("dropout determinism ok")

    # identity-v probe: recover dropped probs, check drop fraction + scaling
    S = 256
    probs = []
    for c0 in range(0, S, 64):
        basis = jnp.zeros((2, S, 4, 64), jnp.float32)
        basis = basis.at[:, c0 : c0 + 64, :, :].set(
            jnp.eye(64)[None, :, None, :]
        )
        cols = fused_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), basis, b, g, None,
            dropout_rate=rate, dropout_seed=jnp.int32(7),
        )
        probs.append(np.asarray(cols[:, :, :, :]))
    pd = np.concatenate(probs, axis=1)  # (B, S, H, T)? — per-chunk columns
    dropped_frac = float((np.concatenate([p.ravel() for p in probs]) == 0).mean())
    print(f"dropped fraction ≈ {dropped_frac:.3f} (incl. zero-prob lanes)")

    # E[out] ≈ ref out over seeds
    ref = _ref(q, k, v, b, g, None)
    acc = np.zeros(ref.shape, np.float32)
    n = 24
    for s in range(n):
        acc += np.asarray(f(jnp.int32(s)), np.float32)
    rel = np.abs(acc / n - np.asarray(ref, np.float32)).mean() / (
        np.abs(np.asarray(ref, np.float32)).mean() + 1e-6
    )
    print(f"dropout mean-field rel err over {n} seeds: {rel:.3f}")
    assert rel < 0.2, rel


def check_in_hlo():
    """The kernel must appear in the lowered *training* step."""
    from unispeech_tpu.configs import HubertPretrainConfig, MaskConfig, base_encoder_config
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    enc = base_encoder_config(
        relative_position_embedding=True, gru_rel_pos=True,
        dropout=0.1, attention_dropout=0.1, encoder_layerdrop=0.05,
    )
    cfg = HubertPretrainConfig(encoder=enc, time_mask=MaskConfig(mask_prob=0.8),
                               num_classes=(504,), final_dim=256)
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 64000), jnp.float32)
    T = cfg.encoder.num_frames(64000)
    targets = jax.random.randint(rng, (2, T, 1), 0, 504)
    variables = model.init({"params": rng, "mask": rng}, wav[:1], targets[:1],
                           mask=True, deterministic=True)
    tx = make_optimizer(OptimConfig(lr=5e-4, warmup_steps=10, total_steps=100))
    state = create_train_state(variables["params"], tx)
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx)
    lowered = jax.jit(step).lower(state, {"source": wav, "targets": targets},
                                  rng)
    hlo = lowered.as_text()
    n_custom = hlo.count("tpu_custom_call")
    print(f"tpu_custom_call sites in train-step HLO: {n_custom}")
    assert n_custom >= 2, "fused attention kernel absent from training HLO"


def bench_kernel():
    B, T, H, hd = 6, 784, 12, 64
    q, k, v, b, g, kpm = _make(B, T, T, H, hd)

    f_fused = jax.jit(lambda *a: fused_attention(
        *a, dropout_rate=0.1, dropout_seed=jnp.int32(3)))
    f_xla = jax.jit(
        lambda q, k, v, b, g: multihead_attention(
            q, k, v, bias=g[..., None] * b[None], key_padding_mask=kpm,
            dropout_rng=jax.random.PRNGKey(0), dropout_rate=0.1,
            deterministic=False,
        )
    )

    for name, fn, args in [
        ("fused", f_fused, (q, k, v, b, g, kpm)),
        ("xla", f_xla, (q, k, v, b, g)),
    ]:
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"attention fwd {name}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    check_parity()
    check_dropout()
    check_in_hlo()
    bench_kernel()
    print("ALL OK")
