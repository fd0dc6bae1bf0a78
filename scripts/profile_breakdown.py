"""Piecewise timing of the WavLM-Base pretrain step on the real chip.

Times each stage (conv frontend, pos-conv, transformer, loss head,
optimizer) fwd and fwd+bwd separately at the bench shape to locate where
step time goes. Run: python scripts/profile_breakdown.py
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    # axon tunnel: a host scalar fetch is the only reliable sync point
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    from unispeech_tpu.configs import (
        HubertPretrainConfig,
        MaskConfig,
        base_encoder_config,
    )
    from unispeech_tpu.models.encoder import (
        ConvFeatureExtractor,
        PosConv,
        TransformerEncoder,
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
        encoder=enc, time_mask=MaskConfig(mask_prob=0.8, mask_length=10),
        num_classes=(504,), final_dim=256,
    )
    B, n = 6, 250_000
    T = cfg.encoder.num_frames(n)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, n), jnp.float32)
    targets = jax.random.randint(rng, (B, T, 1), 0, 504)
    frames = jax.random.normal(rng, (B, T, enc.encoder_embed_dim), jnp.bfloat16)

    # --- conv frontend alone ---
    conv = ConvFeatureExtractor(enc, dtype=jnp.bfloat16)
    cvars = conv.init(rng, wav[:1, :50000])
    fwd = jax.jit(lambda v, w: conv.apply(v, w))
    print("conv fwd:           %7.2f ms" % (timeit(fwd, cvars, wav) * 1e3), flush=True)
    gfn = jax.jit(jax.grad(lambda v, w: jnp.sum(conv.apply(v, w).astype(jnp.float32))))
    print("conv fwd+bwd:       %7.2f ms" % (timeit(gfn, cvars, wav) * 1e3), flush=True)

    # --- pos conv alone ---
    pc = PosConv(enc, dtype=jnp.bfloat16)
    pvars = pc.init(rng, frames[:1])
    pfwd = jax.jit(lambda v, x: pc.apply(v, x))
    print("posconv fwd:        %7.2f ms" % (timeit(pfwd, pvars, frames) * 1e3), flush=True)
    pg = jax.jit(jax.grad(lambda v, x: jnp.sum(pc.apply(v, x).astype(jnp.float32))))
    print("posconv fwd+bwd:    %7.2f ms" % (timeit(pg, pvars, frames) * 1e3), flush=True)

    # --- transformer encoder alone ---
    tenc = TransformerEncoder(enc, dtype=jnp.bfloat16)
    tvars = tenc.init(rng, frames[:1])
    tfwd = jax.jit(lambda v, x: tenc.apply(v, x, deterministic=True).x)
    print("encoder fwd (det):  %7.2f ms" % (timeit(tfwd, tvars, frames) * 1e3), flush=True)
    tg = jax.jit(jax.grad(
        lambda v, x: jnp.sum(tenc.apply(v, x, deterministic=True).x.astype(jnp.float32))
    ))
    print("encoder fwd+bwd det:%7.2f ms" % (timeit(tg, tvars, frames) * 1e3), flush=True)

    def tloss_train(v, x, r):
        out = tenc.apply(
            v, x, deterministic=False,
            rngs={"dropout": r, "layerdrop": r},
        ).x
        return jnp.sum(out.astype(jnp.float32))

    tgt = jax.jit(jax.grad(tloss_train))
    print("encoder fwd+bwd drp:%7.2f ms" % (timeit(tgt, tvars, frames, rng) * 1e3), flush=True)

    # --- full model ---
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": rng, "mask": rng}, wav[:1, :50000],
        targets[:1, : cfg.encoder.num_frames(50000)], mask=True, deterministic=True,
    )
    tx = make_optimizer(OptimConfig(lr=5e-4, warmup_steps=100, total_steps=1000))
    state = create_train_state(variables["params"], tx)
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    batch = {"source": wav, "targets": targets}

    lf = jax.jit(lambda p: loss_fn(p, batch, rng, jnp.zeros((), jnp.int32))[0])
    print("loss fwd only:      %7.2f ms" % (timeit(lf, state.params) * 1e3), flush=True)

    lg = jax.jit(jax.grad(lambda p: loss_fn(p, batch, rng, jnp.zeros((), jnp.int32))[0]
                 / 1000.0))
    print("loss fwd+bwd:       %7.2f ms" % (timeit(lg, state.params) * 1e3), flush=True)

    grads = jax.tree.map(jnp.zeros_like, state.params)
    opt = jax.jit(lambda g, o, p: tx.update(g, o, p))
    print("optimizer update:   %7.2f ms" % (
        timeit(opt, grads, state.opt_state, state.params) * 1e3), flush=True)

    step = make_train_step(loss_fn, tx, donate_state=False)
    t = timeit(lambda: step(state, batch, rng)[1]["loss"], iters=10)
    print("full train step:    %7.2f ms" % (t * 1e3), flush=True)


if __name__ == "__main__":
    main()
