"""Correctness of the round-4 fused conv blocks (ops/pallas/conv_stack.py)
against the XLA reference path (strided_conv1d_as_matmul + exact erf GELU),
values AND gradients, in Pallas interpret mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unispeech_tpu.models.encoder import strided_conv1d_as_matmul
from unispeech_tpu.ops.pallas.conv_stack import (
    conv_gelu_block,
    dgelu_poly,
    gelu_poly,
)


def _gelu_exact(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False)


def test_gelu_poly_accuracy():
    x = jnp.linspace(-8.0, 8.0, 4001, dtype=jnp.float32)
    # fit err 1.9e-5 on [-4,4]; the clamped tail contributes ~3.2e-5 * |x|
    np.testing.assert_allclose(
        np.asarray(gelu_poly(x)), np.asarray(_gelu_exact(x)),
        atol=2e-4, rtol=1e-4,
    )
    dref = jax.vmap(jax.grad(lambda v: _gelu_exact(v).sum()))(x[:, None])[:, 0]
    np.testing.assert_allclose(
        np.asarray(dgelu_poly(x)), np.asarray(dref), atol=1e-3
    )


def _ref(x, w, gelu_in, gelu_out):
    h = _gelu_exact(x).astype(x.dtype) if gelu_in else x
    y = strided_conv1d_as_matmul(h, w, 2)
    return _gelu_exact(y).astype(x.dtype) if gelu_out else y


@pytest.mark.parametrize("k,T,gelu_in", [
    (3, 515, False),
    (3, 515, True),
    (3, 1024, False),  # window padding exercised on the last tile
    (2, 512, False),
])
def test_block_matches_xla(k, T, gelu_in):
    B, C = 2, 256
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, C, C), jnp.float32) * 0.05

    y_ref = _ref(x, w, gelu_in, True)
    t_ref = y_ref.shape[1]

    run = functools.partial(
        conv_gelu_block, gelu_in=gelu_in, tile=128, interpret=True
    )
    y, t_out = run(x, w, valid_len=T)
    assert t_out == t_ref
    np.testing.assert_allclose(
        np.asarray(y[:, :t_out]), np.asarray(y_ref), atol=5e-3
    )
    # rows beyond t_out are finite garbage that valid downstream windows
    # never read (out row i only reads input rows <= 2 i + 2 < t_out)
    assert np.all(np.isfinite(np.asarray(y[:, t_out:])))

    # gradients
    def loss_k(x, w):
        y, t = run(x, w, valid_len=T)
        return (y[:, :t].astype(jnp.float32) ** 2).sum()

    def loss_r(x, w):
        return (_ref(x, w, gelu_in, True).astype(jnp.float32) ** 2).sum()

    gx_k, gw_k = jax.grad(loss_k, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_r), atol=5e-2, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(gw_k), np.asarray(gw_r), atol=5e-2, rtol=1e-2
    )


def test_chained_blocks_match_xla():
    """Two chained blocks with NO slicing in between (padded storage rows
    flow through as zeros) match the sliced XLA reference chain."""
    B, C, T = 2, 256, 1030
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (3, C, C), jnp.float32) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (2, C, C), jnp.float32) * 0.05

    def chain_k(x, w1, w2):
        y1, t1 = conv_gelu_block(x, w1, valid_len=T, gelu_in=True,
                                 tile=128, interpret=True)
        y2, t2 = conv_gelu_block(y1, w2, valid_len=t1, tile=128,
                                 interpret=True)
        return y2[:, :t2]

    def chain_r(x, w1, w2):
        y1 = _ref(x, w1, True, True)
        return _ref(y1, w2, False, True)

    y_k = chain_k(x, w1, w2)
    y_r = chain_r(x, w1, w2)
    assert y_k.shape == y_r.shape
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), atol=5e-3)

    g_k = jax.grad(lambda *a: (chain_k(*a) ** 2).sum(), argnums=(0, 1, 2))(
        x, w1, w2
    )
    g_r = jax.grad(lambda *a: (chain_r(*a) ** 2).sum(), argnums=(0, 1, 2))(
        x, w1, w2
    )
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2, rtol=1e-2
        )


def test_seed_dropout_matches_mask_semantics():
    """seed_dropout: grad uses the SAME mask as forward (recomputed from the
    key), and matches nn.Dropout scaling."""
    import jax

    from unispeech_tpu.ops.dropout import seed_dropout

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 128), jnp.float32)
    y = seed_dropout(x, key, 0.3)
    zeros = np.asarray(y) == 0.0
    frac = zeros.mean()
    assert 0.2 < frac < 0.4
    np.testing.assert_allclose(
        np.asarray(y)[~zeros], (np.asarray(x) / 0.7)[~zeros], rtol=1e-6
    )
    g = jax.grad(lambda v: (seed_dropout(v, key, 0.3) * x).sum())(x)
    # dy/dx = mask/0.7 -> grad wrt x of sum(y*x) = mask/0.7 * x
    np.testing.assert_allclose(
        np.asarray(g), np.where(zeros, 0.0, np.asarray(x) / 0.7), rtol=1e-6
    )
    # rate 0 identity
    np.testing.assert_array_equal(np.asarray(seed_dropout(x, key, 0.0)),
                                  np.asarray(x))


def test_block_affine_matches_xla():
    """In-kernel per-(b, c) affine (the folded frontend GroupNorm): values
    and ALL gradients (dx, dw, da, db) vs the explicit normalize + block."""
    B, T, C, k = 2, 515, 256, 3
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, C, C), jnp.float32) * 0.05
    a = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (B, C))) + 0.5
    b = jax.random.normal(jax.random.PRNGKey(3), (B, C)) * 0.1

    def fused(x_, w_, a_, b_):
        y, t = conv_gelu_block(
            x_, w_, valid_len=T, gelu_in=True, tile=128, interpret=True,
            affine=(a_, b_),
        )
        return y[:, :t]

    def ref(x_, w_, a_, b_):
        xa = x_ * a_[:, None, :] + b_[:, None, :]
        return _ref(xa, w_, True, True)

    y_f = fused(x, w, a, b)
    y_r = ref(x, w, a, b)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               atol=2e-3, rtol=2e-3)

    def loss(f):
        return lambda *args: jnp.sum(f(*args).astype(jnp.float32) ** 2)

    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(x, w, a, b)
    gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(x, w, a, b)
    for name, af, ar in zip(["dx", "dw", "da", "db"], gf, gr):
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ar), atol=5e-2, rtol=5e-3,
            err_msg=name,
        )


def test_extractor_affine_gn_matches_plain_gn():
    """ConvFeatureExtractor parity: the affine-folded gn_0 path (fused
    chain active) must match the plain Fp32GroupNorm + XLA path. Interpret
    mode is forced by monkeypatching the TPU gate."""
    import unispeech_tpu.models.encoder as enc_mod
    from unispeech_tpu.configs import base_encoder_config

    cfg = base_encoder_config(
        conv_layers=((64, 10, 5), (64, 3, 2), (64, 3, 2), (64, 2, 2)),
    )
    m = enc_mod.ConvFeatureExtractor(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3200))
    v_plain = m.init({"params": jax.random.PRNGKey(1)}, x)
    y_plain = m.apply(v_plain, x)

    import unispeech_tpu.ops.pallas.conv_stack as cs
    import unispeech_tpu.ops.pallas.l1_frontend as l1f

    orig_on_tpu, orig_block = enc_mod._on_tpu, cs.conv_gelu_block
    orig_l1 = l1f.l1_conv_with_stats
    try:
        enc_mod._on_tpu = lambda: True
        patched = functools.partial(orig_block, interpret=True)
        # the extractor imports conv_gelu_block / l1_conv_with_stats at
        # call time from their modules
        cs.conv_gelu_block = patched
        l1f.l1_conv_with_stats = functools.partial(orig_l1, interpret=True)
        v_fused = m.init({"params": jax.random.PRNGKey(1)}, x)
        # identical param trees (gn_0 scale/bias shared between paths)
        assert jax.tree_util.tree_structure(v_plain) == \
            jax.tree_util.tree_structure(v_fused)
        y_fused = m.apply(v_plain, x)
    finally:
        enc_mod._on_tpu = orig_on_tpu
        cs.conv_gelu_block = orig_block
        l1f.l1_conv_with_stats = orig_l1

    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=2e-3, rtol=2e-3
    )


def test_extractor_layer_norm_fused_matches_plain():
    """layer_norm-mode parity (r5): norm-free Pallas conv blocks + XLA
    Fp32LayerNorm over PADDED storage + deferred gelu_in must match the
    plain unfused path. Covers the fused-L1 no-stats variant, the
    exact-zero-beyond-valid block invariant the storage-wide LN relies on,
    and gradient flow through every ln_i scale/bias."""
    import unispeech_tpu.models.encoder as enc_mod
    import unispeech_tpu.ops.pallas.conv_stack as cs
    import unispeech_tpu.ops.pallas.l1_frontend as l1f
    from unispeech_tpu.configs import base_encoder_config

    cfg = base_encoder_config(
        extractor_mode="layer_norm",
        conv_layers=((64, 10, 5), (64, 3, 2), (64, 3, 2), (64, 2, 2)),
    )
    m = enc_mod.ConvFeatureExtractor(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3200))
    v = m.init({"params": jax.random.PRNGKey(1)}, x)

    def loss(v, x):
        return jnp.sum(m.apply(v, x).astype(jnp.float32) ** 2)

    y_plain = m.apply(v, x)
    g_plain = jax.grad(loss)(v, x)

    orig_on_tpu, orig_block = enc_mod._on_tpu, cs.conv_gelu_block
    orig_l1 = l1f.l1_conv_with_stats
    try:
        enc_mod._on_tpu = lambda: True
        cs.conv_gelu_block = functools.partial(orig_block, interpret=True)
        l1f.l1_conv_with_stats = functools.partial(orig_l1, interpret=True)
        v_fused = m.init({"params": jax.random.PRNGKey(1)}, x)
        assert jax.tree_util.tree_structure(v) == \
            jax.tree_util.tree_structure(v_fused)
        y_fused = m.apply(v, x)
        g_fused = jax.grad(loss)(v, x)
    finally:
        enc_mod._on_tpu = orig_on_tpu
        cs.conv_gelu_block = orig_block
        l1f.l1_conv_with_stats = orig_l1

    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=2e-3, rtol=2e-3
    )
    flat_p = jax.tree_util.tree_leaves_with_path(g_plain)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for (path, a), b in zip(flat_p, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-2, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path),
        )
