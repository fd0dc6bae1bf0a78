"""Pallas fused attention (fwd + Pallas bwd + in-kernel dropout) vs XLA
reference, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unispeech_tpu.ops.attention import multihead_attention
from unispeech_tpu.ops.pallas.flash_attention import fused_attention


def _make(B=2, T=100, S=100, H=4, hd=32, bias=True, gate=True, mask=True, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, T, H, hd))
    k = jax.random.normal(ks[1], (B, S, H, hd))
    v = jax.random.normal(ks[2], (B, S, H, hd))
    b = jax.random.normal(ks[3], (H, T, S)) if bias else None
    g = jax.nn.sigmoid(jax.random.normal(ks[4], (B, H, T))) + 1.0 if gate else None
    kpm = None
    if mask:
        lengths = jnp.asarray([S, S - 37][:B] + [S] * max(B - 2, 0))
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


@pytest.mark.parametrize("bias,gate,mask", [
    (True, True, True),
    (True, False, True),
    (False, False, True),
    (True, True, False),
])
def test_fused_matches_reference(bias, gate, mask):
    args = _make(bias=bias, gate=gate, mask=mask)
    ref = _ref(*args)
    got = fused_attention(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_nonaligned_shapes():
    # T=97, S=97, hd=24: exercises all padding paths
    args = _make(B=1, T=97, S=97, H=2, hd=24)
    ref = _ref(*args)
    got = fused_attention(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("bias,gate", [(True, True), (True, False),
                                       (False, False)])
def test_fused_gradients_match_reference(bias, gate):
    args = _make(B=2, T=100, S=100, H=2, hd=16, bias=bias, gate=gate)
    q, k, v, b, g, kpm = args
    diff = tuple(a for a in (q, k, v, b, g) if a is not None)
    n = len(diff)

    def loss_fused(*xs):
        q_, k_, v_ = xs[:3]
        b_ = xs[3] if bias else None
        g_ = xs[4] if gate else None
        return jnp.sum(
            fused_attention(q_, k_, v_, b_, g_, kpm, interpret=True) ** 2
        )

    def loss_ref(*xs):
        q_, k_, v_ = xs[:3]
        b_ = xs[3] if bias else None
        g_ = xs[4] if gate else None
        return jnp.sum(_ref(q_, k_, v_, b_, g_, kpm) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(n)))(*diff)
    gr = jax.grad(loss_ref, argnums=tuple(range(n)))(*diff)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.skip(
    reason="pltpu.prng_random_bits is stubbed to zeros in interpret mode; "
    "the same checks run on hardware via scripts/verify_flash_tpu.py"
)
def test_dropout_statistics_and_determinism():
    """In-kernel dropout: ~rate fraction dropped, kept entries scaled, and
    the same seed reproduces bit-identical output (remat/backward rely on
    deterministic regeneration)."""
    q, k, v, b, g, kpm = _make(B=2, T=128, S=128, H=2, hd=32, mask=False)
    rate = 0.4
    seed = jnp.int32(1234)
    out1 = fused_attention(q, k, v, b, g, None, dropout_rate=rate,
                           dropout_seed=seed, interpret=True)
    out2 = fused_attention(q, k, v, b, g, None, dropout_rate=rate,
                           dropout_seed=seed, interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    out3 = fused_attention(q, k, v, b, g, None, dropout_rate=rate,
                           dropout_seed=jnp.int32(99), interpret=True)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    # E[dropout(probs)] = probs -> E[out] = ref out; check the sample mean
    # over many seeds converges (loose tolerance, 32 seeds)
    ref = _ref(q, k, v, b, g, None)
    acc = np.zeros_like(np.asarray(ref))
    n_seeds = 32
    for s in range(n_seeds):
        acc += np.asarray(
            fused_attention(q, k, v, b, g, None, dropout_rate=rate,
                            dropout_seed=jnp.int32(s), interpret=True)
        )
    err = np.abs(acc / n_seeds - np.asarray(ref)).mean()
    scale = np.abs(np.asarray(ref)).mean()
    assert err / scale < 0.15, (err, scale)


@pytest.mark.skip(
    reason="pltpu.prng_random_bits is stubbed to zeros in interpret mode; "
    "the same checks run on hardware via scripts/verify_flash_tpu.py"
)
def test_dropout_gradients_match_mask():
    """Backward with dropout: compare against an XLA reference that applies
    the exact keep mask the kernel generated (recovered from the forward
    output of an identity-v probe)."""
    B, T, S, H, hd = 1, 64, 64, 1, 16
    q, k, v, b, g, _ = _make(B=B, T=T, S=S, H=H, hd=hd, mask=False, bias=False,
                             gate=False)
    rate = 0.3
    seed = jnp.int32(7)

    # recover kernel's dropped probs: v = identity basis -> out = probs
    eye = jnp.eye(S, hd)  # hd < S: probe in chunks
    probs_cols = []
    for c0 in range(0, S, hd):
        basis = jnp.zeros((B, S, H, hd))
        blk = min(hd, S - c0)
        basis = basis.at[0, c0 : c0 + blk, 0, :blk].set(jnp.eye(blk))
        cols = fused_attention(q, k, basis, None, None, None,
                               dropout_rate=rate, dropout_seed=seed,
                               interpret=True)
        probs_cols.append(np.asarray(cols[0, :, 0, :blk]))
    probs_dropped = np.concatenate(probs_cols, axis=1)  # (T, S)

    ref_probs = np.asarray(
        jax.nn.softmax(
            (q[0, :, 0, :] @ k[0, :, 0, :].T) * hd**-0.5, axis=-1
        )
    )
    keep = probs_dropped > 0
    # kept entries must equal ref_probs / (1-rate)
    np.testing.assert_allclose(
        probs_dropped[keep], (ref_probs / (1 - rate))[keep], rtol=1e-4
    )

    def loss_fused(q_, k_, v_):
        return jnp.sum(
            fused_attention(q_, k_, v_, None, None, None, dropout_rate=rate,
                            dropout_seed=seed, interpret=True) ** 2
        )

    def loss_masked_ref(q_, k_, v_):
        s = jnp.einsum("thd,shd->hts", q_[0] * hd**-0.5, k_[0])
        p = jax.nn.softmax(s.astype(jnp.float32), -1)
        p = p * jnp.asarray(keep)[None] / (1 - rate)
        out = jnp.einsum("hts,shd->thd", p.astype(v_.dtype), v_[0])
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_masked_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b_)[0],
                                   rtol=1e-4, atol=1e-4)
