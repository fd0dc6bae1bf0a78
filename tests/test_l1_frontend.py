"""Fused L1 waveform-conv + GroupNorm-stats kernel (interpret mode, CPU).

Reference semantics: the first frontend conv
(/root/reference/WavLM/WavLM.py:378-505, Conv1d(1, C, k, stride)) followed
by the per-channel GroupNorm statistics. Numerical note: the unfused
Conv1dMM path rounds each stride-collapsed tap dot to bf16 before summing,
while the kernel accumulates all taps in f32 and rounds once — y1 parity
under bf16 is therefore 1-ulp, not bitwise; the f32 cases are exact to
float noise. Weight-gradient parity is bf16-ulp-of-result for the same
reason (both paths feed bf16 operands to the dW contraction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unispeech_tpu.models.encoder import strided_conv1d_as_matmul
from unispeech_tpu.ops.pallas.l1_frontend import l1_conv_with_stats

B, NS, C, K, S = 2, 9000, 64, 10, 5


def _ref(wav, kern, dtype):
    h = strided_conv1d_as_matmul(wav[:, :, None].astype(dtype), kern, S)
    xf = h.astype(jnp.float32)
    return h, xf.sum(axis=1), (xf * xf).sum(axis=1)


def _mk(dtype=jnp.float32):
    wav = jax.random.normal(jax.random.PRNGKey(0), (B, NS), jnp.float32)
    kern = (
        jax.random.normal(jax.random.PRNGKey(1), (K, 1, C), jnp.float32)
        * 0.05
    )
    return wav, kern


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 5e-3)])
def test_forward_and_stats_match_reference(dtype, tol):
    wav, kern = _mk()
    y_r, s1_r, s2_r = _ref(wav, kern, dtype)
    t1 = y_r.shape[1]
    y_k, s1_k, s2_k, t1_k = l1_conv_with_stats(
        wav, kern, S, dtype=dtype, tile=256, interpret=True
    )
    assert t1_k == t1
    np.testing.assert_allclose(
        np.asarray(y_k[:, :t1], np.float32), np.asarray(y_r, np.float32),
        atol=tol, rtol=tol,
    )
    # storage rows beyond the valid length are exact zeros (downstream
    # fused blocks mask them, but NaN-free storage is a hard invariant)
    assert float(jnp.max(jnp.abs(y_k[:, t1:].astype(jnp.float32)))) == 0.0
    # sums accumulate ~t1 rounded terms; scale tolerance accordingly
    np.testing.assert_allclose(
        np.asarray(s1_k), np.asarray(s1_r), atol=tol * t1, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(s2_k), np.asarray(s2_r), atol=tol * t1, rtol=1e-2)


def test_kernel_gradient_matches_reference_f32():
    """f32 end-to-end: dkernel must match XLA autodiff of the unfused path
    through all three cotangent channels (y1, sum, sumsq)."""
    wav, kern = _mk()
    y_r, *_ = _ref(wav, kern, jnp.float32)
    t1 = y_r.shape[1]
    cy = jax.random.normal(jax.random.PRNGKey(2), y_r.shape) * 0.1
    c1 = jax.random.normal(jax.random.PRNGKey(3), (B, C)) * 0.3
    c2 = jax.random.normal(jax.random.PRNGKey(4), (B, C)) * 0.2

    def loss_ref(kern):
        y, s1, s2 = _ref(wav, kern, jnp.float32)
        return (jnp.sum(y * cy) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2))

    def loss_k(kern):
        y, s1, s2, _ = l1_conv_with_stats(
            wav, kern, S, dtype=jnp.float32, tile=256, interpret=True)
        return (jnp.sum(y[:, :t1] * cy) + jnp.sum(s1 * c1)
                + jnp.sum(s2 * c2))

    g_r = jax.grad(loss_ref)(kern)
    g_k = jax.grad(loss_k)(kern)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_r), atol=2e-2, rtol=2e-3)


def test_waveform_cotangent_is_zero():
    wav, kern = _mk()

    def loss(wav):
        y, s1, s2, _ = l1_conv_with_stats(
            wav, kern, S, dtype=jnp.float32, tile=256, interpret=True)
        return jnp.sum(y) + jnp.sum(s1)

    g = jax.grad(loss)(wav)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_non_tile_aligned_and_short_lengths():
    # odd NS -> partial last tile; NS shorter than one tile
    for ns in (5003, 700):
        wav = jax.random.normal(jax.random.PRNGKey(7), (1, ns))
        kern = (
            jax.random.normal(jax.random.PRNGKey(8), (K, 1, C)) * 0.05
        )
        y_r, s1_r, s2_r = _ref(wav, kern, jnp.float32)
        t1 = y_r.shape[1]
        y_k, s1_k, s2_k, t1_k = l1_conv_with_stats(
            wav, kern, S, dtype=jnp.float32, tile=256, interpret=True)
        assert t1_k == t1
        np.testing.assert_allclose(
            np.asarray(y_k[:, :t1]), np.asarray(y_r), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s2_k), np.asarray(s2_r), atol=1e-2, rtol=1e-3)
