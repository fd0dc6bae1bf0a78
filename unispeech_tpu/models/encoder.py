"""Shared conv-frontend + transformer encoder for the UniSpeech family.

Brand-new flax.linen implementation of the encoder skeleton every model in
the family shares (wav2vec2 / UniSpeech / HuBERT / UniSpeech-SAT / WavLM):
strided-conv waveform frontend -> conv positional embedding -> pre/post-LN
transformer with optional WavLM gated bucketed relative-position-bias
attention.

Parity reference (behavior, not code): /root/reference/WavLM/WavLM.py:378-743
and /root/reference/WavLM/modules.py:303-763. Design departures for TPU:
  * (B, T, C) layout throughout (no T-major transposes); XLA handles layout.
  * rel-pos bias table owned by the encoder (reference stores it inside layer
    0's attention); computed once per forward and shared by all layers.
  * fp32 islands: all norms, softmax, GELU and the rel-pos gate run in fp32
    while matmuls run in the configured compute dtype (bf16 on TPU).
  * no dynamic shapes: padding handled by masks, never boolean indexing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import EncoderConfig
from unispeech_tpu.ops.attention import (
    multihead_attention,
    rel_pos_gate,
)
from unispeech_tpu.ops.rel_pos import compute_rel_pos_bias

Dtype = Any

# ---------------------------------------------------------------------------
# small building blocks
# ---------------------------------------------------------------------------


@jax.checkpoint
def _gelu_erf_fp32(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU computed in fp32, like reference `gelu`
    (/root/reference/WavLM/modules.py:140-141).

    jax.checkpoint: without it XLA saves the fp32 upcast of the (often
    bf16) input as the backward residual — at Base bench shapes that is an
    fp32 (L, B, T, 3072) store per FFN (650 MB/step, measured in the
    round-3 device trace). Recomputing the cast+erf in backward is ~20x
    cheaper than the HBM round-trip."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


@jax.custom_vjp
def _gelu_poly_fp32(x: jax.Array) -> jax.Array:
    from unispeech_tpu.ops.pallas.conv_stack import gelu_poly

    return gelu_poly(x).astype(x.dtype)


def _gelu_poly_fwd(x):
    return _gelu_poly_fp32(x), x


def _gelu_poly_bwd(x, g):
    from unispeech_tpu.ops.pallas.conv_stack import dgelu_poly

    return ((dgelu_poly(x) * g.astype(jnp.float32)).astype(x.dtype),)


_gelu_poly_fp32.defvjp(_gelu_poly_fwd, _gelu_poly_bwd)


def gelu_fp32(x: jax.Array) -> jax.Array:
    """fp32-island GELU. On TPU: the clamped degree-8 polynomial from the
    conv kernels (max err 2e-4, far below bf16 noise) — XLA lowers exact
    erf-gelu via `erfc` with fp32 intermediates AND bit-packs a sign
    predicate residual per FFN (the u8[768,3072] fusion in the round-4
    trace, ~1.8 ms/step); the polynomial path is pure mul/add with the
    bf16 input as its only residual. Off TPU: exact erf for fp32 parity
    tests against the torch oracle."""
    if _on_tpu():
        return _gelu_poly_fp32(x)
    return _gelu_erf_fp32(x)


def gelu_accurate(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU (/root/reference/WavLM/modules.py:132-137)."""
    xf = x.astype(jnp.float32)
    return (jax.nn.gelu(xf, approximate=True)).astype(x.dtype)


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "gelu":
        return gelu_fp32
    if name == "gelu_accurate" or name == "gelu_fast":
        return gelu_accurate
    if name == "relu":
        return jax.nn.relu
    if name == "swish":
        return jax.nn.swish
    if name == "tanh":
        return jnp.tanh
    if name in ("linear", "glu"):
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


class Fp32LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of input dtype
    (/root/reference/WavLM/modules.py:30-42). eps matches torch (1e-5)."""

    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = (
            self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
            if self.use_scale else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
            if self.use_bias else None
        )

        # stats are computed OUTSIDE the checkpoint (tiny residuals, one
        # reduction pass); only the elementwise normalize is checkpointed —
        # backward recomputes the fp32 island from the bf16 input instead of
        # storing fp32 normalized activations (see gelu_fp32 note), without
        # re-running the reductions
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)

        @jax.checkpoint
        def _norm(x, mean, var, scale, bias):
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
            if scale is not None:
                y = y * scale
            if bias is not None:
                y = y + bias
            return y.astype(x.dtype)

        return _norm(x, mean, var, scale, bias)


class Fp32GroupNorm(nn.Module):
    """GroupNorm in fp32 on (B, T, C) arrays.

    Reference uses torch GroupNorm(dim, dim) on (B, C, T)
    (/root/reference/WavLM/WavLM.py:424, modules.py:45-57): with
    num_groups == channels each channel is normalized over time alone.
    """

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        assert C % self.num_groups == 0
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        # checkpointed for the same reason as Fp32LayerNorm: at the conv
        # frontend's L0 output (B, ~49k, 512) the fp32 residual store alone
        # is ~600 MB/step. Stats live OUTSIDE the checkpoint so the backward
        # recompute is elementwise-only (no repeated full-T reductions).
        G = self.num_groups
        xg = x.astype(jnp.float32).reshape(B, T, G, C // G)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)

        @jax.checkpoint
        def _norm(x, mean, var, scale, bias):
            xf = x.astype(jnp.float32).reshape(B, T, G, C // G)
            y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(B, T, C)
            return (y * scale + bias).astype(x.dtype)

        return _norm(x, mean, var, scale, bias)


class Fp32GroupNormAffine(nn.Module):
    """(a, b) with GroupNorm(x) == x*a + b elementwise, a/b of shape (B, C).

    Same params ("scale"/"bias" — name it like the norm it replaces so
    checkpoints interchange) and stats as Fp32GroupNorm, but the normalize
    itself is left to the caller (the fused conv block applies it
    in-kernel, ops/pallas/conv_stack.py). Gradients through mean/var flow
    via a(x), b(x) exactly — only (B, C)-sized arrays cross the module
    boundary. Requires num_groups == C (the frontend's per-channel case)."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, stats=None):
        if stats is None:
            B, T, C = x.shape
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=1)  # (B, C)
            var = xf.var(axis=1)
        else:
            # (mean, var) precomputed — the fused L1 kernel accumulates
            # sum/sumsq in its single pass over the conv output
            # (ops/pallas/l1_frontend.py); x is not needed at all
            mean, var = stats
            C = mean.shape[-1]
        assert self.num_groups == C, "affine form needs per-channel groups"
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        a = jax.lax.rsqrt(var + self.eps) * scale
        b = bias - mean * a
        return a, b


@jax.custom_vjp
def grad_multiply(x: jax.Array, scale: float) -> jax.Array:
    return x


def _grad_multiply_fwd(x, scale):
    return x, scale


def _grad_multiply_bwd(scale, g):
    return (g * scale, None)


grad_multiply.defvjp(_grad_multiply_fwd, _grad_multiply_bwd)
"""Identity forward, scaled gradient (/root/reference/WavLM/modules.py:60-69).
Used for feature_grad_mult on the conv frontend."""


# ---------------------------------------------------------------------------
# conv feature extractor
# ---------------------------------------------------------------------------


def strided_conv1d_as_matmul(
    h: jax.Array,  # (B, T, Cin)
    kernel: jax.Array,  # (k, Cin, Cout) — nn.Conv layout
    stride: int,
) -> jax.Array:
    """Valid-padding strided 1D conv as stride-collapsed MXU matmuls.

    XLA's TPU lowering of `lax.conv` on these long/thin (Cin≤512, T up to
    250k) shapes runs at ~9% MFU (measured), and strided-slice im2col is no
    better (strided slices force relayout copies). Instead, collapse the
    stride into channels: reshape (B, T, Cin) -> (B, T/s, s*Cin); output t
    then reads ceil-window rows t..t+k''-1 (k'' = (k-1)//s + 1) of the
    collapsed view, so the conv becomes k'' UNIT-STRIDE row-sliced matmuls
    with contraction dim s*Cin (2048 for the k=3,s=2,C=512 layers), summed.
    Measured 48 TF/s fwd / 70 TF/s fwd+bwd vs 37/47 for strided im2col at the
    L1 shape (scripts/conv_micro.py). For k == stride the collapse is exact
    and it is ONE matmul.
    """
    k, cin, cout = kernel.shape
    B, T, _ = h.shape
    t_out = (T - k) // stride + 1
    if k == stride:
        win = h[:, : t_out * k, :].reshape(B, t_out, k * cin)
        return jax.lax.dot_general(
            win,
            kernel.reshape(k * cin, cout).astype(win.dtype),
            (((2,), (0,)), ((), ())),
            preferred_element_type=win.dtype,
        )
    kpp = (k - 1) // stride + 1  # window rows in the collapsed view
    rows = t_out - 1 + kpp
    T_pad = rows * stride
    if T_pad > T:
        h = jnp.pad(h, ((0, 0), (0, T_pad - T), (0, 0)))
    else:
        h = h[:, :T_pad]
    x2 = h.reshape(B, rows, stride * cin)
    # zero-pad phantom taps (j >= k) so every window row is a full matmul
    wpad = jnp.pad(kernel, ((0, kpp * stride - k), (0, 0), (0, 0)))
    y = None
    for j in range(kpp):
        wj = wpad[j * stride : (j + 1) * stride].reshape(stride * cin, cout)
        yj = jax.lax.dot_general(
            x2[:, j : j + t_out],
            wj.astype(x2.dtype),
            (((2,), (0,)), ((), ())),
            preferred_element_type=x2.dtype,
        )
        y = yj if y is None else y + yj
    return y


class Conv1dMM(nn.Module):
    """Valid-padding strided conv1d executed as an im2col matmul; parameter
    layout identical to flax nn.Conv ((k, in, out) "kernel" + "bias") so
    checkpoint converters are unaffected."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, kernel_only: bool = False):
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel_size, h.shape[-1], self.features),
            jnp.float32,
        )
        if kernel_only:
            # fused-chain mode (ConvFeatureExtractor): the caller feeds the
            # kernel to the Pallas block chain (ops/pallas/conv_stack.py)
            return kernel
        y = strided_conv1d_as_matmul(h.astype(self.dtype), kernel, self.stride)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class ConvFeatureExtractor(nn.Module):
    """Strided conv1d stack turning waveform (B, T) into frames (B, T', C).

    Behavior parity with reference ConvFeatureExtractionModel "default" and
    "layer_norm" modes (/root/reference/WavLM/WavLM.py:378-504): valid (no)
    padding, kaiming-normal init, fp32 group/layer norms, exact GELU. The
    convs execute as im2col matmuls (see strided_conv1d_as_matmul) because
    XLA's TPU conv lowering runs at ~4% MFU on these shapes.
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 2, "expect raw waveform (B, T_samples)"
        h = x[:, :, None].astype(self.dtype)  # (B, T, 1)
        mode = self.cfg.extractor_mode
        layers = self.cfg.conv_layers
        # which layers run as fused Pallas (gelu->)conv->gelu blocks
        # (ops/pallas/conv_stack.py): the same-width (k in {2,3}, s=2)
        # stages of "default" mode, on TPU only. Consecutive fused layers
        # chain with NO intermediate XLA ops (padded storage rows flow
        # through; the valid length is tracked statically and sliced once
        # when leaving the chain).
        # both norm modes fuse: "default" chains conv->gelu blocks with the
        # L0 GroupNorm folded in as a (B, C) affine; "layer_norm" (r5) runs
        # the convs as norm-free Pallas blocks and keeps each per-layer
        # Fp32LayerNorm in XLA over the PADDED storage (valid because the
        # blocks write exact zeros beyond the valid length), deferring each
        # post-LN GELU into the next block's gelu_in
        can_fuse = (
            self.cfg.use_fused_conv
            and mode in ("default", "layer_norm")
            and not self.cfg.conv_bias
            and _on_tpu()
        )
        fuse = [
            bool(
                can_fuse
                and i > 0
                and k in (2, 3)
                and s == 2
                and layers[i - 1][0] == dim
            )
            for i, (dim, k, s) in enumerate(layers)
        ]
        pending_gelu = False  # previous layer's gelu deferred into the block
        pending_affine = None  # L0 GroupNorm folded into the next block
        t_valid = None  # valid rows of h while inside a fused chain
        from unispeech_tpu.ops.pallas.conv_stack import conv_gelu_block

        for i, (dim, k, stride) in enumerate(layers):
            conv = Conv1dMM(
                features=dim,
                kernel_size=k,
                stride=stride,
                use_bias=self.cfg.conv_bias,
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            if (
                i == 0
                and can_fuse
                and self.cfg.use_fused_l1
                and len(layers) > 1
                and fuse[1]
                and h.shape[-1] == 1
                and k <= 2 * stride
                and stride <= 8
            ):
                # fused L1 + GroupNorm stats: one pass from the raw
                # waveform emits the conv output AND the per-(B, C)
                # sum/sumsq — the (B, ~49k, 512) tensor is written once
                # and never re-read on the XLA side in either direction
                # (ops/pallas/l1_frontend.py)
                from unispeech_tpu.ops.pallas.l1_frontend import (
                    l1_conv_with_stats,
                )

                kernel = conv(h, kernel_only=True)
                if mode == "default":
                    h, s1, s2, t_valid = l1_conv_with_stats(
                        x, kernel, stride, dtype=self.dtype
                    )
                    mean = s1 / t_valid
                    var = jnp.maximum(s2 / t_valid - mean * mean, 0.0)
                    pending_affine = Fp32GroupNormAffine(
                        num_groups=dim, name="gn_0"
                    )(stats=(mean, var))
                else:  # layer_norm: per-layer LN in XLA, no stats needed
                    h, _, _, t_valid = l1_conv_with_stats(
                        x, kernel, stride, dtype=self.dtype,
                        with_stats=False,
                    )
                    h = Fp32LayerNorm(name="ln_0")(h)
                pending_gelu = True
                continue
            if fuse[i]:
                kernel = conv(h, kernel_only=True)
                if t_valid is None:
                    t_valid = h.shape[1]
                h, t_valid = conv_gelu_block(
                    h, kernel.astype(self.dtype), valid_len=t_valid,
                    gelu_in=pending_gelu,
                    gelu_out=mode == "default",
                    affine=pending_affine,
                )
                pending_gelu = False
                pending_affine = None
                if mode == "layer_norm":
                    # per-layer fp32 LN in XLA over the padded storage:
                    # rows >= t_valid are exact zeros (block invariant), so
                    # LN maps them to finite constants and their zero
                    # cotangents contribute nothing to scale/bias grads;
                    # the post-LN GELU defers into the next block's
                    # gelu_in when the chain continues
                    h = Fp32LayerNorm(name=f"ln_{i}")(h)
                    if i + 1 < len(layers) and fuse[i + 1]:
                        pending_gelu = True
                    else:
                        h = gelu_fp32(h)
                if i + 1 == len(layers) or not fuse[i + 1]:
                    h = h[:, :t_valid]  # leave the fused chain
                    t_valid = None
                continue
            h = conv(h)
            if mode == "layer_norm":
                h = Fp32LayerNorm(name=f"ln_{i}")(h)
            elif mode == "default" and i == 0:
                if i + 1 < len(layers) and fuse[i + 1]:
                    # fold the per-channel GroupNorm into the next fused
                    # block as an in-kernel (B, C) affine: stats computed
                    # here (reductions of h), the (B, T, C) normalize
                    # read+write pass disappears (r5: ~2.4 GB/step at B=24)
                    pending_affine = Fp32GroupNormAffine(
                        num_groups=dim, name="gn_0"
                    )(h)
                else:
                    h = Fp32GroupNorm(num_groups=dim, name="gn_0")(h)
            if i + 1 < len(layers) and fuse[i + 1]:
                pending_gelu = True  # the next fused block applies it
            else:
                h = gelu_fp32(h)
        return h  # (B, T_frames, C)


class PosConv(nn.Module):
    """Grouped conv positional embedding with weight normalization.

    Reference: /root/reference/WavLM/WavLM.py:514-527 — Conv1d(k=conv_pos,
    groups=conv_pos_groups, padding=conv_pos//2), weight_norm over dim=2
    (per-kernel-position magnitude g), SamePad trim (even kernel drops the
    last output frame), then exact GELU.
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = self.cfg.encoder_embed_dim
        K = self.cfg.conv_pos
        G = self.cfg.conv_pos_groups
        in_per_group = C // G

        import math

        std = math.sqrt(4.0 / (K * C))
        v = self.param(
            "v",
            nn.initializers.normal(stddev=std),
            (K, in_per_group, C),
            jnp.float32,
        )
        # g initialized to ||v|| per kernel position so weight == v at init
        g = self.param(
            "g",
            lambda rng: jnp.sqrt((v**2).sum(axis=(1, 2))),
        )
        norm = jnp.sqrt((v.astype(jnp.float32) ** 2).sum(axis=(1, 2), keepdims=True))
        w = (g[:, None, None] / jnp.maximum(norm, 1e-12)) * v  # (K, Cin/G, C)
        b = self.param("b", nn.initializers.zeros, (C,), jnp.float32)

        # NOTE(round 4): a Pallas phase-collapsed grouped-conv kernel was
        # built and parity-tested here, but the 48-channel groups defeat the
        # 128-lane MXU/VPU tiling from every angle tried (lane-padding to
        # 128 costs 2.67x FLOPs; per-phase splits degrade into ~256 tiny
        # matmuls/program; block-Toeplitz packing doubles FLOPs again) and
        # it never beat XLA's grouped conv (kernel 10.0 ms vs XLA 5.8 ms
        # fwd+bwd at Base bench shapes) — XLA keeps this op.
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1,),
            padding=[(K // 2, K // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=G,
        )
        y = y + b.astype(self.dtype)
        if K % 2 == 0:  # SamePad: even kernel -> drop trailing frame
            y = y[:, :-1, :]
        return gelu_fp32(y)


# ---------------------------------------------------------------------------
# transformer encoder layer
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    """True when the default backend executes on TPU hardware (the axon
    plugin registers its own platform name, so check the device kind too)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return jax.default_backend() == "tpu" or "TPU" in getattr(
        dev, "device_kind", ""
    )


class QNDense(nn.Module):
    """Dense layer with iPQ quantization noise on the weight matrix
    (reference quant_noise, /root/reference/WavLM/modules.py:203-287:
    randomly drop `block_size`-wide input blocks per output unit with
    probability p at train time, rescale survivors by 1/(1-p)). Parameter
    layout matches nn.Dense (kernel/bias) so checkpoint converters are
    unaffected."""

    features: int
    p: float
    block_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        nin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (nin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = kernel
        if self.p > 0.0 and not deterministic:
            assert nin % self.block_size == 0, (
                "input features must be a multiple of the quant-noise block"
            )
            drop = jax.random.bernoulli(
                self.make_rng("dropout"), self.p,
                (nin // self.block_size, self.features),
            )
            mask = jnp.repeat(drop, self.block_size, axis=0)
            k = jnp.where(mask, 0.0, k) / (1.0 - self.p)
        y = jnp.dot(x.astype(self.dtype), k.astype(self.dtype))
        return y + bias.astype(y.dtype)


class SelfAttention(nn.Module):
    """Multi-head self-attention with optional gated rel-pos bias.

    Parameter layout mirrors q/k/v/out projection split of the reference
    (/root/reference/WavLM/modules.py:366-378) for 1:1 checkpoint mapping.
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, D)
        position_bias: Optional[jax.Array],  # (H, T, S) ungated shared bias
        key_padding_mask: Optional[jax.Array],  # (B, S) True = pad
        deterministic: bool = True,
        attn_mask: Optional[jax.Array] = None,  # (T, S) additive fp32
    ) -> jax.Array:
        cfg = self.cfg
        D = cfg.encoder_embed_dim
        H = cfg.encoder_attention_heads
        hd = D // H
        # q/k head-dim expansion (reference multihead_attention.py:88-92):
        # q/k heads widen to `expand`, v keeps hd; softmax scaling follows q
        hd_qk = cfg.expand_attention_head_size
        if hd_qk <= 0:
            hd_qk = hd

        # init_bert_params overrides every encoder linear to normal(0.02)
        # (/root/reference/WavLM/modules.py:168-200; applied at WavLM.py:562)
        if cfg.quant_noise_pq > 0.0:
            dense = lambda name, feats=D: (
                lambda h: QNDense(
                    feats, p=cfg.quant_noise_pq,
                    block_size=cfg.quant_noise_pq_block_size,
                    dtype=self.dtype, name=name,
                )(h, deterministic)
            )
        else:
            dense = lambda name, feats=D: nn.Dense(
                feats,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02),
                name=name,
            )
        q = dense("q_proj", H * hd_qk)(x).reshape(*x.shape[:2], H, hd_qk)
        k = dense("k_proj", H * hd_qk)(x).reshape(*x.shape[:2], H, hd_qk)
        v = dense("v_proj")(x).reshape(*x.shape[:2], H, hd)

        gate = None
        if position_bias is not None and cfg.gru_rel_pos:
            grep_w = self.param(
                "grep_w", nn.initializers.normal(0.02), (hd, 8), jnp.float32
            )
            grep_b = self.param("grep_b", nn.initializers.zeros, (8,), jnp.float32)
            grep_a = self.param(
                "grep_a", nn.initializers.ones, (1, H, 1, 1), jnp.float32
            )
            gate = rel_pos_gate(x, grep_w, grep_b, grep_a, H)

        use_dropout = cfg.attention_dropout > 0.0 and not deterministic
        # Pallas fused kernel: TPU hot path for training AND eval — logits,
        # gated bias, probs and dropout masks live only in VMEM tiles, in
        # both forward and backward (ops/pallas/flash_attention.py).
        # streaming/chunked (T, S) masks (reference self_attn_mask hook,
        # wavlm.py:698,730) are streamed stripe-by-stripe like the bias.
        if cfg.use_flash_attention and _on_tpu() and hd_qk == hd:
            from unispeech_tpu.ops.pallas.flash_attention import fused_attention

            seed = None
            if use_dropout:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            out = fused_attention(
                q, k, v, position_bias, gate, key_padding_mask,
                attn_mask=attn_mask,
                dropout_rate=cfg.attention_dropout if use_dropout else 0.0,
                dropout_seed=seed,
                q_tile=cfg.attention_q_tile,
            )
        else:
            bias = None
            if position_bias is not None:
                bias = position_bias.astype(jnp.float32)[None]
                if gate is not None:
                    bias = gate[..., None] * bias
            if attn_mask is not None:
                am = attn_mask.astype(jnp.float32)[None, None]
                bias = am if bias is None else bias + am
            dropout_rng = self.make_rng("dropout") if use_dropout else None
            out = multihead_attention(
                q,
                k,
                v,
                bias=bias,
                key_padding_mask=key_padding_mask,
                dropout_rng=dropout_rng,
                dropout_rate=cfg.attention_dropout,
                deterministic=deterministic,
            )
        out = out.reshape(*x.shape[:2], D)
        return dense("out_proj")(out)


class GLULinear(nn.Module):
    """GLU feed-forward in (x_a * act(x_b)) form
    (/root/reference/WavLM/modules.py:99-129)."""

    features: int
    glu_type: str = "swish"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Dense(
            self.features * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02),
            name="linear",
        )(x)
        a, b = y[..., : self.features], y[..., self.features :]
        act = get_activation(self.glu_type)
        return a * act(b)


class TransformerEncoderLayer(nn.Module):
    """Pre- or post-LN transformer layer
    (/root/reference/WavLM/WavLM.py:615-742).

    When `scanned=True` the layer acts as an `nn.scan` body: it applies
    layerdrop internally and returns `(y, x_in-or-None)` so the encoder can
    stack all layers into ONE compiled body (and `nn.remat` it) instead of
    unrolling L copies — the TPU replacement for the reference's
    checkpoint_activations wrapper.
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32
    deterministic: bool = True
    scanned: bool = False
    collect: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        position_bias: Optional[jax.Array],
        key_padding_mask: Optional[jax.Array],
        attn_mask: Optional[jax.Array] = None,
    ):
        cfg = self.cfg
        deterministic = self.deterministic
        act = get_activation(cfg.activation_fn)

        def drop(rate, h):
            if deterministic or rate == 0.0:
                return h
            # seed-recompute dropout: under nn.scan the stock nn.Dropout
            # stores an (L, B, T, D) bool mask residual per site
            # (ops/dropout.py)
            from unispeech_tpu.ops.dropout import seed_dropout

            return seed_dropout(h, self.make_rng("dropout"), rate)
        attn = lambda h: SelfAttention(cfg, dtype=self.dtype, name="self_attn")(
            h, position_bias, key_padding_mask, deterministic, attn_mask
        )
        x_in = x

        if cfg.quant_noise_pq > 0.0:
            # iPQ quantization noise on the FFN linears too (fairseq applies
            # quant_noise to fc1/fc2 alongside the attention projections)
            ffn_dense = lambda feats, name: (
                lambda h: QNDense(
                    feats, p=cfg.quant_noise_pq,
                    block_size=cfg.quant_noise_pq_block_size,
                    dtype=self.dtype, name=name,
                )(h, deterministic)
            )
        else:
            ffn_dense = lambda feats, name: nn.Dense(
                feats,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02),
                name=name,
            )

        def _ffn_body(mdl, h):
            if cfg.activation_fn == "glu":
                h = GLULinear(
                    cfg.encoder_ffn_embed_dim, "swish", dtype=mdl.dtype,
                    name="fc1",
                )(h)
            else:
                h = ffn_dense(cfg.encoder_ffn_embed_dim, "fc1")(h)
                h = act(h)
            h = drop(cfg.activation_dropout, h)
            h = ffn_dense(cfg.encoder_embed_dim, "fc2")(h)
            return h

        if cfg.remat_ffn and not cfg.remat_layers:
            # recompute fc1+gelu in backward instead of storing the
            # (L, B, T, 4D) activation stack (the largest residual in the
            # no-remat configuration); params keep their fc1/fc2 names
            ffn_r = nn.remat(_ffn_body, prevent_cse=False)
            ffn = lambda h: ffn_r(self, h)
        else:
            ffn = lambda h: _ffn_body(self, h)

        ln1 = Fp32LayerNorm(eps=cfg.layer_norm_eps, name="self_attn_layer_norm")
        ln2 = Fp32LayerNorm(eps=cfg.layer_norm_eps, name="final_layer_norm")

        if cfg.layer_norm_first:
            x = x + drop(cfg.dropout, attn(ln1(x)))
            x = x + drop(cfg.dropout, ffn(ln2(x)))
        else:
            x = ln1(x + drop(cfg.dropout, attn(x)))
            x = ln2(x + drop(cfg.dropout, ffn(x)))

        if not self.scanned:
            return x
        if cfg.encoder_layerdrop > 0.0 and not deterministic:
            # scalar blend, NOT jnp.where with a broadcast predicate: XLA
            # saves where's predicate for the backward, which under scan
            # materializes an (L, B, T, D) bool buffer (54 MB at Base bench
            # shapes, seen in the round-3 device trace); the multiply's
            # saved residual is one scalar per layer.
            keep = (
                jax.random.uniform(self.make_rng("layerdrop"), ())
                > cfg.encoder_layerdrop
            ).astype(x.dtype)
            x = x_in + keep * (x - x_in)
        return x, (x_in if self.collect else None)


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncoderOutput:
    x: jax.Array  # (B, T, D) final output
    layer_outputs: Optional[jax.Array]  # (L+1, B, T, D) inputs to each layer + final
    position_bias: Optional[jax.Array]


class TransformerEncoder(nn.Module):
    """Transformer over frame features with conv positional embedding.

    Reference: /root/reference/WavLM/WavLM.py:507-612. `layer_outputs[i]` is
    the hidden state *entering* layer i (i=0 is the post-pos-conv embedding),
    and `layer_outputs[L]` is the final layer's output — matching the
    reference's `layer_results` convention when `ret_layer_results=True`.
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, T, D)
        padding_mask: Optional[jax.Array] = None,  # (B, T) True = pad
        deterministic: bool = True,
        collect_layer_outputs: bool = False,
        output_layer: Optional[int] = None,  # 1-based: stop after this layer
        attn_mask: Optional[jax.Array] = None,  # (T, S) additive streaming
        # mask (reference streaming_mask hook, wavlm.py:698,730)
    ) -> EncoderOutput:
        cfg = self.cfg

        if padding_mask is not None:
            x = jnp.where(padding_mask[..., None], 0.0, x)

        x = x + PosConv(cfg, dtype=self.dtype, name="pos_conv")(x)

        if not cfg.layer_norm_first:
            x = Fp32LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm")(x)

        if cfg.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=cfg.dropout, deterministic=False)(x)

        position_bias = None
        if cfg.relative_position_embedding:
            table = self.param(
                "rel_attn_bias",
                nn.initializers.normal(0.02),
                (cfg.num_buckets, cfg.encoder_attention_heads),
                jnp.float32,
            )
            T = x.shape[1]
            # computed once OUTSIDE the layer scan, already in the compute
            # dtype: the scan then carries/accumulates the (H, T, S) bias and
            # its cotangent at bf16 width instead of fp32 (28 MB -> 14 MB per
            # layer of HBM traffic at Base bench shapes). The per-element
            # bf16 rounding of the bias gradient is the same deliberate
            # tradeoff the kernel already makes (round-2 advisor note #1);
            # the (num_buckets, H) table gradient reduction still sums fp32.
            position_bias = compute_rel_pos_bias(
                table, T, T, cfg.num_buckets, cfg.max_distance,
                dtype=self.dtype,
            )

        L = cfg.encoder_layers
        layer_outputs = None
        if cfg.scan_layers:
            # One compiled layer body scanned L times; per-layer activations
            # rematerialized during backward (nothing but the (L, B, T, D)
            # carries is saved). Params gain a leading L axis under "layers".
            collect = collect_layer_outputs or output_layer is not None
            Layer = TransformerEncoderLayer
            if cfg.remat_layers:
                Layer = nn.remat(Layer, prevent_cse=False)
            ScanLayers = nn.scan(
                Layer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True, "layerdrop": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=L,
                # full unroll keeps STACKED param storage (one big adam
                # fusion per param kind, stable "layers/..." names) while
                # giving XLA static layer indices instead of the while-loop
                # dynamic slices/update-slices
                unroll=L if cfg.scan_unroll else 1,
            )
            x_final, ys = ScanLayers(
                cfg,
                dtype=self.dtype,
                deterministic=deterministic,
                scanned=True,
                collect=collect,
                name="layers",
            )(x, position_bias, padding_mask, attn_mask)
            if output_layer is not None and output_layer < L:
                # output of 1-based layer p == input to 0-based layer p
                x = ys[output_layer]
            else:
                x = x_final
            if collect_layer_outputs:
                layer_outputs = jnp.concatenate([ys, x_final[None]], axis=0)
        else:
            # Unrolled layers: per-layer params (layer_{i}/...), so each dW
            # is written once — none of the scan path's whole-buffer
            # (L, ...) dW update-slice copies or per-layer param
            # dynamic-slices exist. Measured 97.5 -> 82.4 ms/step at Base
            # bench shapes on v5e (r5 trace: ~9.2 ms DUS + ~4.3 ms slicing
            # were pure scan artifacts); scan remains the Large default for
            # compile time + scan-remat memory.
            n_layers = L if output_layer is None else output_layer
            Layer = TransformerEncoderLayer
            if cfg.remat_layers:
                Layer = nn.remat(Layer, prevent_cse=False)
            outputs = []
            for i in range(n_layers):
                if collect_layer_outputs:
                    outputs.append(x)
                x = Layer(
                    cfg,
                    dtype=self.dtype,
                    deterministic=deterministic,
                    scanned=True,
                    collect=False,
                    name=f"layer_{i}",
                )(x, position_bias, padding_mask, attn_mask)[0]
            if collect_layer_outputs:
                outputs.append(x)
                layer_outputs = jnp.stack(outputs, axis=0)

        if cfg.layer_norm_first and output_layer is None:
            x = Fp32LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm")(x)

        return EncoderOutput(x=x, layer_outputs=layer_outputs, position_bias=position_bias)
