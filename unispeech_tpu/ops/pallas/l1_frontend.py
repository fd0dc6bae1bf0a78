"""Fused L1 waveform conv + GroupNorm statistics Pallas kernels.

The frontend's first conv (reference ConvFeatureExtractionModel layer 0,
/root/reference/WavLM/WavLM.py:378-505: Conv1d(1, 512, k=10, stride=5)) is
computationally trivial (~12 GFLOP at Base bench shapes) but its output is
the largest tensor of the whole model (B, ~49k, 512 — 1.2 GB bf16 at
B=24), and the r5 profile showed the XLA path spending ~12.5 ms/step on it
in the forward alone: the stride-collapsed matmuls write the 1.2 GB, the
frontend GroupNorm's mean/var re-read it (plus a cast pass), all pure HBM
traffic. The backward was worse: the stats backprop and the dW1
contraction each re-read/write the same 1.2 GB several times.

This module fuses the whole complex into two bandwidth-minimal kernels:

  forward  : raw waveform (24 MB) -> y1 (one 1.2 GB write) AND the
             per-(batch, channel) sum / sum-of-squares accumulated in the
             same pass (GroupNorm stats are derived outside on (B, C)).
  backward : reads the y1 cotangent once (1.2 GB), RECOMPUTES y1 from the
             waveform in-kernel (24 MB — 50x cheaper than re-reading it),
             folds in the stats backprop (dy1 += ds1 + 2*ds2*y1), and
             contracts the collapsed-waveform patches against it for dW1
             — no dy1 materialization, no separate stats-backprop pass.

Layout: the stride-5 waveform is collapsed OUTSIDE to (B, R+1, 8) bf16
(5 real samples + 3 zero lanes per row — lane padding keeps the row count
identical to the collapsed view, so window row r holds samples
[5r, 5r+5)). L1 output row t = x2[t] @ wA + x2[t+1] @ wB where wA/wB are
the first/last 5 taps, each zero-padded to 8 rows: two (tile, 8) x (8, C)
MXU dots per tile. Rows at/beyond the valid output length t1 are zeroed in
the window (covers both the zero-pad rows of the collapsed array and
Mosaic Element-pad garbage), so y1 storage rows >= t1 are exact zeros and
contribute nothing to the stats.

Precision parity with the unfused path: the waveform is cast to bf16
before the dots (as Conv1dMM does), dots accumulate f32 and round to bf16,
and the stats are f32 sums of the bf16-rounded values — var is derived as
E[x^2] - E[x]^2 on (B, C) outside (vs jnp.var's two-pass form; at these
magnitudes the difference is ~1e-7 relative).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(x2_ref, w_ref, *out_refs, tile, t1, stats):
    y_ref = out_refs[0]
    b, t = pl.program_id(0), pl.program_id(1)

    if stats:
        s1_ref, s2_ref = out_refs[1], out_refs[2]

        @pl.when(t == 0)
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

    X2 = x2_ref[0]  # (tile + 8, 8) rows starting at tile*t
    # zero rows at/beyond the valid output length (zero-pad region of the
    # collapsed array and Element-pad garbage alike); y1 rows >= t1 become
    # exact zeros
    ri = jax.lax.broadcasted_iota(jnp.int32, (X2.shape[0], 1), 0)
    X2 = jnp.where(tile * t + ri <= t1, X2, 0)
    w = w_ref[...]  # (2, 8, C)
    acc = jax.lax.dot_general(
        X2[:tile], w[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        X2[1 : tile + 1], w[1], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # the row-validity mask above zeroes taps, not outputs; kill the last
    # valid-input row's partial window explicitly
    li = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    acc = jnp.where(tile * t + li < t1, acc, 0.0)
    ybf = acc.astype(y_ref.dtype)
    y_ref[0] = ybf
    if stats:
        yf = ybf.astype(jnp.float32)
        s1_ref[0, 0] += jnp.sum(yf, axis=0)
        s2_ref[0, 0] += jnp.sum(yf * yf, axis=0)


def _bwd_kernel(x2_ref, w_ref, dy_ref, ds1_ref, ds2_ref, dw_ref,
                *, tile, t1, stats):
    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    X2 = x2_ref[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (X2.shape[0], 1), 0)
    X2 = jnp.where(tile * t + ri <= t1, X2, 0)
    w = w_ref[...]
    xa = X2[:tile]
    xb = X2[1 : tile + 1]
    li = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    if stats:
        # recompute the bf16-rounded y1 tile (same dots as the forward ->
        # bit-identical) for the sum-of-squares backprop term
        acc = jax.lax.dot_general(
            xa, w[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xb, w[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y1f = acc.astype(dy_ref.dtype).astype(jnp.float32)

        # dy1 = upstream cotangent + stats backprop; rows >= t1 masked
        # (the ds1 broadcast would otherwise inject gradient into padding
        # rows)
        dy = (
            dy_ref[0].astype(jnp.float32)
            + ds1_ref[0, 0].astype(jnp.float32)
            + 2.0 * ds2_ref[0, 0].astype(jnp.float32) * y1f
        )
        dy = jnp.where(tile * t + li < t1, dy, 0.0)
        dyc = dy.astype(X2.dtype)
    else:
        dyc = jnp.where(
            tile * t + li < t1, dy_ref[0].astype(jnp.float32), 0.0
        ).astype(X2.dtype)
    dw_ref[0] += jax.lax.dot_general(
        xa, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw_ref[1] += jax.lax.dot_general(
        xb, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _collapse(wav: jax.Array, stride: int, rows: int,
              dtype) -> jax.Array:
    """(B, NS) waveform -> (B, rows, 8) collapsed view: row r holds samples
    [stride*r, stride*(r+1)) in lanes 0..stride-1, zeros elsewhere."""
    B, NS = wav.shape
    need = rows * stride
    if need > NS:
        wav = jnp.pad(wav, ((0, 0), (0, need - NS)))
    else:
        wav = wav[:, :need]
    x2 = wav.reshape(B, rows, stride).astype(dtype)
    return jnp.pad(x2, ((0, 0), (0, 0), (0, 8 - stride)))


def _pack_w(kernel: jax.Array, stride: int, dtype) -> jax.Array:
    """(k, 1, C) nn.Conv kernel -> (2, 8, C): first/second window-row taps,
    zero-padded to 8 lanes-rows."""
    k, cin, C = kernel.shape
    assert cin == 1 and k <= 2 * stride and stride <= 8
    w = kernel[:, 0, :]
    wA = jnp.pad(w[:stride], ((0, 8 - stride), (0, 0)))
    wB = jnp.pad(w[stride:], ((0, 8 - (k - stride)), (0, 0)))
    return jnp.stack([wA, wB]).astype(dtype)


def _run_fwd(tile, t1, interpret, x2, w, stats=True):
    B, R1, _ = x2.shape
    R = R1 - 1
    nt = R // tile
    C = w.shape[2]
    grid = (B, nt)
    xpad = (nt - 1) * tile + tile + 8 - R1
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile + 8, (0, xpad)), pl.Element(8)),
        lambda b, t: (b, tile * t, 0),
    )
    s_specs = [pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0))] * 2
    s_shapes = [jax.ShapeDtypeStruct((B, 1, C), jnp.float32)] * 2
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, tile=tile, t1=t1, stats=stats),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((2, 8, C), lambda b, t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        ] + (s_specs if stats else []),
        out_shape=[
            jax.ShapeDtypeStruct((B, R, C), x2.dtype),
        ] + (s_shapes if stats else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * 16 * C,
            bytes_accessed=B * R * C * 2 + B * R1 * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w)
    if stats:
        y, s1, s2 = outs
        return y, s1[:, 0], s2[:, 0]
    return outs[0] if isinstance(outs, (list, tuple)) else outs, None, None


def _run_bwd(tile, t1, interpret, x2, w, dy, ds1, ds2, stats=True):
    B, R1, _ = x2.shape
    R = R1 - 1
    nt = R // tile
    C = w.shape[2]
    grid = (B, nt)
    xpad = (nt - 1) * tile + tile + 8 - R1
    x_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile + 8, (0, xpad)), pl.Element(8)),
        lambda b, t: (b, tile * t, 0),
    )
    dw = pl.pallas_call(
        functools.partial(_bwd_kernel, tile=tile, t1=t1, stats=stats),
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((2, 8, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, 8, C), lambda b, t: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 8, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * R * 16 * C,
            bytes_accessed=B * R * C * 2 + B * R1 * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, w, dy, ds1.reshape(B, 1, C), ds2.reshape(B, 1, C))
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _l1(stride, tile, t1, interpret, stats, x2, kernel):
    w = _pack_w(kernel, stride, x2.dtype)
    outs = _run_fwd(tile, t1, interpret, x2, w, stats=stats)
    return outs if stats else outs[0]


def _l1_fwd(stride, tile, t1, interpret, stats, x2, kernel):
    outs = _l1(stride, tile, t1, interpret, stats, x2, kernel)
    return outs, (x2, kernel)


def _l1_bwd(stride, tile, t1, interpret, stats, res, cots):
    x2, kernel = res
    k = kernel.shape[0]
    w = _pack_w(kernel, stride, x2.dtype)
    if stats:
        dy, ds1, ds2 = cots
    else:
        dy = cots
        B, C = x2.shape[0], kernel.shape[2]
        ds1 = ds2 = jnp.zeros((B, C), jnp.float32)
    dw = _run_bwd(tile, t1, interpret, x2, w, dy.astype(x2.dtype), ds1, ds2,
                  stats=stats)
    # unpack (2, 8, C) -> (k, 1, C) nn.Conv layout
    dkernel = jnp.concatenate(
        [dw[0, :stride], dw[1, : k - stride]], axis=0
    )[:, None, :]
    return jnp.zeros_like(x2), dkernel.astype(kernel.dtype)


_l1.defvjp(_l1_fwd, _l1_bwd)


def l1_conv_with_stats(
    wav: jax.Array,  # (B, NS) raw waveform
    kernel: jax.Array,  # (k, 1, C) nn.Conv layout, k <= 2*stride
    stride: int,
    dtype=jnp.bfloat16,
    tile: int = 1024,
    interpret: bool = False,
    with_stats: bool = True,
):
    """Fused first-layer conv + GroupNorm statistics.

    Returns (y1, s1, s2, t1): y1 (B, R, C) in `dtype` with R = nt*tile >=
    t1 storage rows (rows >= t1 are exact zeros); s1/s2 (B, C) f32 sums of
    y1 and y1^2 over the t1 valid rows; t1 the valid output length.
    Differentiable in `kernel` (waveform cotangent is zero — it is data).
    """
    B, NS = wav.shape
    k = kernel.shape[0]
    assert tile % 8 == 0, tile  # Element start maps need provable 8-tiling
    t1 = (NS - k) // stride + 1
    nt = pl.cdiv(t1, tile)
    R = nt * tile
    x2 = _collapse(wav, stride, R + 1, dtype)
    if with_stats:
        y1, s1, s2 = _l1(stride, tile, t1, interpret, True, x2, kernel)
        return y1, s1, s2, t1
    y1 = _l1(stride, tile, t1, interpret, False, x2, kernel)
    return y1, None, None, t1
