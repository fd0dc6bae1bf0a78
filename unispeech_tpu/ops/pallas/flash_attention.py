"""Fused attention Pallas kernel with WavLM gated relative position bias.

The hot op of the whole family (SURVEY.md §3.1): the reference runs
`F.multi_head_attention_forward` with the gated bias folded into attn_mask
(/root/reference/WavLM/modules.py:540-563), materializing (B*H, T, S) logits
in device memory. This kernel keeps the logits tile-resident in VMEM:

  grid = (B*H, T/TQ); each program loads one q tile + the full K/V for its
  head (S ≈ 1k frames ⇒ K,V ≈ 0.5 MB in bf16 — comfortably VMEM-resident),
  adds gate[b,h,t] * pos_bias[h,t,s] + padding mask, does an fp32 softmax and
  multiplies by V. The (H,T,S) shared bias is streamed per q-tile; the
  (B,H,T,S) gated bias never exists anywhere.

Backward runs the XLA reference math under custom_vjp (recompute — same
memory behavior as jax.checkpoint'ing the attention, which is how the train
step remats anyway).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unispeech_tpu.ops.attention import multihead_attention

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel_bias(q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref, o_ref,
                      *, scale: float):
    """One (head, q-tile) program: logits -> +gate*bias -> +mask -> softmax -> PV."""
    q = q_ref[0]  # (TQ, hd)
    k = k_ref[0]  # (S, hd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, S)
    gate = gate_ref[0].astype(jnp.float32)  # (TQ, 1)
    s = s + gate * bias_ref[0].astype(jnp.float32)
    s = s + mask_ref[0].astype(jnp.float32)  # (1, S) additive, broadcasts
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o_ref[0] = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attn_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + mask_ref[0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_attention(
    q: jax.Array,  # (B, T, H, hd) unscaled
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],  # (H, T, S) shared rel-pos bias
    gate: Optional[jax.Array],  # (B, H, T) per-query gate (ones if ungated)
    key_padding_mask: Optional[jax.Array],  # (B, S) True = pad
    q_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    B, T, H, hd = q.shape
    S = k.shape[1]
    scale = hd**-0.5
    dtype = q.dtype

    Tp = _round_up(T, q_tile)
    Sp = _round_up(S, 128)
    hdp = _round_up(hd, 128)

    def pad(x, t_axis, to, hd_pad=False):
        cfg = [(0, 0)] * x.ndim
        cfg[t_axis] = (0, to - x.shape[t_axis])
        if hd_pad:
            cfg[-1] = (0, hdp - x.shape[-1])
        return jnp.pad(x, cfg)

    # (B*H, Tp, hdp) layout
    qh = pad(q, 1, Tp, True).transpose(0, 2, 1, 3).reshape(B * H, Tp, hdp)
    kh = pad(k, 1, Sp, True).transpose(0, 2, 1, 3).reshape(B * H, Sp, hdp)
    vh = pad(v, 1, Sp, True).transpose(0, 2, 1, 3).reshape(B * H, Sp, hdp)

    # additive key mask, padding lanes included
    if key_padding_mask is None:
        addmask = jnp.zeros((B, Sp), jnp.float32)
    else:
        addmask = jnp.where(pad(key_padding_mask, 1, Sp), NEG_INF, 0.0)
    if Sp > S:
        addmask = addmask.at[:, S:].set(NEG_INF)
    # (B, 1, Sp): block (1, 1, Sp) satisfies the TPU (8, 128) tiling rule
    addmask = addmask.astype(jnp.float32)[:, None, :]

    grid = (B * H, Tp // q_tile)
    common_specs = [
        pl.BlockSpec((1, q_tile, hdp), lambda bh, qi: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, hdp), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, hdp), lambda bh, qi: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    mask_spec = pl.BlockSpec((1, 1, Sp), lambda bh, qi: (bh // H, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, q_tile, hdp), lambda bh, qi: (bh, qi, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B * H, Tp, hdp), dtype)
    cost = pl.CostEstimate(
        flops=4 * B * H * Tp * Sp * hdp,
        bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize,
        transcendentals=B * H * Tp * Sp,
    )

    if bias is not None:
        biasp = pad(pad(bias, 1, Tp), 2, Sp).astype(jnp.float32)  # (H, Tp, Sp)
        if gate is None:
            gate = jnp.ones((B, H, T), jnp.float32)
        # (B*H, Tp, 1): trailing dims (Tp, 1) are tiling-legal for a block
        # of (q_tile, 1)
        gatep = (
            pad(gate, 2, Tp).astype(jnp.float32)
            .reshape(B * H, Tp)[..., None]
        )
        kernel = functools.partial(_attn_kernel_bias, scale=scale)
        in_specs = common_specs + [
            pl.BlockSpec((1, q_tile, Sp), lambda bh, qi: (bh % H, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ]
        out = pl.pallas_call(
            kernel, out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=grid, in_specs=in_specs,
                                  out_specs=out_spec),
            cost_estimate=cost, interpret=interpret,
        )(qh, kh, vh, biasp, gatep, addmask)
    else:
        kernel = functools.partial(_attn_kernel_nobias, scale=scale)
        out = pl.pallas_call(
            kernel, out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=grid, in_specs=common_specs + [mask_spec],
                                  out_specs=out_spec),
            cost_estimate=cost, interpret=interpret,
        )(qh, kh, vh, addmask)

    out = out.reshape(B, H, Tp, hdp).transpose(0, 2, 1, 3)
    return out[:, :T, :, :hd]


def _xla_attention(q, k, v, bias, gate, key_padding_mask):
    """Reference math (ops/attention.py) with the gate applied to the shared
    bias — used for the backward pass and as the CPU fallback."""
    full_bias = None
    if bias is not None:
        b = bias.astype(jnp.float32)[None]  # (1, H, T, S)
        if gate is not None:
            b = gate.astype(jnp.float32)[..., None] * b
        full_bias = b
    return multihead_attention(
        q, k, v, bias=full_bias, key_padding_mask=key_padding_mask,
        deterministic=True,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_attention(q, k, v, bias, gate, key_padding_mask, interpret=False):
    """Flash-style fused attention; differentiable (backward = XLA recompute).

    Args mirror ops.attention.multihead_attention but with the WavLM bias in
    factored form: bias (H, T, S) shared table expansion + gate (B, H, T).
    """
    return _pallas_attention(q, k, v, bias, gate, key_padding_mask,
                             interpret=interpret)


def _fused_fwd(q, k, v, bias, gate, key_padding_mask, interpret):
    out = _pallas_attention(q, k, v, bias, gate, key_padding_mask,
                            interpret=interpret)
    return out, (q, k, v, bias, gate, key_padding_mask)


def _fused_bwd(interpret, res, g):
    q, k, v, bias, gate, key_padding_mask = res
    # None-ness of bias/gate is static at trace time — branch in python so
    # jax.vjp only differentiates real arrays
    if bias is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, None, None,
                                              key_padding_mask),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None, None
    if gate is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_, b_: _xla_attention(q_, k_, v_, b_, None,
                                                  key_padding_mask),
            q, k, v, bias,
        )
        dq, dk, dv, db = vjp(g)
        return dq, dk, dv, db, None, None
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_, g_: _xla_attention(q_, k_, v_, b_, g_,
                                                  key_padding_mask),
        q, k, v, bias, gate,
    )
    dq, dk, dv, db, dg = vjp(g)
    return dq, dk, dv, db, dg, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)
