"""Fused attention Pallas kernels with WavLM gated relative position bias.

The hot op of the whole family (SURVEY.md §3.1): the reference runs
`F.multi_head_attention_forward` with the gated bias folded into attn_mask
(/root/reference/WavLM/modules.py:540-563), materializing (B*H, T, S) logits
in device memory. Here neither forward NOR backward ever materializes a
(B, H, T, S) tensor in HBM.

Layout: all kernels operate on (H, B, Tp, hd) arrays with an in-kernel loop
over the batch. This makes every HBM stream amortized:
  * the (h, q-tile) rel-pos bias block is loaded ONCE per program and reused
    for all B batch rows (a (B*H, ...) layout re-streams it B*H times — that
    alone was ~230 MB/layer/pass at Base shapes, the round-1 bottleneck);
  * K/V for head h (all batch rows) stay VMEM-resident across the q-tile
    grid axis (block index constant in the innermost axis);
  * the bias is streamed in the compute dtype (bf16 in training): forward and
    backward read the SAME low-precision value and upcast, so the backward's
    probability recompute stays bit-exact.

  forward  — grid (H, T/TQ): q tile + full K/V per (head, all-b) resident;
             logits + gate[b,h,t] * pos_bias[h,t,s] + padding mask -> fp32
             softmax -> in-kernel dropout (pltpu PRNG, per-(b*H+h, q-tile)
             streams) -> PV. Emits out and log-sum-exp rows for backward.
  backward — two kernels, each tile-parallel, < 8 MB VMEM/program:
               dq kernel, grid (H, QT): loops b; recomputes probabilities
                 from (q, k, lse) — identical dropout bits regenerated — and
                 emits dq, dgate, and dbias (accumulated over b in a scratch,
                 written once).
               dkv kernel, grid (H, KT): loops (b, q-tile); emits dk, dv.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_GOLDEN = 0x9E3779B9  # seed mixing constant


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_seed(seed, bh, qi):
    # deterministic per (batch*head, q-tile) stream; wraps mod 2^32
    mix = (jnp.uint32(bh) * jnp.uint32(131071) + jnp.uint32(qi)) * jnp.uint32(
        _GOLDEN
    )
    return (seed.astype(jnp.uint32) + mix).astype(jnp.int32)


def _keep_scale(shape, rate: float):
    """Dropout keep/(1-rate) multiplier from the seeded per-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = min(int(rate * 4294967296.0), 4294967295)
    keep = bits >= jnp.uint32(threshold)
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                o_ref, lse_ref, *, scale: float, rate: float, H: int,
                B: int, has_bias: bool):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    bias = bias_ref[0].astype(jnp.float32) if has_bias else None  # (TQ, S)
    for b in range(B):
        q = q_ref[0, b]  # (TQ, hd)
        k = k_ref[0, b]  # (S, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (TQ, S)
        if has_bias:
            gate = gate_ref[0, b].astype(jnp.float32)  # (TQ, 1)
            s = s + gate * bias
        s = s + mask_ref[b].astype(jnp.float32)  # (1, S) broadcasts
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        probs = p / l
        if rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
            probs = probs * _keep_scale(probs.shape, rate)
        o_ref[0, b] = jnp.dot(
            probs.astype(v_ref.dtype), v_ref[0, b],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        lse_ref[0, b, :, 0] = (m + jnp.log(l))[:, 0]


def _fwd_kernel_nobias(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                       o_ref, lse_ref, *, scale, rate, H, B, has_bias):
    _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, None, None, mask_ref,
                o_ref, lse_ref, scale=scale, rate=rate, H=H, B=B,
                has_bias=False)


def _run_forward(qh, kh, vh, biasp, gatep, addmask, seed, *,
                 scale, rate, q_tile, interpret):
    H, B, Tp, hd = qh.shape
    Sp = kh.shape[2]
    has_bias = biasp is not None
    grid = (H, Tp // q_tile)

    def q_map(h, qi, *_):
        return (h, 0, qi, 0)

    def kv_map(h, qi, *_):
        return (h, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, B, q_tile, hd), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Sp, hd), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Sp, hd), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [qh, kh, vh]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, q_tile, Sp), lambda h, qi, *_: (h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
    in_specs.append(
        pl.BlockSpec((B, 1, Sp), lambda h, qi, *_: (0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(addmask)

    kernel = functools.partial(
        _fwd_kernel if has_bias else _fwd_kernel_nobias,
        scale=scale, rate=rate, H=H, B=B, has_bias=has_bias,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, B, q_tile, hd), q_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, q_tile, 1), q_map,
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, B, Tp, hd), qh.dtype),
            jax.ShapeDtypeStruct((H, B, Tp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * H * B * Tp * Sp * hd,
            bytes_accessed=(qh.size + kh.size + vh.size) * 2
            + H * B * Tp * hd * 2,
            transcendentals=H * B * Tp * Sp,
        ),
        interpret=interpret,
    )(seed, *args)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _recompute_probs(q, k, lse, gate, bias, addmask, *, scale, has_bias):
    """(TQ, S|KT) probabilities p = exp(s - lse), recomputed exactly like
    the forward (bias read in the same storage dtype, upcast to fp32, so the
    logits match bit-for-bit)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if has_bias:
        s = s + gate * bias
    s = s + addmask
    return jnp.exp(s - lse)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
               lse_ref, delta_ref, do_ref,
               dq_ref, dgate_ref, dbias_ref, dbias_acc,
               *, scale: float, rate: float, H: int, B: int, has_bias: bool):
    """One (head, q-tile) program, looping batch rows.

    Gradient math (dropout folded in): with probs p = exp(s - lse),
    keep-scale c = keep/(1-rate), out = (p*c) @ v:
      dP    = dO @ v^T
      dS    = p * (c*dP - delta),   delta = rowsum(dO * out)
      dq    = dS @ k * scale
      dgate = rowsum(dS * bias) ;  dbias = sum_b gate * dS
    """
    h = pl.program_id(0)
    qi = pl.program_id(1)
    bias = bias_ref[0].astype(jnp.float32) if has_bias else None  # (TQ, S)
    if has_bias:
        dbias_acc[...] = jnp.zeros_like(dbias_acc)

    for b in range(B):
        q = q_ref[0, b]  # (TQ, hd)
        k = k_ref[0, b]  # (S, hd)
        do = do_ref[0, b]
        lse = lse_ref[0, b]  # (TQ, 1)
        delta = delta_ref[0, b]
        gate = gate_ref[0, b].astype(jnp.float32) if has_bias else None

        p = _recompute_probs(
            q, k, lse, gate, bias, mask_ref[b].astype(jnp.float32),
            scale=scale, has_bias=has_bias,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, b], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, S)
        if rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
            c = _keep_scale(p.shape, rate)
            ds = p * (c * dp - delta)
        else:
            ds = p * (dp - delta)

        dq_ref[0, b] = (jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)

        if has_bias:
            dgate_ref[0, b, :, 0] = jnp.sum(ds * bias, axis=-1)
            dbias_acc[...] += gate * ds

    if has_bias:
        dbias_ref[0] = dbias_acc[...]


def _dq_kernel_nobias(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                      lse_ref, delta_ref, do_ref, dq_ref,
                      *, scale, rate, H, B, has_bias):
    _dq_kernel(seed_ref, q_ref, k_ref, v_ref, None, None, mask_ref,
               lse_ref, delta_ref, do_ref, dq_ref, None, None, None,
               scale=scale, rate=rate, H=H, B=B, has_bias=False)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, gate_ref, mask_ref,
                lse_ref, delta_ref, do_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, bits_scratch,
                *, scale: float, rate: float, q_tile: int, k_tile: int,
                H: int, B: int, has_bias: bool):
    """One (head, k-tile) program; inner loops over (batch, q-tile).

      dv = (p*c)^T @ dO ;  dk = dS^T @ q * scale
    The dropout keep-mask is regenerated from the same per-(b*H+h, q-tile)
    seeds as the forward, then column-sliced to this k tile.
    """
    h = pl.program_id(0)
    ki = pl.program_id(1)

    Tp = q_ref.shape[2]
    Sp_full = mask_ref.shape[2] if rate > 0.0 else 0  # full padded S for RNG
    threshold = min(int(rate * 4294967296.0), 4294967295) if rate > 0.0 else 0

    for b in range(B):
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)
        k = k_ref[0, b]  # (KT, hd)
        v = v_ref[0, b]
        mask = mask_ref[b, :, pl.ds(ki * k_tile, k_tile)].astype(jnp.float32)

        for qi in range(Tp // q_tile):
            sl = pl.ds(qi * q_tile, q_tile)
            q = q_ref[0, b, sl, :]  # (TQ, hd)
            do = do_ref[0, b, sl, :]
            lse = lse_ref[0, b, sl, :]
            delta = delta_ref[0, b, sl, :]
            gate = (
                gate_ref[0, b, sl, :].astype(jnp.float32) if has_bias else None
            )
            bias = bias_ref[0, sl, :].astype(jnp.float32) if has_bias else None

            p = _recompute_probs(
                q, k, lse, gate, bias, mask, scale=scale, has_bias=has_bias
            )  # (TQ, KT)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, KT)
            if rate > 0.0:
                # same bit stream as the forward's (TQ, Sp) draw, staged
                # through a VMEM scratch so this k tile's columns can be
                # ref-sliced (Mosaic has no dynamic_slice on values)
                pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
                bits_scratch[...] = pltpu.bitcast(
                    pltpu.prng_random_bits((q_tile, Sp_full)), jnp.uint32
                )
                cols = bits_scratch[:, pl.ds(ki * k_tile, k_tile)]
                c = jnp.where(
                    cols >= jnp.uint32(threshold), 1.0 / (1.0 - rate), 0.0
                )
                pc = p * c
                ds = p * (c * dp - delta)
            else:
                pc = p
                ds = p * (dp - delta)

            dv_acc[...] += jax.lax.dot_general(
                pc.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (KT, hd)
            dk_acc[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale

        dk_ref[0, b] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, b] = dv_acc[...].astype(dv_ref.dtype)


def _dkv_kernel_nobias(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                       lse_ref, delta_ref, do_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, bits_scratch,
                       *, scale, rate, q_tile, k_tile, H, B, has_bias):
    _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, None, None, mask_ref,
                lse_ref, delta_ref, do_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                bits_scratch,
                scale=scale, rate=rate, q_tile=q_tile, k_tile=k_tile,
                H=H, B=B, has_bias=False)


def _run_backward(qh, kh, vh, biasp, gatep, addmask, seed, lse, delta, do, *,
                  scale, rate, q_tile, interpret):
    H, B, Tp, hd = qh.shape
    Sp = kh.shape[2]
    has_bias = biasp is not None
    k_tile = min(q_tile, Sp)

    def q_map(h, qi, *_):
        return (h, 0, qi, 0)

    def full_map(h, qi, *_):
        return (h, 0, 0, 0)

    def mask_map(h, qi, *_):
        return (0, 0, 0)

    # ---- dq / dgate / dbias kernel: grid (H, QT)
    in_specs = [
        pl.BlockSpec((1, B, q_tile, hd), q_map, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, B, Sp, hd), full_map, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, B, Sp, hd), full_map, memory_space=pltpu.VMEM),  # v
    ]
    args = [qh, kh, vh]
    scratch = []
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, q_tile, Sp), lambda h, qi, *_: (h, qi, 0),
                         memory_space=pltpu.VMEM),  # bias (storage dtype)
            pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
        scratch = [pltpu.VMEM((q_tile, Sp), jnp.float32)]  # dbias accumulator
    in_specs += [
        pl.BlockSpec((B, 1, Sp), mask_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),  # dl
        pl.BlockSpec((1, B, q_tile, hd), q_map, memory_space=pltpu.VMEM),  # dO
    ]
    args += [addmask, lse, delta, do]

    out_specs = [
        pl.BlockSpec((1, B, q_tile, hd), q_map, memory_space=pltpu.VMEM),  # dq
    ]
    out_shape = [jax.ShapeDtypeStruct((H, B, Tp, hd), qh.dtype)]
    if has_bias:
        out_specs += [
            pl.BlockSpec((1, B, q_tile, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, Sp), lambda h, qi, *_: (h, qi, 0),
                         memory_space=pltpu.VMEM),  # dbias
        ]
        out_shape += [
            jax.ShapeDtypeStruct((H, B, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, Tp, Sp), jnp.float32),
        ]

    dq_outs = pl.pallas_call(
        functools.partial(
            _dq_kernel if has_bias else _dq_kernel_nobias,
            scale=scale, rate=rate, H=H, B=B, has_bias=has_bias,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Tp // q_tile),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * H * B * Tp * Sp * hd,
            bytes_accessed=(qh.size + kh.size + vh.size + do.size) * 2,
            transcendentals=H * B * Tp * Sp,
        ),
        interpret=interpret,
    )(seed, *args)
    if has_bias:
        dq, dgate, dbias = dq_outs
    else:
        (dq,), dgate, dbias = dq_outs, None, None

    # ---- dk/dv kernel: grid (H, KT), full q rows per head resident.
    def kt_map(h, ki, *_):
        return (h, 0, ki, 0)

    in_specs2 = [
        pl.BlockSpec((1, B, Tp, hd), full_map, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, B, k_tile, hd), kt_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, k_tile, hd), kt_map, memory_space=pltpu.VMEM),
    ]
    args2 = [qh, kh, vh]
    if has_bias:
        in_specs2 += [
            pl.BlockSpec((1, Tp, k_tile), lambda h, ki, *_: (h, 0, ki),
                         memory_space=pltpu.VMEM),  # bias columns
            pl.BlockSpec((1, B, Tp, 1), full_map, memory_space=pltpu.VMEM),
        ]
        args2 += [biasp, gatep]
    in_specs2 += [
        # full-S addmask: the kernel slices its k-tile columns; kept whole so
        # the dropout RNG regeneration knows the padded S
        pl.BlockSpec((B, 1, Sp), mask_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Tp, 1), full_map, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, B, Tp, 1), full_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, Tp, hd), full_map, memory_space=pltpu.VMEM),  # dO
    ]
    args2 += [addmask, lse, delta, do]

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel if has_bias else _dkv_kernel_nobias,
            scale=scale, rate=rate, q_tile=q_tile, k_tile=k_tile,
            H=H, B=B, has_bias=has_bias,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Sp // k_tile),
            in_specs=in_specs2,
            out_specs=[
                pl.BlockSpec((1, B, k_tile, hd), kt_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, k_tile, hd), kt_map,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((k_tile, hd), jnp.float32),  # dk accumulator
                pltpu.VMEM((k_tile, hd), jnp.float32),  # dv accumulator
                pltpu.VMEM((q_tile, Sp), jnp.uint32),  # dropout bit stage
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, B, Sp, hd), kh.dtype),
            jax.ShapeDtypeStruct((H, B, Sp, hd), vh.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * H * B * Tp * Sp * hd,
            bytes_accessed=(qh.size + kh.size + vh.size + do.size) * 2,
            transcendentals=H * B * Tp * Sp,
        ),
        interpret=interpret,
    )(seed, *args2)
    return dq, dk, dv, dbias, dgate


# ---------------------------------------------------------------------------
# custom-vjp core over padded (H, B, Tp, hd) arrays
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core(rate, q_tile, interpret, qh, kh, vh, biasp, gatep, addmask, seed):
    out, _ = _run_forward(
        qh, kh, vh, biasp, gatep, addmask, seed,
        scale=qh.shape[-1] ** -0.5, rate=rate, q_tile=q_tile,
        interpret=interpret,
    )
    return out


def _core_fwd(rate, q_tile, interpret, qh, kh, vh, biasp, gatep, addmask,
              seed):
    out, lse = _run_forward(
        qh, kh, vh, biasp, gatep, addmask, seed,
        scale=qh.shape[-1] ** -0.5, rate=rate, q_tile=q_tile,
        interpret=interpret,
    )
    return out, (qh, kh, vh, biasp, gatep, addmask, seed, out, lse)


def _core_bwd(rate, q_tile, interpret, res, g):
    qh, kh, vh, biasp, gatep, addmask, seed, out, lse = res
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )
    dq, dk, dv, dbias, dgate = _run_backward(
        qh, kh, vh, biasp, gatep, addmask, seed, lse, delta,
        g.astype(qh.dtype),
        scale=qh.shape[-1] ** -0.5, rate=rate, q_tile=q_tile,
        interpret=interpret,
    )
    if dbias is not None:
        dbias = dbias.astype(biasp.dtype)
    return dq, dk, dv, dbias, dgate, None, None


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def fused_attention(
    q: jax.Array,  # (B, T, H, hd) unscaled
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,  # (H, T, S) shared rel-pos bias
    gate: Optional[jax.Array] = None,  # (B, H, T) per-query gate
    key_padding_mask: Optional[jax.Array] = None,  # (B, S) True = pad
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,  # scalar int32
    q_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with factored gated rel-pos bias and in-kernel dropout.

    Differentiable in q/k/v/bias/gate; the (B, H, T, S) gated bias and the
    attention probabilities never exist in HBM in either direction. The bias
    is streamed in q's dtype (bf16 under mixed precision): both passes read
    the same value, so the recompute is exact; dbias is returned in the
    original bias dtype.
    """
    B, T, H, hd = q.shape
    S = k.shape[1]
    Tp = _round_up(T, q_tile)
    Sp = _round_up(S, 128)

    def pad_t(x, to, axis):
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, to - x.shape[axis])
        return jnp.pad(x, cfg) if to > x.shape[axis] else x

    # (H, B, Tp, hd): head-major so per-head bias tiles and K/V streams are
    # loaded once per (h, tile) and reused for every batch row
    qh = pad_t(q, Tp, 1).transpose(2, 0, 1, 3)
    kh = pad_t(k, Sp, 1).transpose(2, 0, 1, 3)
    vh = pad_t(v, Sp, 1).transpose(2, 0, 1, 3)

    if key_padding_mask is None:
        addmask = jnp.zeros((B, Sp), jnp.float32)
    else:
        addmask = jnp.where(pad_t(key_padding_mask, Sp, 1), NEG_INF, 0.0)
    if Sp > S:
        addmask = addmask.at[:, S:].set(NEG_INF)
    addmask = addmask.astype(jnp.float32)[:, None, :]  # (B, 1, Sp)

    biasp = gatep = None
    if bias is not None:
        biasp = pad_t(pad_t(bias, Tp, 1), Sp, 2).astype(q.dtype)
        if gate is None:
            gate = jnp.ones((B, H, T), jnp.float32)
        gatep = (
            pad_t(gate, Tp, 2).astype(jnp.float32).transpose(1, 0, 2)[..., None]
        )  # (H, B, Tp, 1)

    if dropout_seed is None or dropout_rate <= 0.0:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    out = _core(
        float(dropout_rate), q_tile, interpret,
        qh, kh, vh, biasp, gatep, addmask, seed,
    )
    out = out.transpose(1, 2, 0, 3)  # (B, Tp, H, hd)
    return out[:, :T]
