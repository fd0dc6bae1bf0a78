"""Fused attention Pallas kernels with WavLM gated relative position bias.

The hot op of the whole family (SURVEY.md §3.1): the reference runs
`F.multi_head_attention_forward` with the gated bias folded into attn_mask
(/root/reference/WavLM/modules.py:540-563), materializing (B*H, T, S) logits
in device memory. Here neither forward NOR backward ever materializes a
(B, H, T, S) tensor in HBM.

This op is VPU-bound on TPU (hd=64 gives ~256 MXU flops but ~10-20 VPU ops
per logit element, and the VPU is ~2 orders of magnitude slower than the
MXU), so the design minimizes full-(T, S) elementwise passes:
  * q is pre-scaled outside the kernel (no `* scale` pass on (T, S));
  * softmax normalization is deferred to the (T, hd) output (flash style);
  * the additive key-padding mask pass is compiled out entirely when there
    is no padding and S is already lane-aligned (the pretrain bucket shapes
    are chosen frame-128-aligned for exactly this reason);
  * dropout draws one u32 PRNG word per logit from the in-kernel hardware
    PRNG (threshold quantization 1/2^32); a 16-bit two-logits-per-word
    draw was tried and rejected — pltpu.bitcast u32->u16 comparisons hit
    Mosaic relayout bugs on this toolchain;
  * ONE merged backward kernel produces dq/dk/dv/dgate/dbias from a single
    probability recompute (the round-2 design ran two kernels, each
    recomputing exp and regenerating dropout bits).

Compile-time / VMEM discipline (16 MB scoped-VMEM limit, remote AOT
compiles): batch and head are GRID axes — kernel bodies contain no Python
batch loop — and the (Tp, Sp) bias input / dbias output live in HBM
(`pl.ANY`). When the whole per-head (Tp, Sp) bias fits in scoped VMEM it is
made RESIDENT: DMA'd once per head (batch is the inner grid axis; scratch
persists across programs) and re-read from VMEM by batch rows 1..B-1 —
r5 change that removes the B-fold redundant HBM bias reads of the stripe
scheme (~99 MB/layer each way at Base bench shapes). Longer sequences fall
back to the original stripe-by-stripe double-buffered DMA.

Layouts (r5): the DEFAULT path keeps q/k/v/out and their gradients in the
NATURAL (B, Tp, H*hd) projection-matmul layout — grid (H/hpp, B) with each
program owning a 128-lane column stripe covering hpp = 128/hd heads,
deinterleaved with static lane slices inside VMEM — so XLA inserts no
relayout copies on either side of the custom calls (the head-major
transposes cost ~12.5 ms/step of %copy at Base bench shapes, running at
~15 GB/s). The head-major (H, B, Tp, hd) path, grid (H, B) batch
innermost, remains the fallback for head dims that don't pack into 128
lanes and for sequences long enough to need stripe-DMA'd bias. Both paths
draw identical dropout streams (per-(batch*head, stripe) seeding), proven
bit-exact on silicon by
tests_tpu/test_flash_tpu.py::test_packed_matches_headmajor_layout_under_dropout.
In both layouts the per-head bias is reused across the batch axis, K/V are
DMA'd once per program, and dbias accumulates across batch programs in an
fp32 VMEM scratch written out once per head by the last batch program.
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
    """(shape) fp32 keep/(1-rate) dropout multiplier from the seeded PRNG.

    Bit-identical between forward and backward by construction (same seed →
    same u32 stream)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = min(int(rate * 4294967296.0), 4294967295)
    return jnp.where(
        bits >= jnp.uint32(threshold), 1.0 / (1.0 - rate), 0.0
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref, mask_ref,
                amask_hbm, o_ref, lse_ref, bias_buf, sem_in,
                amask_buf, sem_am,
                *, rate: float, q_tile: int, H: int,
                has_bias: bool, has_mask: bool, has_amask: bool,
                resident: bool):
    h = pl.program_id(0)
    b = pl.program_id(1)
    Tp = q_ref.shape[2]
    NQ = Tp // q_tile

    def bias_dma(slot, qi):
        return pltpu.make_async_copy(
            bias_hbm.at[h, pl.ds(qi * q_tile, q_tile), :],
            bias_buf.at[slot],
            sem_in.at[slot],
        )

    def amask_dma(slot, qi):
        # (Tp, Sp) additive streaming/chunked mask, shared across (h, b):
        # streamed stripe-by-stripe exactly like the bias (reference
        # streaming_mask, wavlm.py:698,730)
        return pltpu.make_async_copy(
            amask_hbm.at[pl.ds(qi * q_tile, q_tile), :],
            amask_buf.at[slot],
            sem_am.at[slot],
        )

    if resident:
        # whole-head residency: the per-head (Tp, Sp) bias is DMA'd into
        # VMEM ONCE (batch is the inner grid axis; scratch persists across
        # programs), so batch rows 1..B-1 re-read it from VMEM instead of
        # HBM — at Base bench shapes this cuts the bias read traffic per
        # layer from B*H*Tp*Sp to H*Tp*Sp (~99 MB/layer saved each way)
        if has_bias:
            @pl.when(b == 0)
            def _():
                cp = pltpu.make_async_copy(bias_hbm.at[h], bias_buf, sem_in)
                cp.start()
                cp.wait()
        if has_amask:
            @pl.when((h == 0) & (b == 0))
            def _():
                cp = pltpu.make_async_copy(amask_hbm, amask_buf, sem_am)
                cp.start()
                cp.wait()
    else:
        if has_bias:
            bias_dma(0, 0).start()
        if has_amask:
            amask_dma(0, 0).start()

    k = k_ref[0, 0]  # (Sp, hd)
    v = v_ref[0, 0]

    for qi in range(NQ):
        sl = pl.ds(qi * q_tile, q_tile)
        q = q_ref[0, 0, sl, :]  # (TQ, hd), pre-scaled
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, Sp)
        if has_bias:
            if resident:
                bias_blk = bias_buf[sl, :]
            else:
                if qi + 1 < NQ:
                    bias_dma((qi + 1) % 2, qi + 1).start()
                bias_dma(qi % 2, qi).wait()
                bias_blk = bias_buf[qi % 2]
            gate = gate_ref[0, 0, sl, :].astype(jnp.float32)  # (TQ, 1)
            s = s + gate * bias_blk.astype(jnp.float32)
        if has_amask:
            if resident:
                amask_blk = amask_buf[sl, :]
            else:
                if qi + 1 < NQ:
                    amask_dma((qi + 1) % 2, qi + 1).start()
                amask_dma(qi % 2, qi).wait()
                amask_blk = amask_buf[qi % 2]
            s = s + amask_blk.astype(jnp.float32)  # (TQ, Sp)
        if has_mask:
            s = s + mask_ref[0].astype(jnp.float32)  # (1, Sp) broadcasts
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
            p = p * _keep_scale(p.shape, rate)
        # deferred normalization: divide the (TQ, hd) output, not the
        # (TQ, Sp) probabilities — one fewer full-stripe VPU pass
        acc = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, 0, sl, :] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, 0, sl, 0] = (m + jnp.log(l))[:, 0]


def _fwd_dispatch(seed_ref, q_ref, k_ref, v_ref, *rest,
                  rate, q_tile, H, has_bias, has_mask, has_amask, resident):
    """Unpack the optional-arg layout (pallas passes inputs/outputs/scratch
    positionally) and call the explicit-signature kernel body."""
    i = 0
    bias_hbm = gate_ref = None
    if has_bias:
        bias_hbm, gate_ref = rest[i], rest[i + 1]
        i += 2
    mask_ref = rest[i]
    amask_hbm = rest[i + 1]
    o_ref, lse_ref = rest[i + 2], rest[i + 3]
    scratch = list(rest[i + 4:])
    bias_buf = sem_in = amask_buf = sem_am = None
    if has_bias:
        bias_buf, sem_in = scratch.pop(0), scratch.pop(0)
    if has_amask:
        amask_buf, sem_am = scratch.pop(0), scratch.pop(0)
    _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref, mask_ref,
                amask_hbm, o_ref, lse_ref, bias_buf, sem_in,
                amask_buf, sem_am,
                rate=rate, q_tile=q_tile, H=H, has_bias=has_bias,
                has_mask=has_mask, has_amask=has_amask, resident=resident)


def _run_forward(qh, kh, vh, biasp, gatep, addmask, amaskp, seed, *,
                 rate, q_tile, interpret):
    H, B, Tp, hd = qh.shape
    Sp = kh.shape[2]
    has_bias = biasp is not None
    has_mask = addmask is not None
    has_amask = amaskp is not None
    resident = _choose_resident(
        Tp, Sp, hd, q_tile, qh.dtype.itemsize, direction="fwd",
        has_bias=has_bias, has_amask=has_amask, interpret=interpret,
    )

    def hb_map(h, b, *_):
        return (h, b, 0, 0)

    def mask_map(h, b, *_):
        return (b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),
    ]
    args = [qh, kh, vh]
    scratch = []
    if has_bias:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # bias stays in HBM
            pl.BlockSpec((1, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
        scratch = [
            pltpu.VMEM((Tp, Sp) if resident else (2, q_tile, Sp),
                       biasp.dtype),
            pltpu.SemaphoreType.DMA if resident
            else pltpu.SemaphoreType.DMA((2,)),
        ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, Sp), mask_map, memory_space=pltpu.VMEM)
        )
        args.append(addmask)
    else:
        # kernel signature keeps the mask slot; pass a 1-element dummy
        in_specs.append(
            pl.BlockSpec((1, 1, 128), lambda h, b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((1, 1, 128), jnp.float32))
    # (Tp, Sp) streaming/chunked mask stays in HBM; dummy when absent
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if has_amask:
        args.append(amaskp)
        scratch += [
            pltpu.VMEM((Tp, Sp) if resident else (2, q_tile, Sp),
                       amaskp.dtype),
            pltpu.SemaphoreType.DMA if resident
            else pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        args.append(jnp.zeros((1, 128), jnp.float32))

    kernel = functools.partial(
        _fwd_dispatch,
        rate=rate, q_tile=q_tile, H=H, has_bias=has_bias, has_mask=has_mask,
        has_amask=has_amask, resident=resident,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, B),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
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
# backward: one merged kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref, mask_ref,
                amask_hbm, lse_ref, out_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dgate_ref, dbias_hbm,
                dk_acc, dv_acc, dbias_acc, bias_buf, dbias_stage,
                sem_in, sem_out, amask_buf, sem_am,
                *, rate: float, q_tile: int, H: int, B: int,
                has_bias: bool, has_mask: bool, has_amask: bool,
                resident: bool):
    """One (head, batch-row) program; loops q-stripes of size q_tile.

    Gradient math (dropout folded in): with p = exp(s - lse) (the softmax
    probabilities, recomputed), keep-scale c = keep/(1-rate), out = (p*c) @ v:
      dP    = dO @ v^T
      dS    = p * (c*dP - delta),   delta = rowsum(dO * out)
      dq    = dS @ k                (per stripe; q was pre-scaled)
      dk   += dS^T @ q ;  dv += (p*c)^T @ dO   (across stripes)
      dgate = rowsum(dS * bias) ;  dbias += gate * dS  (across batch)
    """
    h = pl.program_id(0)
    b = pl.program_id(1)
    Tp = q_ref.shape[2]
    NQ = Tp // q_tile

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    if has_bias:
        @pl.when(b == 0)
        def _():
            dbias_acc[...] = jnp.zeros_like(dbias_acc)

    def bias_dma(slot, qi):
        return pltpu.make_async_copy(
            bias_hbm.at[h, pl.ds(qi * q_tile, q_tile), :],
            bias_buf.at[slot],
            sem_in.at[slot],
        )

    def amask_dma(slot, qi):
        return pltpu.make_async_copy(
            amask_hbm.at[pl.ds(qi * q_tile, q_tile), :],
            amask_buf.at[slot],
            sem_am.at[slot],
        )

    if resident:
        # whole-head bias residency (see _fwd_kernel): one HBM read per
        # head instead of per (head, batch)
        if has_bias:
            @pl.when(b == 0)
            def _():
                cp = pltpu.make_async_copy(bias_hbm.at[h], bias_buf, sem_in)
                cp.start()
                cp.wait()
        if has_amask:
            @pl.when((h == 0) & (b == 0))
            def _():
                cp = pltpu.make_async_copy(amask_hbm, amask_buf, sem_am)
                cp.start()
                cp.wait()
    else:
        if has_bias:
            bias_dma(0, 0).start()
        if has_amask:
            amask_dma(0, 0).start()

    k = k_ref[0, 0]  # (Sp, hd)
    v = v_ref[0, 0]

    for qi in range(NQ):
        sl = pl.ds(qi * q_tile, q_tile)
        q = q_ref[0, 0, sl, :]  # (TQ, hd), pre-scaled
        do = do_ref[0, 0, sl, :]
        lse = lse_ref[0, 0, sl, :]  # (TQ, 1)
        # delta = rowsum(dO * out) computed IN-KERNEL from the saved output
        # block: an XLA-side delta is a full pass over (H,B,T,hd) whose
        # (H,B,T,1) result XLA lays out with lane-dim 1 (T(1,128)), costing
        # ~0.7 ms of relayout copies per step at Base bench shapes
        o_sl = out_ref[0, 0, sl, :]
        delta = jnp.sum(
            do.astype(jnp.float32) * o_sl.astype(jnp.float32), axis=-1,
            keepdims=True,
        )

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            if resident:
                bias = bias_buf[sl, :].astype(jnp.float32)  # (TQ, Sp)
            else:
                if qi + 1 < NQ:
                    bias_dma((qi + 1) % 2, qi + 1).start()
                bias_dma(qi % 2, qi).wait()
                bias = bias_buf[qi % 2].astype(jnp.float32)
            gate = gate_ref[0, 0, sl, :].astype(jnp.float32)  # (TQ, 1)
            s = s + gate * bias
        if has_amask:
            if resident:
                s = s + amask_buf[sl, :].astype(jnp.float32)
            else:
                if qi + 1 < NQ:
                    amask_dma((qi + 1) % 2, qi + 1).start()
                amask_dma(qi % 2, qi).wait()
                s = s + amask_buf[qi % 2].astype(jnp.float32)
        if has_mask:
            s = s + mask_ref[0].astype(jnp.float32)
        p = jnp.exp(s - lse)  # (TQ, Sp) — softmax probs, recomputed

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, Sp)
        if rate > 0.0:
            # identical bit stream to the forward's draw
            pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
            c = _keep_scale(p.shape, rate)
            pc = p * c
            ds = p * (c * dp - delta)
        else:
            pc = p
            ds = p * (dp - delta)

        dq_ref[0, 0, sl, :] = jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dv_acc[...] += jax.lax.dot_general(
            pc.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Sp, hd)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        if has_bias:
            dgate_ref[0, 0, sl, 0] = jnp.sum(ds * bias, axis=-1)
            dbias_acc[sl, :] += gate * ds

            @pl.when(b == B - 1)
            def _():
                slot = qi % 2
                # previous stripe's outbound DMA must have released the slot
                if qi >= 2:
                    pltpu.make_async_copy(
                        dbias_stage.at[slot],
                        dbias_hbm.at[h, pl.ds((qi - 2) * q_tile, q_tile), :],
                        sem_out.at[slot],
                    ).wait()

                dbias_stage[slot] = dbias_acc[sl, :].astype(dbias_stage.dtype)
                pltpu.make_async_copy(
                    dbias_stage.at[slot],
                    dbias_hbm.at[h, sl, :],
                    sem_out.at[slot],
                ).start()

    dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)
    if has_bias:
        @pl.when(b == B - 1)
        def _():
            for qi in range(max(NQ - 2, 0), NQ):
                pltpu.make_async_copy(
                    dbias_stage.at[qi % 2],
                    dbias_hbm.at[h, pl.ds(qi * q_tile, q_tile), :],
                    sem_out.at[qi % 2],
                ).wait()


def _bwd_dispatch(seed_ref, q_ref, k_ref, v_ref, *rest,
                  rate, q_tile, H, B, has_bias, has_mask, has_amask,
                  resident):
    """Positional unpack of the optional-arg layout (mirror of
    _fwd_dispatch) for the merged backward kernel."""
    i = 0
    bias_hbm = gate_ref = None
    if has_bias:
        bias_hbm, gate_ref = rest[i], rest[i + 1]
        i += 2
    mask_ref = rest[i]
    amask_hbm = rest[i + 1]
    lse_ref, out_ref, do_ref = rest[i + 2], rest[i + 3], rest[i + 4]
    i += 5
    dq_ref, dk_ref, dv_ref = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    dgate_ref = dbias_hbm = None
    if has_bias:
        dgate_ref, dbias_hbm = rest[i], rest[i + 1]
        i += 2
    scratch = list(rest[i:])
    dk_acc, dv_acc = scratch.pop(0), scratch.pop(0)
    dbias_acc = bias_buf = dbias_stage = sem_in = sem_out = None
    if has_bias:
        dbias_acc, bias_buf, dbias_stage, sem_in, sem_out = (
            scratch.pop(0), scratch.pop(0), scratch.pop(0),
            scratch.pop(0), scratch.pop(0),
        )
    amask_buf = sem_am = None
    if has_amask:
        amask_buf, sem_am = scratch.pop(0), scratch.pop(0)
    _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref, mask_ref,
                amask_hbm, lse_ref, out_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dgate_ref, dbias_hbm,
                dk_acc, dv_acc, dbias_acc, bias_buf, dbias_stage,
                sem_in, sem_out, amask_buf, sem_am,
                rate=rate, q_tile=q_tile, H=H, B=B,
                has_bias=has_bias, has_mask=has_mask, has_amask=has_amask,
                resident=resident)


def _vmem_est(Tp, Sp, hd, q_tile, itemsize, *, direction: str,
              has_bias: bool, has_amask: bool, resident: bool) -> int:
    """Scoped-VMEM estimate for one kernel launch (16 MB limit)."""
    if direction == "fwd":
        est = (
            3 * Tp * hd * itemsize * 2    # q/k/v blocks (double-buffered)
            + Tp * hd * itemsize * 2      # out block
            + Tp * 4 * 2                  # lse block
            + 3 * q_tile * Sp * 4         # stripe temporaries (s/p/...)
        )
        if has_bias:
            est += (Tp * Sp if resident else 2 * q_tile * Sp) * itemsize
    else:
        est = (
            # q/k/v/dO + the saved-output block (the in-kernel delta reads
            # it), all double-buffered (round-4 advisor finding #2: the old
            # term counted 4 blocks after delta's replacement by out)
            5 * Tp * hd * itemsize * 2
            + 3 * Tp * hd * itemsize * 2  # dq/dk/dv out blocks
            + 2 * Sp * hd * 4             # dk/dv fp32 accumulators
            + 5 * q_tile * Sp * 4         # stripe temporaries (p/dp/ds/...)
        )
        if has_bias:
            est += (
                Tp * Sp * 4               # dbias fp32 accumulator
                + 2 * q_tile * Sp * itemsize  # dbias out staging
                + (Tp * Sp if resident else 2 * q_tile * Sp) * itemsize
            )
    if has_amask:
        est += (Tp * Sp if resident else 2 * q_tile * Sp) * 4
    return est


def _choose_resident(Tp, Sp, hd, q_tile, itemsize, *, direction: str,
                     has_bias: bool, has_amask: bool,
                     interpret: bool) -> bool:
    """Keep the whole per-head (Tp, Sp) bias (and streaming mask) VMEM-
    resident when it fits — one HBM read per head instead of per
    (head, batch) — else stream stripes. Raises an actionable error when
    not even the stripe mode fits (round-2 advisor finding #2)."""
    limit = 15 * 1024 * 1024
    kw = dict(direction=direction, has_bias=has_bias, has_amask=has_amask)
    if _vmem_est(Tp, Sp, hd, q_tile, itemsize, resident=True, **kw) <= limit:
        return True
    est = _vmem_est(Tp, Sp, hd, q_tile, itemsize, resident=False, **kw)
    if est > limit and not interpret:
        raise ValueError(
            f"fused_attention {direction} needs ~{est/2**20:.1f} MiB VMEM "
            f"(scoped limit 16 MiB) at T={Tp}, S={Sp}, head_dim={hd}, "
            f"q_tile={q_tile}. Reduce q_tile, shorten the sequence bucket, "
            "or fall back to the XLA path (use_flash_attention=False)."
        )
    return False


def _run_backward(qh, kh, vh, biasp, gatep, addmask, amaskp, seed, lse, out,
                  do, *, rate, q_tile, interpret):
    H, B, Tp, hd = qh.shape
    Sp = kh.shape[2]
    has_bias = biasp is not None
    has_mask = addmask is not None
    has_amask = amaskp is not None
    resident = _choose_resident(
        Tp, Sp, hd, q_tile, qh.dtype.itemsize, direction="bwd",
        has_bias=has_bias, has_amask=has_amask, interpret=interpret,
    )

    def hb_map(h, b, *_):
        return (h, b, 0, 0)

    def mask_map(h, b, *_):
        return (b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),  # v
    ]
    args = [qh, kh, vh]
    if has_bias:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # bias stays in HBM
            pl.BlockSpec((1, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, Sp), mask_map, memory_space=pltpu.VMEM)
        )
        args.append(addmask)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, 128), lambda h, b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((1, 1, 128), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # (Tp, Sp) amask
    args.append(
        amaskp if has_amask else jnp.zeros((1, 128), jnp.float32)
    )
    in_specs += [
        pl.BlockSpec((1, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),  # out
        pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),  # dO
    ]
    args += [lse, out, do]

    out_specs = [
        pl.BlockSpec((1, 1, Tp, hd), hb_map, memory_space=pltpu.VMEM),  # dq
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),  # dk
        pl.BlockSpec((1, 1, Sp, hd), hb_map, memory_space=pltpu.VMEM),  # dv
    ]
    out_shape = [
        jax.ShapeDtypeStruct((H, B, Tp, hd), qh.dtype),
        jax.ShapeDtypeStruct((H, B, Sp, hd), kh.dtype),
        jax.ShapeDtypeStruct((H, B, Sp, hd), vh.dtype),
    ]
    scratch = [
        pltpu.VMEM((Sp, hd), jnp.float32),  # dk accumulator
        pltpu.VMEM((Sp, hd), jnp.float32),  # dv accumulator
    ]
    if has_bias:
        out_specs += [
            pl.BlockSpec((1, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dbias written via DMA
        ]
        out_shape += [
            jax.ShapeDtypeStruct((H, B, Tp, 1), jnp.float32),  # dgate
            jax.ShapeDtypeStruct((H, Tp, Sp), biasp.dtype),  # dbias
        ]
        scratch += [
            pltpu.VMEM((Tp, Sp), jnp.float32),  # dbias accumulator
            pltpu.VMEM((Tp, Sp) if resident else (2, q_tile, Sp),
                       biasp.dtype),  # bias (resident or stripe buffers)
            pltpu.VMEM((2, q_tile, Sp), biasp.dtype),  # dbias out staging
            pltpu.SemaphoreType.DMA if resident
            else pltpu.SemaphoreType.DMA((2,)),  # bias in
            pltpu.SemaphoreType.DMA((2,)),  # dbias out
        ]
    if has_amask:
        scratch += [
            pltpu.VMEM((Tp, Sp) if resident else (2, q_tile, Sp),
                       amaskp.dtype),
            pltpu.SemaphoreType.DMA if resident
            else pltpu.SemaphoreType.DMA((2,)),
        ]

    outs = pl.pallas_call(
        functools.partial(
            _bwd_dispatch,
            rate=rate, q_tile=q_tile, H=H, B=B,
            has_bias=has_bias, has_mask=has_mask, has_amask=has_amask,
            resident=resident,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, B),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * H * B * Tp * Sp * hd,
            bytes_accessed=(qh.size + kh.size + vh.size + do.size) * 4,
            transcendentals=H * B * Tp * Sp,
        ),
        interpret=interpret,
    )(seed, *args)
    if has_bias:
        dq, dk, dv, dgate, dbias = outs
    else:
        (dq, dk, dv), dgate, dbias = outs, None, None
    return dq, dk, dv, dbias, dgate


# ---------------------------------------------------------------------------
# custom-vjp core over padded (H, B, Tp, hd) arrays
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core(rate, q_tile, interpret, qh, kh, vh, biasp, gatep, addmask,
          amaskp, seed):
    out, _ = _run_forward(
        qh, kh, vh, biasp, gatep, addmask, amaskp, seed,
        rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return out


def _core_fwd(rate, q_tile, interpret, qh, kh, vh, biasp, gatep, addmask,
              amaskp, seed):
    out, lse = _run_forward(
        qh, kh, vh, biasp, gatep, addmask, amaskp, seed,
        rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return out, (qh, kh, vh, biasp, gatep, addmask, amaskp, seed, out, lse)


def _core_bwd(rate, q_tile, interpret, res, g):
    qh, kh, vh, biasp, gatep, addmask, amaskp, seed, out, lse = res
    dq, dk, dv, dbias, dgate = _run_backward(
        qh, kh, vh, biasp, gatep, addmask, amaskp, seed, lse, out,
        g.astype(qh.dtype),
        rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return dq, dk, dv, dbias, dgate, None, None, None


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# packed-layout kernels: qkv/out in the NATURAL (B, Tp, H*hd) matmul layout
# ---------------------------------------------------------------------------
#
# The head-major (H, B, Tp, hd) layout above forces XLA to materialize
# relayout copies between the qkv projections and the custom calls (the
# projection matmuls write (B*T, H*hd) row-major; the transpose to
# head-major showed up as ~12.5 ms/step of %copy at Base bench shapes, the
# copies running at ~15 GB/s because they are full layout permutations).
# Here each program owns a 128-lane column stripe covering hpp = 128/hd
# heads of the UNRESHAPED (B, Tp, H*hd) tensors — grid (H/hpp, B) — and
# deinterleaves the heads with static lane slices inside VMEM (vreg
# relayouts, ~free at these sizes). q/k/v/out and dq/dk/dv then connect to
# the projection matmuls with no HBM relayout in either direction.
# Per-head bias/gate/lse/dgate keep their head-major shapes (small or
# HBM-resident). The packed path requires whole-head bias residency in
# VMEM (stripe-DMA bookkeeping per subhead is not worth carrying twice);
# non-resident shapes fall back to the head-major path.


def _fwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref,
                       mask_ref, amask_hbm, o_ref, lse_ref, bias_buf, sem_in,
                       amask_buf, sem_am,
                       *, rate: float, q_tile: int, H: int, hpp: int, hd: int,
                       has_bias: bool, has_mask: bool, has_amask: bool):
    g = pl.program_id(0)
    b = pl.program_id(1)
    G = pl.num_programs(0)
    Tp = q_ref.shape[1]
    NQ = Tp // q_tile

    if has_bias:
        # double-buffered whole-group bias residency: group g reads slot
        # g%2; its first batch program waits for its own slot (started by
        # group g-1, or by itself when g == 0) and then prefetches group
        # g+1's bias into the other slot — the load overlaps all of group
        # g's compute instead of blocking each group's first program
        # (~24 us x G x 2 directions per layer, the dominant cost at
        # small batch)
        def group_dma(slot, grp):
            return [
                pltpu.make_async_copy(
                    bias_hbm.at[grp * hpp + hh], bias_buf.at[slot, hh],
                    sem_in.at[slot, hh],
                )
                for hh in range(hpp)
            ]

        @pl.when(b == 0)
        def _():
            @pl.when(g == 0)
            def _():
                for cp in group_dma(0, 0):
                    cp.start()
            for cp in group_dma(g % 2, g):
                cp.wait()
            @pl.when(g + 1 < G)
            def _():
                for cp in group_dma((g + 1) % 2, g + 1):
                    cp.start()
        bias_res = bias_buf.at[g % 2]
    if has_amask:
        @pl.when((g == 0) & (b == 0))
        def _():
            cp = pltpu.make_async_copy(amask_hbm, amask_buf, sem_am)
            cp.start()
            cp.wait()

    kblk = k_ref[0]  # (Sp, hpp*hd)
    vblk = v_ref[0]

    for qi in range(NQ):
        sl = pl.ds(qi * q_tile, q_tile)
        qblk = q_ref[0, sl, :]  # (TQ, hpp*hd), pre-scaled
        outs = []
        lses = []
        for hh in range(hpp):
            hsl = slice(hh * hd, (hh + 1) * hd)
            q = qblk[:, hsl]
            s = jax.lax.dot_general(
                q, kblk[:, hsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TQ, Sp)
            if has_bias:
                gate = gate_ref[hh, 0, sl, :].astype(jnp.float32)  # (TQ, 1)
                s = s + gate * bias_res[hh, sl, :].astype(jnp.float32)
            if has_amask:
                s = s + amask_buf[sl, :].astype(jnp.float32)
            if has_mask:
                s = s + mask_ref[0].astype(jnp.float32)  # (1, Sp)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if rate > 0.0:
                # identical per-(batch*head, stripe) stream to the
                # head-major kernel — packed/head-major parity holds under
                # dropout as long as q_tile matches
                pltpu.prng_seed(
                    _tile_seed(seed_ref[0], b * H + g * hpp + hh, qi)
                )
                p = p * _keep_scale(p.shape, rate)
            acc = jnp.dot(
                p.astype(vblk.dtype), vblk[:, hsl],
                preferred_element_type=jnp.float32,
            )
            outs.append((acc / l).astype(o_ref.dtype))
            lses.append(m + jnp.log(l))
        o_ref[0, sl, :] = jnp.concatenate(outs, axis=1)
        for hh in range(hpp):
            lse_ref[hh, 0, sl, 0] = lses[hh][:, 0]


def _fwd_dispatch_packed(seed_ref, q_ref, k_ref, v_ref, *rest,
                         rate, q_tile, H, hpp, hd,
                         has_bias, has_mask, has_amask):
    i = 0
    bias_hbm = gate_ref = None
    if has_bias:
        bias_hbm, gate_ref = rest[i], rest[i + 1]
        i += 2
    mask_ref = rest[i]
    amask_hbm = rest[i + 1]
    o_ref, lse_ref = rest[i + 2], rest[i + 3]
    scratch = list(rest[i + 4:])
    bias_buf = sem_in = amask_buf = sem_am = None
    if has_bias:
        bias_buf, sem_in = scratch.pop(0), scratch.pop(0)
    if has_amask:
        amask_buf, sem_am = scratch.pop(0), scratch.pop(0)
    _fwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref,
                       mask_ref, amask_hbm, o_ref, lse_ref, bias_buf, sem_in,
                       amask_buf, sem_am,
                       rate=rate, q_tile=q_tile, H=H, hpp=hpp, hd=hd,
                       has_bias=has_bias, has_mask=has_mask,
                       has_amask=has_amask)


def _run_forward_packed(qp, kp, vp, biasp, gatep, addmask, amaskp, seed, *,
                        H, rate, q_tile, interpret):
    B, Tp, Dt = qp.shape
    Sp = kp.shape[1]
    hd = Dt // H
    hpp = 128 // hd
    G = H // hpp
    Dblk = hpp * hd
    has_bias = biasp is not None
    has_mask = addmask is not None
    has_amask = amaskp is not None

    def gb_map(g, b, *_):
        return (b, 0, g)

    def hb_map(g, b, *_):
        return (g, b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    scratch = []
    if has_bias:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # (H, Tp, Sp) bias in HBM
            pl.BlockSpec((hpp, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
        scratch = [
            pltpu.VMEM((2, hpp, Tp, Sp), biasp.dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((2, hpp)),
        ]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, Sp), lambda g, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(addmask)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, 128), lambda g, b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((1, 1, 128), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # (Tp, Sp) amask
    if has_amask:
        args.append(amaskp)
        scratch += [
            pltpu.VMEM((Tp, Sp), amaskp.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        args.append(jnp.zeros((1, 128), jnp.float32))

    out, lse = pl.pallas_call(  # noqa: E501  (packed fwd)
        functools.partial(
            _fwd_dispatch_packed,
            rate=rate, q_tile=q_tile, H=H, hpp=hpp, hd=hd,
            has_bias=has_bias, has_mask=has_mask, has_amask=has_amask,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G, B),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((hpp, 1, Tp, 1), hb_map,
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Tp, Dt), qp.dtype),
            jax.ShapeDtypeStruct((H, B, Tp, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * H * B * Tp * Sp * hd,
            bytes_accessed=(qp.size + kp.size + vp.size) * 2
            + B * Tp * Dt * 2,
            transcendentals=H * B * Tp * Sp,
        ),
        interpret=interpret,
    )(seed, *args)
    return out, lse


def _bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref,
                       mask_ref, amask_hbm, lse_ref, out_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dgate_ref, dbias_hbm,
                       dk_acc, dv_acc, dbias_acc, bias_buf, dbias_stage,
                       sem_in, sem_out, amask_buf, sem_am,
                       *, rate: float, q_tile: int, H: int, B: int,
                       hpp: int, hd: int,
                       has_bias: bool, has_mask: bool, has_amask: bool):
    """Packed merged backward: one (head-pair, batch-row) program over the
    natural-layout tensors; same gradient math as _bwd_kernel."""
    g = pl.program_id(0)
    b = pl.program_id(1)
    G = pl.num_programs(0)
    Tp = q_ref.shape[1]
    NQ = Tp // q_tile

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    if has_bias:
        # double-buffered cross-group bias prefetch (see _fwd_kernel_packed)
        def group_dma(slot, grp):
            return [
                pltpu.make_async_copy(
                    bias_hbm.at[grp * hpp + hh], bias_buf.at[slot, hh],
                    sem_in.at[slot, hh],
                )
                for hh in range(hpp)
            ]

        @pl.when(b == 0)
        def _():
            dbias_acc[...] = jnp.zeros_like(dbias_acc)
            @pl.when(g == 0)
            def _():
                for cp in group_dma(0, 0):
                    cp.start()
            for cp in group_dma(g % 2, g):
                cp.wait()
            @pl.when(g + 1 < G)
            def _():
                for cp in group_dma((g + 1) % 2, g + 1):
                    cp.start()
        bias_res = bias_buf.at[g % 2]
    if has_amask:
        @pl.when((g == 0) & (b == 0))
        def _():
            cp = pltpu.make_async_copy(amask_hbm, amask_buf, sem_am)
            cp.start()
            cp.wait()

    kblk = k_ref[0]  # (Sp, hpp*hd)
    vblk = v_ref[0]
    nstage = NQ * hpp  # dbias out-staging slot counter range

    for qi in range(NQ):
        sl = pl.ds(qi * q_tile, q_tile)
        qblk = q_ref[0, sl, :]  # (TQ, hpp*hd), pre-scaled
        doblk = do_ref[0, sl, :]
        oblk = out_ref[0, sl, :]
        dqs = []
        for hh in range(hpp):
            hsl = slice(hh * hd, (hh + 1) * hd)
            h = g * hpp + hh
            q = qblk[:, hsl]
            do = doblk[:, hsl]
            lse = lse_ref[hh, 0, sl, :]  # (TQ, 1)
            delta = jnp.sum(
                do.astype(jnp.float32) * oblk[:, hsl].astype(jnp.float32),
                axis=-1, keepdims=True,
            )
            s = jax.lax.dot_general(
                q, kblk[:, hsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_bias:
                bias = bias_res[hh, sl, :].astype(jnp.float32)  # (TQ, Sp)
                gate = gate_ref[hh, 0, sl, :].astype(jnp.float32)
                s = s + gate * bias
            if has_amask:
                s = s + amask_buf[sl, :].astype(jnp.float32)
            if has_mask:
                s = s + mask_ref[0].astype(jnp.float32)
            p = jnp.exp(s - lse)

            dp = jax.lax.dot_general(
                do, vblk[:, hsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if rate > 0.0:
                pltpu.prng_seed(_tile_seed(seed_ref[0], b * H + h, qi))
                c = _keep_scale(p.shape, rate)
                pc = p * c
                ds = p * (c * dp - delta)
            else:
                pc = p
                ds = p * (dp - delta)

            dqs.append(jax.lax.dot_general(
                ds.astype(q.dtype), kblk[:, hsl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype))
            dv_acc[:, hsl] += jax.lax.dot_general(
                pc.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Sp, hd)
            dk_acc[:, hsl] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            if has_bias:
                dgate_ref[hh, 0, sl, 0] = jnp.sum(ds * bias, axis=-1)
                dbias_acc[hh, sl, :] += gate * ds

                @pl.when(b == B - 1)
                def _():
                    c_ = qi * hpp + hh
                    slot = c_ % 2
                    if c_ >= 2:  # slot reuse: prior outbound DMA must be done
                        pltpu.make_async_copy(
                            dbias_stage.at[slot],
                            dbias_hbm.at[
                                g * hpp + (c_ - 2) % hpp,
                                pl.ds(((c_ - 2) // hpp) * q_tile, q_tile),
                                :,
                            ],
                            sem_out.at[slot],
                        ).wait()
                    dbias_stage[slot] = dbias_acc[hh, sl, :].astype(
                        dbias_stage.dtype)
                    pltpu.make_async_copy(
                        dbias_stage.at[slot],
                        dbias_hbm.at[h, sl, :],
                        sem_out.at[slot],
                    ).start()
        dq_ref[0, sl, :] = jnp.concatenate(dqs, axis=1)

    dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)
    if has_bias:
        @pl.when(b == B - 1)
        def _():
            for c_ in range(max(nstage - 2, 0), nstage):
                pltpu.make_async_copy(
                    dbias_stage.at[c_ % 2],
                    dbias_hbm.at[
                        g * hpp + c_ % hpp,
                        pl.ds((c_ // hpp) * q_tile, q_tile), :,
                    ],
                    sem_out.at[c_ % 2],
                ).wait()


def _bwd_dispatch_packed(seed_ref, q_ref, k_ref, v_ref, *rest,
                         rate, q_tile, H, B, hpp, hd,
                         has_bias, has_mask, has_amask):
    i = 0
    bias_hbm = gate_ref = None
    if has_bias:
        bias_hbm, gate_ref = rest[i], rest[i + 1]
        i += 2
    mask_ref = rest[i]
    amask_hbm = rest[i + 1]
    lse_ref, out_ref, do_ref = rest[i + 2], rest[i + 3], rest[i + 4]
    i += 5
    dq_ref, dk_ref, dv_ref = rest[i], rest[i + 1], rest[i + 2]
    i += 3
    dgate_ref = dbias_hbm = None
    if has_bias:
        dgate_ref, dbias_hbm = rest[i], rest[i + 1]
        i += 2
    scratch = list(rest[i:])
    dk_acc, dv_acc = scratch.pop(0), scratch.pop(0)
    dbias_acc = bias_buf = dbias_stage = sem_in = sem_out = None
    if has_bias:
        dbias_acc, bias_buf, dbias_stage, sem_in, sem_out = (
            scratch.pop(0), scratch.pop(0), scratch.pop(0),
            scratch.pop(0), scratch.pop(0),
        )
    amask_buf = sem_am = None
    if has_amask:
        amask_buf, sem_am = scratch.pop(0), scratch.pop(0)
    _bwd_kernel_packed(seed_ref, q_ref, k_ref, v_ref, bias_hbm, gate_ref,
                       mask_ref, amask_hbm, lse_ref, out_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dgate_ref, dbias_hbm,
                       dk_acc, dv_acc, dbias_acc, bias_buf, dbias_stage,
                       sem_in, sem_out, amask_buf, sem_am,
                       rate=rate, q_tile=q_tile, H=H, B=B, hpp=hpp, hd=hd,
                       has_bias=has_bias, has_mask=has_mask,
                       has_amask=has_amask)


def _run_backward_packed(qp, kp, vp, biasp, gatep, addmask, amaskp, seed,
                         lse, out, do, *, H, rate, q_tile, interpret):
    B, Tp, Dt = qp.shape
    Sp = kp.shape[1]
    hd = Dt // H
    hpp = 128 // hd
    G = H // hpp
    Dblk = hpp * hd
    has_bias = biasp is not None
    has_mask = addmask is not None
    has_amask = amaskp is not None

    def gb_map(g, b, *_):
        return (b, 0, g)

    def hb_map(g, b, *_):
        return (g, b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),  # v
    ]
    args = [qp, kp, vp]
    if has_bias:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # bias stays in HBM
            pl.BlockSpec((hpp, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
        ]
        args += [biasp, gatep]
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, Sp), lambda g, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(addmask)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, 128), lambda g, b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((1, 1, 128), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # (Tp, Sp) amask
    args.append(
        amaskp if has_amask else jnp.zeros((1, 128), jnp.float32)
    )
    in_specs += [
        pl.BlockSpec((hpp, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),  # out
        pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),  # dO
    ]
    args += [lse, out, do]

    out_specs = [
        pl.BlockSpec((1, Tp, Dblk), gb_map, memory_space=pltpu.VMEM),  # dq
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),  # dk
        pl.BlockSpec((1, Sp, Dblk), gb_map, memory_space=pltpu.VMEM),  # dv
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Tp, Dt), qp.dtype),
        jax.ShapeDtypeStruct((B, Sp, Dt), kp.dtype),
        jax.ShapeDtypeStruct((B, Sp, Dt), vp.dtype),
    ]
    scratch = [
        pltpu.VMEM((Sp, Dblk), jnp.float32),  # dk accumulator
        pltpu.VMEM((Sp, Dblk), jnp.float32),  # dv accumulator
    ]
    if has_bias:
        out_specs += [
            pl.BlockSpec((hpp, 1, Tp, 1), hb_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # dbias written via DMA
        ]
        out_shape += [
            jax.ShapeDtypeStruct((H, B, Tp, 1), jnp.float32),  # dgate
            jax.ShapeDtypeStruct((H, Tp, Sp), biasp.dtype),  # dbias
        ]
        scratch += [
            pltpu.VMEM((hpp, Tp, Sp), jnp.float32),  # dbias accumulator
            pltpu.VMEM((2, hpp, Tp, Sp), biasp.dtype),  # dbl-buf bias
            pltpu.VMEM((2, q_tile, Sp), biasp.dtype),  # dbias out staging
            pltpu.SemaphoreType.DMA((2, hpp)),  # bias in
            pltpu.SemaphoreType.DMA((2,)),  # dbias out
        ]
    if has_amask:
        scratch += [
            pltpu.VMEM((Tp, Sp), amaskp.dtype),
            pltpu.SemaphoreType.DMA,
        ]

    outs = pl.pallas_call(
        functools.partial(
            _bwd_dispatch_packed,
            rate=rate, q_tile=q_tile, H=H, B=B, hpp=hpp, hd=hd,
            has_bias=has_bias, has_mask=has_mask, has_amask=has_amask,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G, B),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * H * B * Tp * Sp * hd,
            bytes_accessed=(qp.size + kp.size + vp.size + do.size) * 4,
            transcendentals=H * B * Tp * Sp,
        ),
        # the hpp-head dbias fp32 accumulator + resident bias push the
        # kernel stack past Mosaic's default 16 MB scoped-VMEM budget;
        # raise it (v5e has 128 MB VMEM — the default is a pipelining
        # heuristic, not a hardware bound). _packed_q_tile guards the
        # bwd estimate against _PACKED_BWD_VMEM_LIMIT.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, *args)
    if has_bias:
        dq, dk, dv, dgate, dbias = outs
    else:
        (dq, dk, dv), dgate, dbias = outs, None, None
    return dq, dk, dv, dbias, dgate


_PACKED_BWD_VMEM_LIMIT = 30 * 1024 * 1024


def _vmem_est_packed(Tp, Sp, hd, hpp, q_tile, itemsize, *, direction: str,
                     has_bias: bool, has_amask: bool) -> int:
    """Scoped-VMEM estimate for a packed-layout launch (16 MB limit)."""
    Dblk = hpp * hd
    if direction == "fwd":
        est = (
            (Tp + 2 * Sp) * Dblk * itemsize * 2  # q/k/v blocks (dbuf)
            + Tp * Dblk * itemsize * 2           # out block
            + hpp * Tp * 4 * 4                   # lse + gate blocks
            + 3 * q_tile * Sp * 4                # stripe temporaries
        )
        if has_bias:
            est += 2 * hpp * Tp * Sp * itemsize  # dbl-buffered bias
    else:
        est = (
            (3 * Tp + 2 * Sp) * Dblk * itemsize * 2  # q/out/dO + k/v blocks
            + (Tp + 2 * Sp) * Dblk * itemsize * 2    # dq/dk/dv out blocks
            + 2 * Sp * Dblk * 4                      # dk/dv fp32 accumulators
            + hpp * Tp * 4 * 4                       # lse/gate/dgate blocks
            + 5 * q_tile * Sp * 4                    # stripe temporaries
        )
        if has_bias:
            est += (
                hpp * Tp * Sp * 4                # dbias fp32 accumulator
                + 2 * hpp * Tp * Sp * itemsize   # dbl-buffered bias
                + 2 * q_tile * Sp * itemsize     # dbias out staging
            )
    if has_amask:
        est += Tp * Sp * 4
    return est


def _packed_q_tile(Tp, Sp, hd, hpp, q_tile, itemsize, *, has_bias: bool,
                   has_amask: bool) -> Optional[int]:
    """Largest q_tile <= the requested one for which BOTH packed passes fit
    scoped VMEM (fwd and bwd must draw identical dropout stripes, so they
    share a tile). None = packed mode does not fit; fall back."""
    limits = {"fwd": 15 * 1024 * 1024, "bwd": _PACKED_BWD_VMEM_LIMIT}
    qt = q_tile
    while qt >= min(128, Tp):  # short-bucket shapes run one sub-128 stripe
        if Tp % qt == 0 and all(
            _vmem_est_packed(Tp, Sp, hd, hpp, qt, itemsize, direction=d,
                             has_bias=has_bias, has_amask=has_amask)
            <= limits[d]
            for d in ("fwd", "bwd")
        ):
            return qt
        qt //= 2
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _core_packed(rate, q_tile, interpret, H, qp, kp, vp, biasp, gatep,
                 addmask, amaskp, seed):
    out, _ = _run_forward_packed(
        qp, kp, vp, biasp, gatep, addmask, amaskp, seed,
        H=H, rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return out


def _core_packed_fwd(rate, q_tile, interpret, H, qp, kp, vp, biasp, gatep,
                     addmask, amaskp, seed):
    out, lse = _run_forward_packed(
        qp, kp, vp, biasp, gatep, addmask, amaskp, seed,
        H=H, rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return out, (qp, kp, vp, biasp, gatep, addmask, amaskp, seed, out, lse)


def _core_packed_bwd(rate, q_tile, interpret, H, res, g):
    qp, kp, vp, biasp, gatep, addmask, amaskp, seed, out, lse = res
    dq, dk, dv, dbias, dgate = _run_backward_packed(
        qp, kp, vp, biasp, gatep, addmask, amaskp, seed, lse, out,
        g.astype(qp.dtype),
        H=H, rate=rate, q_tile=q_tile, interpret=interpret,
    )
    return dq, dk, dv, dbias, dgate, None, None, None


_core_packed.defvjp(_core_packed_fwd, _core_packed_bwd)


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
    attn_mask: Optional[jax.Array] = None,  # (T, S) additive streaming/
    # chunked mask, shared across batch+heads (wavlm.py:698,730 analog)
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
    original bias dtype (per-element rounding through the storage dtype —
    the table-gradient reduction outside sums in fp32).
    """
    B, T, H, hd = q.shape
    S = k.shape[1]
    # honor q_tile only when it does not add padding beyond 128-alignment
    # (short eval buckets would otherwise pad T up to the tile)
    while q_tile > 128 and _round_up(T, q_tile) > _round_up(T, 128):
        q_tile //= 2
    q_tile = max(q_tile, 128) if T >= 128 else _round_up(T, 16)
    Tp = _round_up(T, q_tile)
    Sp = _round_up(S, 128)

    def pad_t(x, to, axis):
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, to - x.shape[axis])
        return jnp.pad(x, cfg) if to > x.shape[axis] else x

    # Layout selection. Packed mode keeps q/k/v/out (and their gradients)
    # in the NATURAL (B, T, H*hd) projection-matmul layout — no XLA
    # relayout copies on either side of the custom calls — and requires
    # whole-head bias VMEM residency; head-major (H, B, Tp, hd) is the
    # general fallback (odd head dims, long sequences that need stripe
    # DMA). fwd and bwd share one q_tile in packed mode (identical dropout
    # stripes by construction).
    hpp = 128 // hd if (hd <= 128 and 128 % hd == 0) else 0
    qt_pk = None
    if hpp and H % hpp == 0:
        qt_pk = _packed_q_tile(
            Tp, Sp, hd, hpp, q_tile, q.dtype.itemsize,
            has_bias=bias is not None, has_amask=attn_mask is not None,
        )
    packed = qt_pk is not None

    scale = hd**-0.5
    if packed:
        qh = pad_t(q * jnp.asarray(scale, q.dtype), Tp, 1).reshape(
            B, Tp, H * hd)
        kh = pad_t(k, Sp, 1).reshape(B, Sp, H * hd)
        vh = pad_t(v, Sp, 1).reshape(B, Sp, H * hd)
    else:
        # (H, B, Tp, hd): head-major so the per-head bias is shared across
        # the batch grid axis and K/V blocks are DMA'd once per (h, b).
        # q arrives pre-scaled so no (T, S) scaling pass exists in-kernel.
        qh = pad_t(q * jnp.asarray(scale, q.dtype), Tp, 1).transpose(2, 0, 1, 3)
        kh = pad_t(k, Sp, 1).transpose(2, 0, 1, 3)
        vh = pad_t(v, Sp, 1).transpose(2, 0, 1, 3)

    if key_padding_mask is None and Sp == S:
        addmask = None  # mask pass compiled out
    else:
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

    amaskp = None
    if attn_mask is not None:
        # padded query rows are discarded on return; padded key columns are
        # already NEG_INF'd by addmask when Sp > S, so zero-padding is safe
        amaskp = jax.lax.stop_gradient(
            pad_t(pad_t(attn_mask, Tp, 0), Sp, 1).astype(jnp.float32)
        )

    if dropout_seed is None or dropout_rate <= 0.0:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    if packed:
        out = _core_packed(
            float(dropout_rate), qt_pk, interpret, H,
            qh, kh, vh, biasp, gatep, addmask, amaskp, seed,
        )
        out = out.reshape(B, Tp, H, hd)
    else:
        out = _core(
            float(dropout_rate), q_tile, interpret,
            qh, kh, vh, biasp, gatep, addmask, amaskp, seed,
        )
        out = out.transpose(1, 2, 0, 3)  # (B, Tp, H, hd)
    return out[:, :T]
