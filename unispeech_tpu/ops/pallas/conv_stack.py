"""Fused strided-conv1d + GELU Pallas blocks for the waveform frontend.

Round-4 rewrite of the round-3 `conv_chain` block (which needed XLA-side
phase-split inputs whose relayouts cost more than the fusion saved). Here the
kernel reads the RAW interleaved (B, T, C) rows through `pl.Element`
overlapping windows and deinterleaves IN-KERNEL with a value-level reshape
(2R, C) -> (R, 2C): in row-major VMEM row r of the collapsed view is
[x[2r] ; x[2r+1]], so the even/odd phases are the two LANE HALVES — a cheap
vreg relayout (measured ~0.1 ms per L1-sized pass) instead of the one-hot
selection matmuls (+1.5 ms) or XLA-side phase splits (round 3). A stride-2
ref load would be cheaper still but crashes the Mosaic compiler
(scripts/exp_conv_inkernel.py).

One block computes  y = gelu?( conv_k_s2( gelu_in?(x) ) )  for the frontend's
(k=3, s=2) and (k=2, s=2) 512-channel stages
(reference chain: /root/reference/WavLM/WavLM.py:378-504), so the whole
L1..L6 stack runs as six back-to-back kernels with NO intermediate XLA ops:
storage rows beyond each block's valid length are garbage that no VALID
downstream forward window ever reads (out row i only touches input rows
<= 2 i + k - 1 < t_in_valid), and the backward kernels mask every
garbage row out of their matmul contractions — Element windows past
storage read UNINITIALIZED memory on real silicon (sometimes NaN), and a
NaN row times a zero cotangent still poisons a matmul sum, so both
contraction sides are zeroed by the valid-length row masks. Blocks chain
without slicing; the final valid length is sliced once at the end.

GELU is the erf form evaluated as a degree-8-in-x^2 odd polynomial
(max |err| 1.9e-5 for erf, 1.5e-4 for its derivative — far below bf16
resolution) because Mosaic has no erf lowering; the input is clamped to
[-4, 4] where the asymptote takes over, so no selects are needed on the
value path.

Backward: ONE kernel per block, gridded over disjoint INPUT tiles (so dx
needs no cross-tile overlap-add): each program recomputes the forward rows
whose receptive field touches its input tile (dy/x read through Element
windows with 8-aligned clamped starts chosen so x_start == 2 * dy_start,
which makes the local index algebra uniform across tiles), chains the
gradient through the output gelu, conv transpose (shifted lane-half slices),
and optional input gelu, and accumulates the fp32 weight gradient directly
into a grid-constant output block (masked to each program's OWN output rows
so halo rows are not double-counted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# degree-8 minimax-ish fits on [0, 4] (see module docstring):
#   erf(x/sqrt(2))        ~= x * EC(x^2)          max abs err 1.9e-5
#   gelu'(x) = 0.5 + x*DC(x^2)                    max abs err 1.5e-4
# both clamp to their asymptotes for |x| > 4 (tail err <= 5e-4).
_EC = (
    0.7978798369829468, -0.1329281632415494, 0.019851365933651353,
    -0.002306613008596877, 0.0002060473874672504, -1.3578203070120535e-05,
    6.106341836551969e-07, -1.644168708633473e-08, 1.974271700341295e-10,
)
_DC = (
    0.7978502576382046, -0.2655808761287283, 0.059138551331160055,
    -0.008991662822732652, 0.0009659534590119215, -7.201324920337509e-05,
    3.5106104941003603e-06, -9.964039664251937e-08, 1.2392112474887641e-09,
)


def _poly_s(coefs, s):
    acc = jnp.float32(coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * s + jnp.float32(c)
    return acc


def gelu_poly(x):
    """erf-form GELU via the odd polynomial; fp32 in/out."""
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -4.0, 4.0)
    e = xc * _poly_s(_EC, xc * xc)  # ~erf(x/sqrt2), clamps to +-erf(4/sqrt2)
    return 0.5 * xf * (1.0 + e)


def dgelu_poly(x):
    """d/dx gelu(x) via the odd polynomial; fp32 in/out."""
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -4.0, 4.0)
    return 0.5 + xc * _poly_s(_DC, xc * xc)


def _dot(a, b, trans_b=False):
    dims = (((1,), (1,) if trans_b else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _mask_rows(x, start, limit):
    """Zero rows whose absolute index >= limit (interpret-mode emulation of
    Mosaic's zero-filled Element padding)."""
    idx = start + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(idx < limit, x, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, *rest, k, tile, gelu_in,
                gelu_out, mask_limit, has_affine, valid_out):
    i = 0
    a_ref = b_ref = None
    if has_affine:
        a_ref, b_ref = rest[0], rest[1]
        i = 2
    y_ref = rest[i]
    pre_ref = rest[i + 1] if gelu_out else None
    X = x_ref[0]  # (2*tile + 8|0, C) rows starting at 2*tile*t
    if mask_limit is not None:  # interpret mode only
        X = _mask_rows(X, 2 * tile * pl.program_id(1), mask_limit)
    if has_affine:
        # per-(batch, channel) normalize folded in from the frontend
        # GroupNorm (encoder.py): x_hat = x*a + b applied on the VMEM tile
        # — removes the (B, T, C) normalize read+write pass XLA ran between
        # L0 and this block
        X = (X.astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]).astype(
            X.dtype)
    if gelu_in:
        X = gelu_poly(X).astype(X.dtype)
    w = w_ref[...]
    C = X.shape[1]
    X2 = X.reshape(X.shape[0] // 2, 2 * C)  # row r = [x[2r] ; x[2r+1]]
    xe = X2[:tile, :C]
    xo = X2[:tile, C:]
    acc = _dot(xe, w[0]) + _dot(xo, w[1])
    if k == 3:
        acc = acc + _dot(X2[1 : tile + 1, :C], w[2])
    # zero storage rows at/beyond the valid output length: window rows
    # past the input's storage end are Mosaic Element-pad garbage (can be
    # NaN on silicon), and downstream consumers that touch storage rows
    # elementwise (the layer_norm-mode XLA LN/GELU between fused blocks)
    # must never see non-finite values — 0 * NaN = NaN would poison the
    # LN parameter grads even under a zero cotangent
    li = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    acc = jnp.where(tile * pl.program_id(1) + li < valid_out, acc, 0.0)
    if gelu_out:
        # save the pre-activation: the backward's output-gelu derivative
        # reads it from HBM instead of re-running the k recompute matmuls
        # (bf16 write ~0.25 ms vs ~1.2 ms MXU for the L1 block at B=8)
        pre_ref[0] = acc.astype(pre_ref.dtype)
        y = gelu_poly(acc)
    else:
        y = acc
    y_ref[0] = y.astype(y_ref.dtype)


def _run_fwd(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w,
             affine=None):
    B, Ts, C = x.shape
    nt = pl.cdiv(Ts, 2 * tile)  # R = nt*tile >= Ts/2 >= t_out
    R = nt * tile
    grid = (B, nt)
    if k == 3:
        win = 2 * tile + 8
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(win, (0, 2 * R + 8 - Ts)),
             pl.Element(C)),
            lambda b, t: (b, 2 * tile * t, 0),
        )
    else:  # k == 2: windows are exact, plain blocked spec
        win = 2 * tile
        x_spec = pl.BlockSpec((1, win, C), lambda b, t: (b, t, 0))
    y_spec = pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0))
    y_shape = jax.ShapeDtypeStruct((B, R, C), x.dtype)
    in_specs = [
        x_spec,
        pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0)),
    ]
    args = [x, w]
    if affine is not None:
        # (B, 1, C) carrier: TPU blocks need the last two dims (8,128)-
        # divisible or full — (1, C) blocks of a (B, C) array are neither
        ab_spec = pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0))
        in_specs += [ab_spec, ab_spec]
        args += [affine[0].reshape(B, 1, C), affine[1].reshape(B, 1, C)]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, k=k, tile=tile, gelu_in=gelu_in, gelu_out=gelu_out,
            mask_limit=Ts if interpret else None,
            has_affine=affine is not None,
            valid_out=(valid_in - k) // 2 + 1,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[y_spec, y_spec] if gelu_out else y_spec,
        out_shape=[y_shape, y_shape] if gelu_out else y_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * C * k * C,
            bytes_accessed=2 * B * R * C * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out if gelu_out else (out, None)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, w_ref, dy_ref, *rest, k, tile, gelu_in,
                gelu_out, valid_in, valid_out, mask_x, mask_dy,
                has_affine):
    i = 0
    pre_ref = a_ref = b_ref = None
    if gelu_out:
        pre_ref = rest[i]
        i += 1
    if has_affine:
        a_ref, b_ref = rest[i], rest[i + 1]
        i += 2
    dx_ref, dw_ref = rest[i], rest[i + 1]
    if has_affine:
        da_ref, db_ref = rest[i + 2], rest[i + 3]
    b, t = pl.program_id(0), pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    if has_affine:
        # (1, C) per-batch affine-grad accumulators: same output block for
        # every t of one batch row (sequential revisiting), fresh per b
        @pl.when(t == 0)
        def _():
            da_ref[...] = jnp.zeros_like(da_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

    w = w_ref[...]
    # Window starts (k=3): X0 = max(2 tile t - 16, 0), Y0 = max(tile t - 8, 0)
    # so X0 == 2 Y0 for EVERY tile and the local algebra is uniform:
    #   out local l <-> abs row Y0 + l, taps at x local 2 l + p
    #   own out rows (for dw): l in [8 s0, 8 s0 + tile), s0 = (t > 0)
    #   dx local r <-> abs a + r (a = 2 tile t); a - X0 = 16 s0
    Xw = x_ref[0]
    dyw = dy_ref[0]
    C = Xw.shape[1]
    ywin = dyw.shape[0]
    if k == 3:
        s0 = jnp.where(t > 0, 1, 0)
    else:
        s0 = 0
    x_start = 2 * tile * t - 16 * s0 if k == 3 else 2 * tile * t
    y_start = tile * t - 8 * s0 if k == 3 else tile * t
    if mask_x is not None:  # interpret mode only
        Xw = _mask_rows(Xw, x_start, mask_x)
    if mask_dy is not None:
        dyw = _mask_rows(dyw, y_start, mask_dy)

    # mask rows beyond the VALID input length ONCE on the window:
    # storage/Element-padding regions can hold NaN garbage on real silicon,
    # and NaN * 0 = NaN in a matmul contraction — one NaN garbage row would
    # poison the whole dW (seen as flaky non-finite grads at small T;
    # zeroing the row on BOTH contraction sides is the only safe form —
    # the g-side mask below covers the finite partial-window rows)
    xi = jax.lax.broadcasted_iota(jnp.int32, (Xw.shape[0], 1), 0)
    Xw = jnp.where(x_start + xi < valid_in, Xw, 0)
    Xraw = Xw  # pre-affine rows (the affine grads contract against them)
    if has_affine:
        # invalid rows become b (finite): safe — every contraction they
        # could enter is zeroed on the other side (g masks below)
        Xw = (Xw.astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]).astype(
            Xw.dtype)
    H = gelu_poly(Xw).astype(Xw.dtype) if gelu_in else Xw
    H2 = H.reshape(H.shape[0] // 2, 2 * C)
    li = jax.lax.broadcasted_iota(jnp.int32, (ywin, 1), 0)
    m_valid = (y_start + li) < valid_out  # (ywin, 1)
    Hp = [H2[:ywin, :C], H2[:ywin, C:]]   # taps 0, 1 for out local l
    if k == 3:
        Hp.append(H2[1 : ywin + 1, :C])   # tap 2

    # post-gelu gradient g from the SAVED pre-activation (forward second
    # output) — replaces the k-matmul forward recompute; garbage pre rows
    # produce garbage dgelu that the m_valid mask below zeroes
    if gelu_out:
        prew = pre_ref[0]  # (ywin, C) rows starting at y_start
        g = dgelu_poly(prew) * dyw.astype(jnp.float32)
    else:
        g = dyw.astype(jnp.float32)
    g = jnp.where(m_valid, g, 0.0)  # kill NaN from garbage dy rows
    gc = g.astype(Xw.dtype)

    # input gradient, assembled in the collapsed (tile, 2C) layout then
    # re-expanded (cheap vreg relayout):
    #   dxe[r'] = G0[r' + 8 s0] + G2[r' + 8 s0 - 1]
    #   dxo[r'] = G1[r' + 8 s0]
    Gp = [_dot(gc, w[p], trans_b=True).astype(jnp.float32) for p in range(k)]

    def _shifted(G, sh_t0, sh_t1):
        """(tile, C) rows G[r' + shift], shift = sh_t0 when s0==0 else sh_t1;
        negative source rows (only possible at t==0 edges) read zeros."""
        if sh_t0 < 0:
            a = jnp.concatenate(
                [jnp.zeros((-sh_t0, G.shape[1]), G.dtype),
                 G[: tile + sh_t0]], axis=0)
        else:
            a = G[sh_t0 : sh_t0 + tile]
        b_ = G[sh_t1 : sh_t1 + tile]
        return jnp.where(s0 == 1, b_, a)

    if k == 3:
        dxe = _shifted(Gp[0], 0, 8) + _shifted(Gp[2], -1, 7)
        dxo = _shifted(Gp[1], 0, 8)
    else:  # k == 2: windows are exact, no shift
        dxe, dxo = Gp[0], Gp[1]
    dX2 = jnp.concatenate([dxe, dxo], axis=1)  # (tile, 2C)
    dX = dX2.reshape(2 * tile, C)
    if gelu_in:
        # dx rows r are window rows r + 16 s0 (k=3) / r (k=2)
        if k == 3:
            Xtile = jnp.where(
                s0 == 1, Xw[16 : 2 * tile + 16], Xw[0 : 2 * tile]
            )
        else:
            Xtile = Xw
        dX = dX * dgelu_poly(Xtile)
    # zero dx rows beyond the valid input length so garbage (incl. the
    # dgelu of NaN garbage rows above) never flows upstream as a cotangent
    ri = jax.lax.broadcasted_iota(jnp.int32, (2 * tile, 1), 0)
    dX = jnp.where(2 * tile * t + ri < valid_in, dX, 0.0)
    if has_affine:
        # x_hat = x*a + b  =>  da += sum_rows dX_hat * x_raw, db += sum
        # dX_hat, dx = dX_hat * a — dx rows are disjoint across programs,
        # so per-(b, c) accumulation over t is exact
        if k == 3:
            raw = jnp.where(
                s0 == 1, Xraw[16 : 2 * tile + 16], Xraw[0 : 2 * tile]
            )
        else:
            raw = Xraw
        da_ref[...] += jnp.sum(
            dX * raw.astype(jnp.float32), axis=0
        )[None, None]
        db_ref[...] += jnp.sum(dX, axis=0)[None, None]
        dX = dX * a_ref[0, 0]
    dx_ref[0] = dX.astype(dx_ref.dtype)

    # weight gradient over this program's OWN output rows only (halo rows
    # l < 8 s0 belong to the previous tile)
    own = (li >= 8 * s0) & (li < 8 * s0 + tile)
    g_own = jnp.where(own, g, jnp.float32(0.0)).astype(Xw.dtype)
    for p in range(k):
        dw_ref[p] += jax.lax.dot_general(
            Hp[p], g_own, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _run_bwd(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w, dy,
             pre=None, affine=None):
    B, Ts, C = x.shape
    Ry = dy.shape[1]
    # tile 512 exceeded the 16 MB scoped-VMEM limit by ~1.7 MB while this
    # kernel still recomputed the forward pre-activations; the r5 save-pre
    # change freed those buffers and 512 now fits AND wins (bench 1725.4 ->
    # 1735.4 audio-sec/s at B=16). Env-overridable for re-sweeps.
    import os as _os

    tile = min(tile, int(_os.environ.get("UNISPEECH_CONV_BWD_TILE", "512")))
    # the 8 * max(k - 1, 0) start maps below only tile over multiples of 8
    assert tile % 8 == 0, tile
    nt = pl.cdiv(Ts, 2 * tile)
    grid = (B, nt)
    if k == 3:
        xwin = 2 * tile + 24
        ywin = tile + 8
        # declared high pad must cover the FURTHEST window end across all
        # tiles, including the t == 0 clamp (start = max(2*tile*t - 16, 0));
        # with nt == 1 the only window starts at 0, so the -16 shift must
        # not be assumed (round-4 advisor finding #1)
        x_last = max(2 * tile * (nt - 1) - 16, 0)
        y_last = max(tile * (nt - 1) - 8, 0)
        xpad = max(0, x_last + xwin - Ts)
        ypad = max(0, y_last + ywin - Ry)
        # starts written as 8 * max(..., 0) so Mosaic can PROVE the 8-tiling
        # divisibility (it cannot reason through max(8k - 8, 0) directly)
        x_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(xwin, (0, xpad)), pl.Element(C)),
            lambda b, t: (b, 8 * jnp.maximum((tile // 4) * t - 2, 0), 0),
        )
        dy_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(ywin, (0, ypad)), pl.Element(C)),
            lambda b, t: (b, 8 * jnp.maximum((tile // 8) * t - 1, 0), 0),
        )
    else:
        xwin = 2 * tile
        ywin = tile
        x_spec = pl.BlockSpec((1, xwin, C), lambda b, t: (b, t, 0))
        dy_spec = pl.BlockSpec((1, ywin, C), lambda b, t: (b, t, 0))
    valid_out = (valid_in - k) // 2 + 1
    has_affine = affine is not None
    in_specs = [
        x_spec,
        pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0)),
        dy_spec,
    ]
    args = [x, w, dy]
    if gelu_out:  # saved pre, same windows as dy
        in_specs.append(dy_spec)
        args.append(pre)
    ab_spec = pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0))
    if has_affine:
        in_specs += [ab_spec, ab_spec]
        args += [affine[0].reshape(B, 1, C), affine[1].reshape(B, 1, C)]
    out_specs = [
        # blocked spec over the exact (B, Ts, C) dx shape: the last
        # (possibly partial) block's out-of-bounds rows are masked by
        # the pipeline, so no post-slice copy is needed
        pl.BlockSpec((1, 2 * tile, C), lambda b, t: (b, t, 0)),
        pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Ts, C), x.dtype),
        jax.ShapeDtypeStruct((k, C, C), jnp.float32),
    ]
    if has_affine:
        out_specs += [ab_spec, ab_spec]
        out_shape += [
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, k=k, tile=tile, gelu_in=gelu_in, gelu_out=gelu_out,
            valid_in=valid_in, valid_out=valid_out,
            mask_x=Ts if interpret else None,
            mask_dy=Ry if interpret else None,
            has_affine=has_affine,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Ry * C * k * C,
            bytes_accessed=2 * B * Ts * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if has_affine:
        dx, dw, da, db = outs
        return dx, dw, da[:, 0], db[:, 0]
    dx, dw = outs
    return dx, dw, None, None


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _block(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w, a, b):
    affine = None if a is None else (a, b)
    return _run_fwd(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w,
                    affine)[0]


def _block_fwd(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w, a, b):
    affine = None if a is None else (a, b)
    y, pre = _run_fwd(k, tile, gelu_in, gelu_out, valid_in, interpret, x, w,
                      affine)
    return y, (x, w, pre, a, b)


def _block_bwd(k, tile, gelu_in, gelu_out, valid_in, interpret, res, dy):
    x, w, pre, a, b = res
    affine = None if a is None else (a, b)
    dx, dw, da, db = _run_bwd(k, tile, gelu_in, gelu_out, valid_in,
                              interpret, x, w, dy, pre, affine)
    return dx, dw.astype(w.dtype), da, db


_block.defvjp(_block_fwd, _block_bwd)


def conv_gelu_block(
    x: jax.Array,  # (B, T, C)
    kernel: jax.Array,  # (k, C, C) nn.Conv layout, k in {2, 3}
    valid_len: int,  # number of valid rows in x (Ts >= valid_len)
    gelu_in: bool = False,
    gelu_out: bool = True,
    tile: int = 512,  # tile sweep at Base bench shapes: 512 > 384 > 256
    interpret: bool = False,
    affine=None,  # ((B, C), (B, C)) fp32: x*a + b applied before gelu_in
):
    """One fused frontend stage:
    y = gelu?( conv_{k,s=2}( gelu_in?( affine?(x) ) ) ).

    `affine` folds a per-(batch, channel) normalize (the frontend
    GroupNorm's x*rstd*scale + (bias - mean*rstd*scale)) into the kernel —
    stats stay outside (they are reductions of x the caller already
    computes), but the (B, T, C) normalize read+write pass disappears and
    the backward emits da/db alongside dx/dw, so autodiff through the
    stats runs on (B, C) arrays only.

    Returns (y, t_out): y has nt*tile >= t_out storage rows; rows beyond
    t_out are finite garbage no valid downstream window reads. Slice
    y[:, :t_out] after the last block.
    """
    k = kernel.shape[0]
    assert k in (2, 3), "frontend fused block supports k=2 and k=3, s=2"
    t_out = (valid_len - k) // 2 + 1
    if k == 2 and x.shape[1] % (2 * tile) != 0:
        # k=2 path uses plain blocked windows; pad storage to a multiple
        pad = -x.shape[1] % (2 * tile)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    a, b = (None, None) if affine is None else (
        affine[0].astype(jnp.float32), affine[1].astype(jnp.float32)
    )
    y = _block(k, tile, gelu_in, gelu_out, valid_len, interpret, x,
               kernel.astype(x.dtype), a, b)
    return y, t_out
