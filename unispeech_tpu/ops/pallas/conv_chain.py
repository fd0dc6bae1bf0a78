"""Fused (gelu ->) conv1d(k=3, s=2) -> gelu Pallas block for the waveform
frontend's 512-channel layers.

The conv frontend is the single largest cost of the pretrain step (~32 ms of
a ~96 ms Base step in the round-3 device trace), and most of that is NOT
matmul FLOPs: it is elementwise GELU passes, stride-collapse pad/reshape
relayouts, and activation loads/stores between the seven XLA-level layers
(reference chain: /root/reference/WavLM/WavLM.py:378-504). This kernel fuses
one whole `gelu -> conv(k3,s2) -> gelu` stage into a single VMEM-resident
pass over phase-split inputs:

  out[i] = gelu( x[2i] W0 + x[2i+1] W1 + x[2i+2] W2 ),  x = maybe_gelu(raw)

The caller provides x split into even/odd phases plus a shifted even view
(plain jnp reshama/slice — cheap, and their AD transpose performs the halo
overlap-add for free), so every kernel access is unit-stride. The backward
is one kernel producing dxe/dxo/dxe1 and the fp32-accumulated weight
gradient (written once by the last grid program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7; Mosaic has
    no erf/erfc lowering). Well inside the bf16 activation noise floor."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_f32(x):
    # erf form: 0.5 x (1 + erf(x/sqrt(2)))
    xf = x.astype(jnp.float32)
    return 0.5 * xf * (1.0 + _erf_f32(xf * jnp.float32(0.7071067811865476)))


def _dgelu_f32(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x)
    xf = x.astype(jnp.float32)
    phi = jnp.exp(-0.5 * xf * xf) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    Phi = 0.5 * (1.0 + _erf_f32(xf * jnp.float32(0.7071067811865476)))
    return Phi + xf * phi


def _fwd_kernel(xe_ref, xo_ref, xe1_ref, w_ref, out_ref, *, gelu_in: bool):
    w = w_ref[...]  # (3, C, C)
    acc = None
    for j, ref in enumerate((xe_ref, xo_ref, xe1_ref)):
        x = ref[0]
        h = _gelu_f32(x).astype(x.dtype) if gelu_in else x
        part = jax.lax.dot_general(
            h, w[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    out_ref[0] = _gelu_f32(acc).astype(out_ref.dtype)


def _bwd_kernel(xe_ref, xo_ref, xe1_ref, w_ref, dy_ref,
                dxe_ref, dxo_ref, dxe1_ref, dw_ref, dw_acc,
                *, gelu_in: bool, n_programs: int):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    w = w_ref[...]
    xs = (xe_ref[0], xo_ref[0], xe1_ref[0])
    hs = [
        _gelu_f32(x).astype(x.dtype) if gelu_in else x for x in xs
    ]
    pre = None
    for j in range(3):
        part = jax.lax.dot_general(
            hs[j], w[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pre = part if pre is None else pre + part
    g = (dy_ref[0].astype(jnp.float32) * _dgelu_f32(pre)).astype(xs[0].dtype)

    for j, dref in enumerate((dxe_ref, dxo_ref, dxe1_ref)):
        dh = jax.lax.dot_general(
            g, w[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if gelu_in:
            dh = dh * _dgelu_f32(xs[j])
        dref[0] = dh.astype(dref.dtype)
        dw_acc[j] += jax.lax.dot_general(
            hs[j], g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_programs - 1)
    def _():
        dw_ref[...] = dw_acc[...].astype(dw_ref.dtype)


def _tiles(rows: int, tile: int) -> int:
    return (rows + tile - 1) // tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _core(gelu_in, tile, interpret, xe, xo, xe1, w):
    return _run_fwd(gelu_in, tile, interpret, xe, xo, xe1, w)


def _run_fwd(gelu_in, tile, interpret, xe, xo, xe1, w):
    B, R, C = xe.shape
    grid = (B, R // tile)

    def m(b, t):
        return (b, t, 0)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, gelu_in=gelu_in),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), xe.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * R * C * C,
            bytes_accessed=8 * B * R * C,
            transcendentals=4 * B * R * C,
        ),
        interpret=interpret,
    )(xe, xo, xe1, w)


def _core_fwd(gelu_in, tile, interpret, xe, xo, xe1, w):
    y = _run_fwd(gelu_in, tile, interpret, xe, xo, xe1, w)
    return y, (xe, xo, xe1, w)


def _core_bwd(gelu_in, tile, interpret, res, dy):
    xe, xo, xe1, w = res
    B, R, C = xe.shape
    grid = (B, R // tile)
    n_programs = grid[0] * grid[1]

    def m(b, t):
        return (b, t, 0)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, gelu_in=gelu_in,
                          n_programs=n_programs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), m, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, C), xe.dtype),
            jax.ShapeDtypeStruct((B, R, C), xo.dtype),
            jax.ShapeDtypeStruct((B, R, C), xe1.dtype),
            jax.ShapeDtypeStruct((3, C, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, C, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=18 * B * R * C * C,
            bytes_accessed=16 * B * R * C,
            transcendentals=8 * B * R * C,
        ),
        interpret=interpret,
    )(xe, xo, xe1, w, dy)
    dxe, dxo, dxe1, dw = outs
    return dxe, dxo, dxe1, dw.astype(w.dtype)


_core.defvjp(_core_fwd, _core_bwd)


def fused_conv_gelu_block(
    x: jax.Array,  # (B, T, C)
    kernel: jax.Array,  # (3, C, C) — nn.Conv layout (k, in, out)
    gelu_in: bool = False,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(B, T_out, C) with T_out = (T - 3)//2 + 1; out = gelu(conv(gi(x))).

    Phase decomposition: out[i] = gi(x)[2i] W0 + gi(x)[2i+1] W1 +
    gi(x)[2i+2] W2, so with x viewed as even/odd row phases every kernel
    access is unit-stride. The phase slicing below is plain traced jnp —
    its AD transpose reassembles dxe/dxo/dxe1 (including the +1-shift
    overlap-add) automatically.
    """
    B, T, C = x.shape
    t_out = (T - 3) // 2 + 1
    # rows padded so the grid divides evenly; padded rows produce garbage
    # outputs that are sliced off, and contribute zero gradient
    R = _tiles(t_out, tile) * tile
    Tp = 2 * R + 2
    if Tp > T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    ph = x[:, : 2 * R + 2].reshape(B, R + 1, 2, C)
    xe = ph[:, :R, 0]
    xo = ph[:, :R, 1]
    xe1 = ph[:, 1 : R + 1, 0]
    y = _core(gelu_in, tile, interpret, xe, xo, xe1,
              kernel.astype(x.dtype))
    return y[:, :t_out]
