"""Conv lowering variants for the wav2vec2 frontend, timed on chip.

L1-shape: x (6, 49999, 512) bf16, kernel (3, 512, 512), stride 2.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 6


def timeit_loop(body, init, iters, reps=2):
    f = jax.jit(
        lambda x0: jax.lax.fori_loop(0, iters, lambda i, x: body(x), x0)
    )
    r = f(init)
    float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(init)
        float(jax.tree.leaves(r)[0].ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print(jax.devices(), flush=True)
    rng = jax.random.PRNGKey(0)
    T, CIN, COUT, K, S = 49999, 512, 512, 3, 2
    x = jax.random.normal(rng, (B, T, CIN), jnp.bfloat16) * 0.1
    w = jax.random.normal(rng, (K, CIN, COUT), jnp.bfloat16) * 0.02
    t_out = (T - K) // S + 1
    fl = 2 * B * t_out * K * CIN * COUT
    # feed output back: need (B,T,CIN) from (B,t_out,COUT): pad time
    def chain(y):
        y = jnp.pad(y, ((0, 0), (0, T - t_out), (0, 0)))
        return y.astype(jnp.bfloat16)

    # V1: current strided-slice im2col
    def v1(x):
        span = (t_out - 1) * S + 1
        taps = [jax.lax.slice_in_dim(x, i, i + span, S, axis=1)
                for i in range(K)]
        win = jnp.concatenate(taps, axis=-1)
        y = jax.lax.dot_general(win, w.reshape(K * CIN, COUT),
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.bfloat16)
        return chain(y)

    dt = timeit_loop(v1, x, 60)
    print(f"v1 strided-slice im2col: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s",
          flush=True)

    # V2: XLA native conv
    def v2(x):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(S,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.bfloat16)
        return chain(y)

    dt = timeit_loop(v2, x, 60)
    print(f"v2 xla conv: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s", flush=True)

    # V3: stride-collapse reshape + contiguous-concat im2col
    kpp = (K - 1) // S + 1
    rows = t_out - 1 + kpp
    T_pad = rows * S
    wpad = jnp.pad(w, ((0, kpp * S - K), (0, 0), (0, 0)))
    w3 = wpad.reshape(kpp * S * CIN, COUT)

    def v3(x):
        h = jnp.pad(x, ((0, 0), (0, max(0, T_pad - T)), (0, 0)))[:, :T_pad]
        x2 = h.reshape(B, rows, S * CIN)
        win = jnp.concatenate([x2[:, j:j + t_out] for j in range(kpp)],
                              axis=-1)
        y = jax.lax.dot_general(win, w3, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.bfloat16)
        return chain(y)

    dt = timeit_loop(v3, x, 60)
    print(f"v3 reshape+concat: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s",
          flush=True)

    # V4: stride-collapse + sum of per-window-row dots (no concat)
    def v4(x):
        h = jnp.pad(x, ((0, 0), (0, max(0, T_pad - T)), (0, 0)))[:, :T_pad]
        x2 = h.reshape(B, rows, S * CIN)
        y = None
        for j in range(kpp):
            wj = wpad[j * S:(j + 1) * S].reshape(S * CIN, COUT)
            yj = jax.lax.dot_general(x2[:, j:j + t_out], wj,
                                     (((2,), (0,)), ((), ())),
                                     preferred_element_type=jnp.bfloat16)
            y = yj if y is None else y + yj
        return chain(y)

    dt = timeit_loop(v4, x, 60)
    print(f"v4 reshape+sumdots: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s",
          flush=True)

    # V5: XLA conv on the stride-collapsed view (stride-1 conv, k=kpp)
    def v5(x):
        h = jnp.pad(x, ((0, 0), (0, max(0, T_pad - T)), (0, 0)))[:, :T_pad]
        x2 = h.reshape(B, rows, S * CIN)
        w5 = wpad.reshape(kpp, S * CIN, COUT)
        y = jax.lax.conv_general_dilated(
            x2, w5, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.bfloat16)
        return chain(y)

    dt = timeit_loop(v5, x, 60)
    print(f"v5 collapse+conv1: {dt*1e6:.0f} us {fl/dt/1e12:.1f} TF/s",
          flush=True)

    # grad variants
    for name, fn in [("v1", v1), ("v3", v3), ("v4", v4), ("v5", v5)]:
        def body(xx, fn=fn):
            g = jax.grad(lambda z: jnp.sum(
                fn(z).astype(jnp.float32) ** 2) * 1e-6)(xx)
            return (xx + 0.0 * g).astype(jnp.bfloat16)
        dt = timeit_loop(body, x, 30)
        print(f"{name} fwd+bwd: {dt*1e6:.0f} us {3*fl/dt/1e12:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
