"""Train state + jitted sharded train step factory.

Replaces the reference Trainer's update path (src/fairseq/trainer.py:678-858:
grad accumulation, all-reduce, normalize-by-sample-size, clip, step) with ONE
jitted function: under GSPMD the batch is sharded over the 'data' axis, so
plain jnp sums over the batch are global sums — loss normalization by global
sample_size and gradient reduction need no explicit collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unispeech_tpu.parallel.sharding import (
    data_sharding,
    params_shardings,
    replicated,
)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


LossFn = Callable[..., Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]]
# loss_fn(params, batch, rng, step) -> (loss_sum, sample_size, metrics)


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    donate_state: bool = True,
    accum_steps: int = 1,
    inner_steps: int = 1,
):
    """Build the jitted train step.

    Gradient semantics match the reference: per-position losses are summed
    across all microbatches, gradients normalized by the *global* sample
    size (trainer.py:787-804), then clipped/stepped.

    accum_steps > 1 reproduces the reference's `update_freq` gradient
    accumulation (trainer.py:689-705, GroupedIterator): the batch pytree must
    carry a leading (accum_steps, ...) axis; raw (unnormalized) gradients are
    summed over microbatches with `lax.scan` and divided by the TOTAL sample
    size — exactly equivalent to one step on the concatenated batch.

    inner_steps > 1 runs K FULL optimizer steps per dispatch under one
    `lax.scan`, each consuming a DISTINCT microbatch: the batch pytree must
    carry a leading (inner_steps, ...) axis (stack K consecutive host
    batches, like the accum path — both may be combined, giving
    (inner_steps, accum_steps, ...)). The per-step RNG is folded from the
    advancing state.step, so dropout/masking streams match K separate
    dispatches exactly. Host↔device round-trips per optimizer step are the
    dominant cost on tunneled / high-latency runtimes; production TPU loops
    amortize them exactly this way. Metrics come back STACKED with a
    leading (inner_steps,) axis — one entry per optimizer step — so host
    logging sees every update, not just the last.
    """

    def raw_objective(params, batch, rng, step):
        loss, sample_size, metrics = loss_fn(params, batch, rng, step)
        return loss, (sample_size, metrics)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(raw_objective, has_aux=True)

        if accum_steps == 1:
            (loss, (sample_size, metrics)), grads = grad_fn(
                state.params, batch, rng, state.step
            )
        else:
            def body(carry, inp):
                grads_acc, loss_acc, ss_acc, met_acc = carry
                mb, i = inp
                mrng = jax.random.fold_in(rng, i)
                (l, (ss, met)), g = grad_fn(state.params, mb, mrng, state.step)
                carry = (
                    jax.tree.map(jnp.add, grads_acc, g),
                    loss_acc + l,
                    ss_acc + ss,
                    jax.tree.map(jnp.add, met_acc, met),
                )
                return carry, None

            mb0 = jax.tree.map(lambda x: x[0], batch)
            (l0, (ss0, met0)), g0 = grad_fn(
                state.params, mb0, jax.random.fold_in(rng, 0), state.step
            )
            rest = jax.tree.map(lambda x: x[1:], batch)
            (grads, loss, sample_size, metrics), _ = jax.lax.scan(
                body,
                (g0, l0, ss0, met0),
                (rest, jnp.arange(1, accum_steps)),
            )

        denom = jnp.maximum(sample_size, 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["loss_per_sample"] = loss / denom
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, metrics

    if inner_steps > 1:
        def outer(state: TrainState, batch, rng):
            def body(st, mb):
                return step_fn(st, mb, rng)

            # scan slices the leading (inner_steps, ...) axis: microbatch k
            # feeds optimizer step k; rng uniqueness comes from the
            # state.step fold inside step_fn
            return jax.lax.scan(body, state, batch, length=inner_steps)

        donate = (0,) if donate_state else ()
        return jax.jit(outer, donate_argnums=donate)

    donate = (0,) if donate_state else ()
    return jax.jit(step_fn, donate_argnums=donate)


def shard_train_state(
    state: TrainState,
    mesh: Mesh,
    tensor_parallel: bool = False,
    fsdp: bool = False,
    min_fsdp_size: int = 2**16,
) -> TrainState:
    """Place an (unsharded, host-resident) state onto the mesh.

    Optimizer state pytree leaves follow their parameter's sharding (mu/nu in
    adam mirror param shapes) — the ZeRO-1/2 analog falls out for free when
    fsdp=True.
    """
    pshard = params_shardings(state.params, mesh, tensor_parallel, fsdp, min_fsdp_size)

    def opt_shardings(opt_state):
        def one(leaf):
            # match by shape against params tree: leaves with a param-shaped
            # array adopt that sharding; everything else is replicated
            return None

        flat_p, _ = jax.tree_util.tree_flatten(state.params)
        flat_s, _ = jax.tree_util.tree_flatten(pshard)
        by_shape = {}
        for p, s in zip(flat_p, flat_s):
            by_shape.setdefault(p.shape, s)

        def assign(leaf):
            if hasattr(leaf, "shape") and leaf.shape in by_shape and leaf.ndim > 0:
                return by_shape[leaf.shape]
            return replicated(mesh)

        return jax.tree.map(assign, opt_state)

    state_shardings = TrainState(
        step=replicated(mesh),
        params=pshard,
        opt_state=opt_shardings(state.opt_state),
    )
    return jax.device_put(state, state_shardings)


def shard_batch(batch, mesh: Mesh, n_stack: int = 0):
    """Place a host batch on the mesh; n_stack leading axes (accum / inner
    microbatch grouping) stay unsharded, the batch axis shards over 'data'.

    Single-process: a plain device_put. Multi-process (jax.distributed):
    each process holds only ITS data shard (the iterators slice with
    num_shards=jax.process_count(), train/__main__.py), so the global array
    is assembled from per-process local batches — the GSPMD analog of the
    reference's per-rank DataLoader shards (fairseq ShardedIterator,
    iterators.py:degenerate DDP sharding). The global batch is
    local_batch * process_count along the batch axis."""
    sharding = data_sharding(mesh, n_stack)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
