"""Real multi-process training probe: N jax.distributed processes on
localhost, each owning a per-process data shard, must produce the SAME
losses as one process over the same global mesh.

Exercises for the first time with process_count > 1 (round-4 verdict item
3): parallel/bootstrap.maybe_initialize_distributed, per-process data
sharding (the iterators' num_shards=jax.process_count() convention,
train/__main__.py:163-165), shard_batch's
make_array_from_process_local_data path, and GSPMD collectives across
process boundaries (gloo on CPU). Reference analog: distributed_init +
per-rank ShardedIterator (/root/reference/src/fairseq/distributed/
utils.py:255-297).

Modes:
  worker:  python scripts/multiproc_train.py worker <pid> <nprocs> <port>
  single:  python scripts/multiproc_train.py single
Both print one JSON line {"losses": [...], "grad_norms": [...]} computed
over the same deterministic global batch stream.
"""

import json
import os
import sys

N_LOCAL_DEV = 4
GLOBAL_B = 8
STEPS = 3
N_SAMP = 2000


def _build(jax, jnp):
    from unispeech_tpu.configs import (
        HubertPretrainConfig,
        MaskConfig,
        base_encoder_config,
    )
    from unispeech_tpu.models.hubert import HubertPretrainModel

    enc = base_encoder_config(
        conv_layers=((16, 10, 5), (16, 8, 4), (16, 4, 2)),
        encoder_layers=2,
        encoder_embed_dim=32,
        encoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        encoder_layerdrop=0.0,
    )
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=0.5, mask_length=4),
        num_classes=(10,),
        final_dim=8,
    )
    return HubertPretrainModel(cfg), cfg


def _global_batch(step_idx, n_frames):
    """Deterministic global batch; row r depends only on (step_idx, r)."""
    import numpy as np

    src = np.stack([
        np.random.default_rng(1000 * step_idx + r).standard_normal(N_SAMP)
        for r in range(GLOBAL_B)
    ]).astype(np.float32)
    tgt = np.stack([
        np.random.default_rng(7000 * step_idx + r).integers(
            0, 10, (n_frames, 1)
        )
        for r in range(GLOBAL_B)
    ]).astype(np.int32)
    return {"source": src, "targets": tgt}


def run(process_id=None, num_processes=None, port=None):
    os.environ["JAX_PLATFORMS"] = "cpu"
    n_dev = N_LOCAL_DEV if process_id is not None else GLOBAL_B
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if process_id is not None:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from unispeech_tpu.parallel.bootstrap import (
            maybe_initialize_distributed,
        )

        assert maybe_initialize_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
        assert jax.process_count() == num_processes

    import jax.numpy as jnp
    import numpy as np

    from unispeech_tpu.parallel.sharding import make_mesh
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import (
        create_train_state,
        make_train_step,
        shard_batch,
        shard_train_state,
    )
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    model, cfg = _build(jax, jnp)
    n_frames = cfg.encoder.num_frames(N_SAMP)
    rng = jax.random.PRNGKey(0)
    b0 = _global_batch(0, n_frames)
    variables = model.init(
        {"params": rng, "mask": rng},
        jnp.asarray(b0["source"][:1]), jnp.asarray(b0["targets"][:1]),
        mask=True, deterministic=True,
    )
    tx = make_optimizer(
        OptimConfig(lr=1e-3, schedule="fixed", weight_decay=0.0, clip_norm=1.0)
    )
    mesh = make_mesh()
    state = create_train_state(variables["params"], tx)
    state = shard_train_state(state, mesh)
    loss_fn = make_hubert_loss_fn(model, HubertCriterionConfig())
    step = make_train_step(loss_fn, tx, donate_state=False)

    # per-process data sharding: each process materializes ONLY its slice
    # of the global batch (iterator num_shards/shard_id convention)
    n_shards = jax.process_count()
    shard = jax.process_index()
    losses, gnorms = [], []
    for i in range(STEPS):
        gb = _global_batch(i, n_frames)
        rows = slice(
            shard * (GLOBAL_B // n_shards), (shard + 1) * (GLOBAL_B // n_shards)
        )
        local = {k: v[rows] for k, v in gb.items()}
        sharded = shard_batch(local, mesh)
        state, m = step(state, sharded, jax.random.PRNGKey(42))
        losses.append(
            float(np.asarray(m["loss"].addressable_data(0)))
            / max(float(np.asarray(m["sample_size"].addressable_data(0))), 1.0)
        )
        gnorms.append(float(np.asarray(m["grad_norm"].addressable_data(0))))
    print(json.dumps({"losses": losses, "grad_norms": gnorms}), flush=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if sys.argv[1] == "worker":
        run(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        run()
