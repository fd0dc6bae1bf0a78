"""Training driver: epoch-free update loop with validate/save cadence.

Replaces the reference's fairseq_cli/train.py main loop + Trainer
(/root/reference/src/fairseq_cli/train.py:167-404, src/fairseq/trainer.py) —
no process spawning, no DDP wrapper, no fp16 scaler: one host process drives
a jitted GSPMD train step over a mesh; data comes from an epoch-checkpointable
host iterator; checkpoints are orbax-managed.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unispeech_tpu.parallel.sharding import make_mesh
from unispeech_tpu.train.checkpoint import CheckpointManager
from unispeech_tpu.train.state import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from unispeech_tpu.utils.metrics import MetricsAggregator, ProgressLogger, StopwatchMeter


@dataclass(frozen=True)
class LoopConfig:
    max_updates: int = 400_000
    log_interval: int = 100
    save_interval_updates: int = 25_000
    # optional flat-.npz params export at end of training (consumed by
    # finetune --w2v-path / decode --checkpoint / downstream CLIs)
    export_params: Optional[str] = None
    validate_interval_updates: int = 25_000
    max_valid_steps: int = 0  # 0 = full pass
    keep_last_checkpoints: int = 3
    checkpoint_dir: str = "checkpoints"
    best_metric: str = "loss_avg"
    maximize_best: bool = False
    seed: int = 1
    # mesh
    n_model: int = 1
    fsdp: bool = False
    tensorboard_dir: Optional[str] = None
    # optional hosted sinks (reference WandB/AzureML progress wrappers,
    # progress_bar.py:324-420); gated on packages, fail soft
    wandb_project: Optional[str] = None
    azureml: bool = False
    # gradient accumulation (reference update_freq, trainer.py:689-705)
    accum_steps: int = 1
    # optimizer steps per device dispatch: K distinct microbatches are
    # stacked host-side and scanned in-graph (train/state.py), amortizing
    # per-dispatch host↔device overhead (dominant on tunneled runtimes).
    # Orthogonal to accum_steps; cadences fire when crossed, and the loop
    # may overshoot max_updates by < inner_steps on the last dispatch.
    inner_steps: int = 1
    # host input pipeline: batches collated ahead of the loop on a background
    # thread (reference DataLoader workers + buffered iterators); 0 disables
    prefetch_depth: int = 4
    # NaN/Inf localization cadence: check the logged loss every log interval
    # and dump offending param/metric paths (NanDetector analog)
    detect_nonfinite: bool = True
    # hung-step watchdog (DistributedTimeoutWrapper analog): dump all
    # thread stacks if a device step takes longer than this; 0 disables.
    # kill=False by default — it warns so the job can be inspected.
    hang_timeout_s: float = 0.0
    hang_kill: bool = False


def run_training(
    model,
    loss_fn,  # (params, batch, rng, step) -> (loss_sum, sample_size, metrics)
    tx,
    train_batches: Iterable[Dict[str, np.ndarray]],  # infinite iterator
    init_batch: Dict[str, np.ndarray],  # one batch for shape-driven init
    cfg: LoopConfig,
    init_rngs: Dict[str, jax.Array],
    valid_batches_fn: Optional[Callable[[], Iterable[Dict]]] = None,
    eval_loss_fn=None,
    valid_decode_fn=None,  # (state, batch) -> {metric: sum} (e.g. WER sums)
    data_state: Optional[Dict] = None,  # iterator with state_dict/load_state_dict
    init_params=None,  # warm-start params (e.g. grafted pretrain weights)
) -> TrainState:
    mesh = make_mesh(n_model=cfg.n_model)
    rng = jax.random.PRNGKey(cfg.seed)

    # init (host) then place on the mesh
    if init_params is None:
        variables = model.init(init_rngs, **_init_kwargs(init_batch))
        init_params = variables["params"]
    state = create_train_state(init_params, tx)
    state = shard_train_state(
        state, mesh, tensor_parallel=cfg.n_model > 1, fsdp=cfg.fsdp
    )

    ckpt = CheckpointManager(
        cfg.checkpoint_dir,
        keep_last=cfg.keep_last_checkpoints,
        best_metric=cfg.best_metric,
        maximize_best=cfg.maximize_best,
    )
    data_obj = data_state
    data_template = data_obj.state_dict() if data_obj is not None else None
    state, restored_data, start_step = ckpt.restore(state, data_template)
    if restored_data is not None and data_obj is not None:
        data_obj.load_state_dict(jax.tree.map(lambda x: np.asarray(x).item()
                                              if np.ndim(x) == 0 else x,
                                              restored_data))

    step_fn = make_train_step(
        loss_fn, tx, accum_steps=cfg.accum_steps, inner_steps=cfg.inner_steps
    )
    if cfg.accum_steps > 1:
        train_batches = group_microbatches(train_batches, cfg.accum_steps)
    if cfg.inner_steps > 1:
        # outer grouping: each dispatch consumes (inner_steps, [accum,] ...)
        train_batches = group_microbatches(train_batches, cfg.inner_steps)
    if cfg.prefetch_depth > 0:
        from unispeech_tpu.data.prefetch import prefetch

        train_batches = prefetch(train_batches, depth=cfg.prefetch_depth)
    eval_fn = None
    if eval_loss_fn is not None:
        def _eval(state, batch, rng):
            loss, ss, metrics = eval_loss_fn(state.params, batch, rng, state.step)
            return metrics
        eval_fn = jax.jit(_eval)

    agg = MetricsAggregator()
    logger = ProgressLogger("train", cfg.tensorboard_dir,
                            wandb_project=cfg.wandb_project,
                            azureml=cfg.azureml)
    vlogger = ProgressLogger("valid", cfg.tensorboard_dir,
                             wandb_project=cfg.wandb_project,
                             azureml=cfg.azureml)
    timer = StopwatchMeter()
    from unispeech_tpu.utils.debug import (
        CompileWatchdog,
        HangWatchdog,
        nonfinite_paths,
    )

    watchdog = CompileWatchdog(warn_after=3)
    hang = (
        HangWatchdog(cfg.hang_timeout_s, kill=cfg.hang_kill)
        if cfg.hang_timeout_s > 0
        else None
    )

    step_rng = jax.random.fold_in(rng, 0xBEEF)
    num_updates = int(start_step)
    # metrics from the most recent validation, consumed by the FIRST save
    # that follows it (fairseq scores checkpoints only at validation time,
    # checkpoint_utils.py save_checkpoint). Carrying them to every save let
    # an unvalidated checkpoint tie the true best on a stale score; saves
    # with no pending validation carry None and score ±inf in the manager.
    pending_val_metrics: Optional[Dict[str, float]] = None
    n_stack = int(cfg.accum_steps > 1) + int(cfg.inner_steps > 1)
    for batch in train_batches:
        if num_updates >= cfg.max_updates:
            break
        sharded = shard_batch(_as_device_batch(batch), mesh, n_stack)
        timer.start()
        if hang is not None:
            hang.arm()
        state, metrics = step_fn(state, sharded, step_rng)
        timer.stop()
        k_steps = cfg.inner_steps
        num_updates += k_steps
        # agg.update() fetches the metric scalars — the step's device sync
        # point, so the watchdog window covers actual device execution
        if k_steps > 1:
            # metrics carry a leading (inner_steps,) axis: one entry per
            # optimizer step taken inside the dispatch
            host_metrics = jax.device_get(metrics)
            for k in range(k_steps):
                agg.update(jax.tree.map(lambda m: m[k], host_metrics))
        else:
            agg.update(metrics)
        if hang is not None:
            hang.disarm()

        if _crossed(num_updates, k_steps, cfg.log_interval):
            stats = agg.snapshot()
            stats["updates"] = num_updates
            stats["step_time_avg_s"] = timer.avg
            logger.log(num_updates, stats)
            agg.reset()
            watchdog.track("train_step", step_fn)
            if cfg.detect_nonfinite and not np.isfinite(
                stats.get("loss_avg", 0.0)
            ):
                # NanDetector analog (nan_detector.py:14-60): localize which
                # parameters went bad before dying
                bad = nonfinite_paths(jax.device_get(state.params))
                detail = "; ".join(f"{p}:{k}" for p, k in bad) or "params finite"
                raise FloatingPointError(
                    f"non-finite training loss at update {num_updates} "
                    f"({stats.get('loss_avg')}); {detail}"
                )

        if (
            cfg.validate_interval_updates
            and _crossed(num_updates, k_steps, cfg.validate_interval_updates)
            and valid_batches_fn is not None
            and eval_fn is not None
        ):
            vstats = run_validation(
                state, eval_fn, valid_batches_fn(), mesh, cfg.max_valid_steps,
                decode_fn=valid_decode_fn,
            )
            vlogger.log(num_updates, vstats)
            if cfg.best_metric in vstats:
                pending_val_metrics = {
                    cfg.best_metric: float(vstats[cfg.best_metric])
                }

        if cfg.save_interval_updates and _crossed(
            num_updates, k_steps, cfg.save_interval_updates
        ):
            ckpt.save(
                num_updates,
                state,
                data_state=data_obj.state_dict() if data_obj is not None else None,
                metrics=pending_val_metrics,
            )
            pending_val_metrics = None

    if hasattr(train_batches, "close"):
        train_batches.close()
    ckpt.save(
        num_updates,
        state,
        data_state=data_obj.state_dict() if data_obj is not None else None,
        metrics=pending_val_metrics,
    )
    ckpt.wait()
    ckpt.close()
    if cfg.export_params:
        from unispeech_tpu.train.checkpoint import save_params_npz

        save_params_npz(cfg.export_params, jax.device_get(state.params))
    logger.close()
    vlogger.close()
    return state


def _crossed(num_updates: int, k_steps: int, interval: int) -> bool:
    """Did the last dispatch (which advanced by k_steps) cross a multiple of
    interval? With k_steps == 1 this is exactly `num_updates % interval == 0`."""
    return (num_updates // interval) > ((num_updates - k_steps) // interval)


def group_microbatches(batches: Iterable[Dict], k: int) -> Iterable[Dict]:
    """Stack k consecutive same-shape batches into one (k, ...) batch.

    Replaces the reference's GroupedIterator (iterators.py:492). Batches are
    buffered per bucket shape so mixed-bucket streams still group without
    padding games; each yielded batch carries a leading (k, ...) axis for
    `make_train_step(accum_steps=k)`.
    """
    buffers: Dict = {}
    n_dropped = 0
    for b in batches:
        key = tuple(sorted((name, v.shape) for name, v in b.items()))
        buf = buffers.setdefault(key, [])
        buf.append(b)
        if len(buf) == k:
            yield {
                name: np.stack([mb[name] for mb in buf]) for name in buf[0]
            }
            buffers[key] = []
    # finite stream ended: per-bucket-shape tails that never filled to k
    # cannot form a fixed-shape accumulation group — report rather than
    # silently eat data (on many-bucket finite datasets this adds up)
    n_dropped = sum(len(buf) for buf in buffers.values())
    if n_dropped:
        import logging

        logging.getLogger(__name__).warning(
            "group_microbatches: dropped %d tail micro-batch(es) across %d "
            "bucket shape(s) that never filled an accumulation group of %d",
            n_dropped, sum(1 for buf in buffers.values() if buf), k,
        )


def run_validation(state, eval_fn, batches, mesh, max_steps: int = 0,
                   decode_fn=None) -> Dict:
    """Aggregate eval-loss metrics and (optionally) decode-and-score stats.

    `decode_fn(state, batch) -> {metric: sum}` is the hook for valid-time
    greedy WER/UER (the reference computes dev UER/WER inside the CTC
    criterion, /root/reference/src/fairseq/criterions/ctc.py:161-233, and
    selects checkpoints with best_checkpoint_metric=wer); error/length SUMS
    aggregate across batches and the ratios are derived at snapshot."""
    agg = MetricsAggregator()
    agg.add_derived(
        "wer", lambda s: 100.0 * s["wer_errs"] / max(s["wer_len"], 1)
    )
    agg.add_derived(
        "uer", lambda s: 100.0 * s["uer_errs"] / max(s["uer_len"], 1)
    )
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(batches):
        if max_steps and i >= max_steps:
            break
        device_batch = _as_device_batch(batch)
        sharded = shard_batch(device_batch, mesh)
        metrics = dict(eval_fn(state, sharded, rng))
        if decode_fn is not None:
            metrics.update(decode_fn(state, sharded))
        agg.update(metrics)
    return agg.snapshot()


def _as_device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _init_kwargs(batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    if "tokens" in batch:  # language-modeling batches
        return {"tokens": jnp.asarray(batch["tokens"][:1])}
    kw: Dict[str, Any] = {"source": jnp.asarray(batch["source"][:1])}
    if "prev_tokens" in batch:  # seq2seq batches (teacher forcing)
        kw["prev_tokens"] = jnp.asarray(batch["prev_tokens"][:1])
    elif "targets" in batch:
        kw["targets"] = jnp.asarray(batch["targets"][:1])
    if "lengths" in batch:
        kw["lengths"] = jnp.asarray(batch["lengths"][:1])
    return kw
