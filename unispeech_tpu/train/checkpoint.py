"""Checkpoint save/restore (orbax) for the sharded train state.

Replaces the reference checkpoint layer (/root/reference/src/fairseq/
checkpoint_utils.py:33-274: best/last/epoch/update checkpoints, keep-N
pruning, async ioPath writes, iterator-state restore) with orbax async
sharded checkpointing of one pytree:

  {"state": TrainState, "data": input-iterator state_dict, "meta": scalars}

Works for replicated and GSPMD-sharded states alike (orbax records shardings
and restores onto the same mesh).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """keep-N update checkpoints + best + last, fairseq-style cadence
    (checkpoint_utils.py:33-180) on orbax."""

    def __init__(
        self,
        directory: str,
        keep_last: int = 3,
        best_metric: str = "loss",
        maximize_best: bool = False,
    ):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_last = keep_last
        self.best_metric = best_metric
        self.maximize_best = maximize_best
        # a checkpoint saved without the tracked metric (no validation ran
        # yet) must never win "best": score it as the WORST possible value,
        # not 0.0 (with best_mode="min" a 0.0 would beat every real loss).
        worst = float("-inf") if maximize_best else float("inf")
        sign = 1.0 if maximize_best else -1.0
        # fairseq keeps the last N update checkpoints AND checkpoint_best
        # independently (checkpoint_utils.py:120-180). orbax's plain
        # max_to_keep+best_fn instead keeps the best N — which deletes the
        # LATEST checkpoint once it is no longer among the best and breaks
        # resume. The preservation policy below reproduces the fairseq
        # semantics: latest-N for resume + best-1 for model selection.
        from orbax.checkpoint import checkpoint_managers as _cm

        _pp = _cm.preservation_policy
        policy = None
        if keep_last:
            keep = [_pp.LatestN(keep_last)]
            if best_metric:
                keep.append(_pp.BestN(
                    get_metric_fn=lambda m: sign * m.get(best_metric, worst),
                    n=1,
                    keep_checkpoints_without_metrics=False,
                ))
            policy = _pp.AnyPreservationPolicy(keep)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True,
                best_fn=(lambda m: m.get(best_metric, worst)) if best_metric else None,
                best_mode="max" if maximize_best else "min",
                preservation_policy=policy,
            ),
        )

    def save(
        self,
        step: int,
        state,
        data_state: Optional[Dict] = None,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        ocp = _ocp()
        payload = {"state": state}
        if data_state is not None:
            payload["data"] = data_state
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(
                    {"step": step, "metrics": metrics or {}}
                ),
            ),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state_template, data_template: Optional[Dict] = None,
                step: Optional[int] = None) -> Tuple[Any, Optional[Dict], int]:
        """Restore (state, data_state, step); template supplies shardings."""
        ocp = _ocp()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state_template, data_template, 0
        payload = {"state": state_template}
        if data_template is not None:
            payload["data"] = data_template
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(payload)),
        )
        restored = out["state"]
        return restored["state"], restored.get("data"), step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        """Step of the best checkpoint by the tracked metric (None if no
        checkpoint has reported it yet) — the `checkpoint_best` analog."""
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params_npz(path: str, params) -> None:
    """Flat .npz export of a params tree (host-side, for converters/evals)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Inverse of save_params_npz."""
    flat = dict(np.load(path))
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree
