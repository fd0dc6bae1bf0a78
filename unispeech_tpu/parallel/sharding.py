"""Mesh + parameter partitioning rules (GSPMD).

Replaces the reference's whole distributed layer (§2.4 of SURVEY.md:
DDP/LegacyDDP/FSDP/ZeRO wrappers + NCCL bootstrap, src/fairseq/distributed/)
with a single-controller SPMD design:

  * mesh axes: ('data', 'model'). Pure DP = model-axis size 1. FSDP/ZeRO-3 =
    parameter sharding over 'data'. Tensor parallel = ffn/head sharding over
    'model'. Gradient reduction is whatever GSPMD inserts for the batch-dim
    sharding — psum over ICI, exactly where NCCL all-reduce sat.
  * rules are path/shape based (t5x-style) so models need no partitioning
    annotations inline.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# (path regex, spec) — first match wins. Specs refer to kernel layouts:
# Dense kernels are (in, out); conv kernels (k, in, out).
_TP_RULES = [
    # FFN: split the wide dim over 'model'
    (r".*fc1/kernel$", P(None, "model")),
    (r".*fc1/bias$", P("model")),
    (r".*fc1/linear/kernel$", P(None, "model")),
    (r".*fc1/linear/bias$", P("model")),
    (r".*fc2/kernel$", P("model", None)),
    # attention: split heads (out dim of q/k/v, in dim of out_proj)
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*out_proj/kernel$", P("model", None)),
]


def _fsdp_axis(shape: tuple, n_data: int) -> Optional[int]:
    """Pick the largest axis divisible by the data-axis size, else None."""
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] >= n_data and shape[i] % n_data == 0:
            return i
    return None


def param_pspec(
    path: str,
    shape: tuple,
    tensor_parallel: bool,
    fsdp: bool,
    n_data: int,
    min_fsdp_size: int = 2**16,
) -> P:
    """PartitionSpec for one parameter."""
    spec = [None] * len(shape)
    if tensor_parallel:
        for pat, rule in _TP_RULES:
            if re.match(pat, path):
                # right-align: rules are written for the trailing (in, out)
                # dims so they also cover nn.scan-stacked params (L, in, out)
                pad = len(shape) - len(rule)
                spec = [None] * max(pad, 0) + list(rule)[max(-pad, 0) :]
                break
    if fsdp and int(np.prod(shape)) >= min_fsdp_size:
        # ZeRO-3-style: additionally shard the largest free axis over 'data'
        for i in _fsdp_candidates(shape, n_data):
            if spec[i] is None:
                spec[i] = "data"
                break
    return P(*spec)


def _fsdp_candidates(shape, n_data):
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    return [i for i in order if shape[i] >= n_data and shape[i] % n_data == 0]


def params_shardings(
    params,
    mesh: Mesh,
    tensor_parallel: bool = False,
    fsdp: bool = False,
    min_fsdp_size: int = 2**16,
):
    """NamedSharding pytree for a params pytree."""
    n_data = mesh.shape["data"]

    def one(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path_tuple)
        spec = param_pspec(
            path, leaf.shape, tensor_parallel, fsdp, n_data, min_fsdp_size
        )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, n_stack: int = 0):
    """Batch-axis sharding for input arrays.

    n_stack: number of leading microbatch-stacking axes (accum and/or
    inner-step grouping, train/loop.py) BEFORE the true batch axis — those
    are scan axes and must stay unsharded; only the batch axis shards over
    'data'.
    """
    return NamedSharding(mesh, P(*([None] * n_stack), "data"))
