"""ECAPA-TDNN speaker verification head on frozen SSL features.

Reference behavior: /root/reference/downstreams/speaker_verification/models/
ecapa_tdnn.py:163-291 (ECAPA_TDNN_SMALL over `feature_selection=
"hidden_states"` — a learnable weighted sum of all encoder layer outputs)
and verification.py:36-62 (cosine-similarity trial scoring).

flax implementation, (B, T, C) layout; convs are 1D over time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class WeightedLayerSum(nn.Module):
    """Softmax-weighted sum over (L, B, T, D) layer features
    (ecapa_tdnn.py:239-252 — s3prl Featurizer equivalent)."""

    @nn.compact
    def __call__(self, layer_feats: jax.Array) -> jax.Array:
        L = layer_feats.shape[0]
        w = self.param("weights", nn.initializers.zeros, (L,), jnp.float32)
        w = jax.nn.softmax(w)
        return jnp.einsum("l,lbtd->btd", w, layer_feats.astype(jnp.float32))


class TdnnBn(nn.Module):
    """Conv1d + ReLU + BatchNorm1d (ecapa_tdnn.py:24).

    Real running-stats BatchNorm so reference checkpoints (mean/var/affine)
    import 1:1: stats over (batch, time) per channel, torch momentum 0.1 ==
    flax momentum 0.9. Training mutates the "batch_stats" collection;
    inference uses the running averages.
    """

    features: int
    kernel: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class SEBlock(nn.Module):
    """Squeeze-excitation over channels (ecapa_tdnn.py:56-75)."""

    bottleneck: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=1, keepdims=True)  # (B, 1, C)
        s = nn.relu(nn.Dense(self.bottleneck, dtype=self.dtype,
                             param_dtype=jnp.float32)(s))
        s = jax.nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype,
                                    param_dtype=jnp.float32)(s))
        return x * s


class Res2NetBlock(nn.Module):
    """Res2Net multi-scale conv (ecapa_tdnn.py:28-53): split channels into
    `scale` groups; group i is convolved after summing group i-1's output."""

    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        assert C % self.scale == 0
        w = C // self.scale
        parts = jnp.split(x, self.scale, axis=-1)
        outs = [parts[0]]
        y = None
        for i in range(1, self.scale):
            inp = parts[i] if y is None else parts[i] + y
            y = nn.Conv(
                w, kernel_size=(self.kernel,), kernel_dilation=(self.dilation,),
                padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(inp)
            y = nn.relu(y)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class SERes2NetBlock(nn.Module):
    """TDNN -> Res2Net -> TDNN -> SE with residual (ecapa_tdnn.py:78-117)."""

    features: int
    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = x
        h = TdnnBn(self.features, 1, 1, dtype=self.dtype, train=self.train)(x)
        h = Res2NetBlock(self.kernel, self.dilation, self.scale, dtype=self.dtype)(h)
        h = TdnnBn(self.features, 1, 1, dtype=self.dtype, train=self.train)(h)
        h = SEBlock(dtype=self.dtype)(h)
        if res.shape[-1] != self.features:
            res = nn.Conv(self.features, (1,), dtype=self.dtype,
                          param_dtype=jnp.float32)(res)
        return h + res


class AttentiveStatsPool(nn.Module):
    """Attention-weighted mean+std pooling (ecapa_tdnn.py:120-143)."""

    bottleneck: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, padding_mask: Optional[jax.Array] = None):
        # global context: mean/std over time appended to each frame
        a = jnp.tanh(nn.Conv(self.bottleneck, (1,), dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        a = nn.Conv(x.shape[-1], (1,), dtype=self.dtype, param_dtype=jnp.float32)(a)
        if padding_mask is not None:
            a = jnp.where(padding_mask[..., None], -1e9, a)
        w = jax.nn.softmax(a.astype(jnp.float32), axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * x**2, axis=1) - mean**2
        std = jnp.sqrt(jnp.clip(var, 1e-9))
        return jnp.concatenate([mean, std], axis=-1)


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    channels: int = 512
    emb_dim: int = 192
    scale: int = 8
    num_layer_feats: int = 13  # L+1 encoder taps for the weighted sum


class EcapaTdnn(nn.Module):
    """ECAPA-TDNN-small over SSL layer features (ecapa_tdnn.py:163-291)."""

    cfg: EcapaConfig = EcapaConfig()
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(
        self,
        layer_feats: jax.Array,  # (L, B, T, D) encoder layer outputs
        padding_mask: Optional[jax.Array] = None,  # (B, T)
    ) -> jax.Array:
        cfg = self.cfg
        tr = self.train
        x = WeightedLayerSum(name="featurizer")(layer_feats)
        if padding_mask is not None:
            x = jnp.where(padding_mask[..., None], 0.0, x)
        C = cfg.channels
        h1 = TdnnBn(C, kernel=5, dtype=self.dtype, train=tr, name="layer1")(x)
        h2 = SERes2NetBlock(C, 3, 2, cfg.scale, dtype=self.dtype, train=tr, name="layer2")(h1)
        h3 = SERes2NetBlock(C, 3, 3, cfg.scale, dtype=self.dtype, train=tr, name="layer3")(h2)
        h4 = SERes2NetBlock(C, 3, 4, cfg.scale, dtype=self.dtype, train=tr, name="layer4")(h3)
        cat = jnp.concatenate([h2, h3, h4], axis=-1)
        h = nn.relu(nn.Conv(C * 3, (1,), dtype=self.dtype,
                            param_dtype=jnp.float32, name="mfa")(cat))
        pooled = AttentiveStatsPool(dtype=self.dtype, name="pool")(h, padding_mask)
        pooled = nn.LayerNorm(param_dtype=jnp.float32, name="pool_norm")(pooled)
        emb = nn.Dense(cfg.emb_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="embedding")(pooled)
        return emb  # (B, emb_dim)


def cosine_score(emb1: jax.Array, emb2: jax.Array) -> jax.Array:
    """Trial scoring (verification.py:52-58)."""
    a = emb1 / jnp.linalg.norm(emb1, axis=-1, keepdims=True)
    b = emb2 / jnp.linalg.norm(emb2, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


def compute_eer(scores, labels):
    """Equal error rate over trial scores (labels 1=same speaker)."""
    import numpy as np

    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    order = np.argsort(-scores)
    labels = labels[order]
    tp = np.cumsum(labels)
    fp = np.cumsum(1 - labels)
    fnr = 1.0 - tp / max(tp[-1], 1)
    fpr = fp / max(fp[-1], 1)
    i = np.nanargmin(np.abs(fnr - fpr))
    return float((fnr[i] + fpr[i]) / 2)
