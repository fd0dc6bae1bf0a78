"""Masked pseudo-label prediction pretraining: HuBERT / WavLM / ILS / SAT.

One model covers the whole family via HubertPretrainConfig:
  * HuBERT / fairseq-WavLM: cosine-sim logits vs learned label embeddings at
    the final layer (reference src/fairseq/models/wavlm/wavlm.py:426-438,
    525-570; hubert/hubert.py:363-375).
  * ILS-HuBERT: the same loss at multiple `predict_layers`
    (src/fairseq/models/hubert/ils_hubert.py:200-270).
  * UniSpeech-SAT: adds a speaker-contrastive BCE branch on a tapped
    intermediate layer (src/fairseq/models/unispeech_sat/
    unispeech_sat.py:699-758).

TPU reformulation (key design departure, same math):
  * The reference gathers masked frames (`x[masked_indices]`) then builds
    (S, num_classes+1) logits where column 0 duplicates the target class and
    the duplicate among the negatives is -inf'd. Softmax over
    [cos_t] ∪ [cos_c : c != t] is *identical* to softmax over all classes
    with label t — so we compute dense (B, T, C) cosine logits (one MXU
    matmul vs the whole embedding table) and weight the CE by
    masked/unmasked validity. No dynamic shapes, no gathers.
  * Targets arrive already frame-aligned from the input pipeline (the
    reference's forward_targets label-rate resampling, wavlm.py:440-451,
    runs host-side in data/labels.py with identical index arithmetic).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import HubertPretrainConfig, WavLMModelConfig
from unispeech_tpu.models.wavlm import WavLM
from unispeech_tpu.ops.quantizer import GumbelVectorQuantizer


def cosine_logits(
    x: jax.Array,  # (..., D) projected features
    embs: jax.Array,  # (C, D) label embeddings
    logit_temp: float,
) -> jax.Array:
    """Dense cosine-similarity logits in fp32 (reference compute_nce,
    src/fairseq/models/wavlm/wavlm.py:426-438)."""
    xf = x.astype(jnp.float32)
    ef = embs.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + 1e-12)
    en = ef * jax.lax.rsqrt(jnp.sum(ef * ef, -1, keepdims=True) + 1e-12)
    return (xn @ en.T) / logit_temp


def sample_instance_indices(
    r_same: jax.Array,
    r_cross: jax.Array,
    lengths: jax.Array,  # (B,) valid frame counts
    T: int,
    n_same: int,
    n_cross: int,
) -> jax.Array:
    """Flat (B*T)-indices of contrastive instances, (B, T, n_same+n_cross).

    Padding-frame-free replacement for the reference's masked-frame pool
    (src/fairseq/models/unispeech_sat/unispeech_sat.py:487-543): per query
    frame (b, t), `n_same` draws uniform over row b's valid positions != t
    (the reference's +1 skip trick) and `n_cross` draws uniform over the
    batch's valid frames != (b, t) via rank arithmetic on exclusive
    cumulative lengths. Never returns an index into padding.
    """
    B = lengths.shape[0]
    t_pos = jnp.arange(T, dtype=jnp.int32)[None, :]  # (1, T)
    idx_parts = []
    if n_same > 0:
        hi = jnp.maximum(lengths - 1, 1)[:, None, None]  # (B,1,1)
        u = jax.random.uniform(r_same, (B, T, n_same))
        r = (u * hi).astype(jnp.int32)
        r = r + (r >= t_pos[..., None])
        r = jnp.minimum(r, jnp.maximum(lengths[:, None, None] - 1, 0))
        base = (jnp.arange(B, dtype=jnp.int32) * T)[:, None, None]
        idx_parts.append(base + r)
    if n_cross > 0:
        cum = jnp.cumsum(lengths)  # (B,) inclusive
        cum_ex = cum - lengths  # exclusive
        total = cum[-1]
        self_rank = cum_ex[:, None] + t_pos  # (B, T) rank if t valid
        u = jax.random.uniform(r_cross, (B, T, n_cross))
        j = (u * jnp.maximum(total - 1, 1)).astype(jnp.int32)
        j = j + (j >= self_rank[..., None])
        j = jnp.minimum(j, jnp.maximum(total - 1, 0))
        row = (
            jnp.searchsorted(cum, j.reshape(-1), side="right")
            .astype(jnp.int32)
            .reshape(B, T, n_cross)
        )
        offset = j - cum_ex[row]
        idx_parts.append(row * T + offset)
    return jnp.concatenate(idx_parts, axis=-1)


class GLUProj(nn.Module):
    """target_glu: Linear(d, 2d) + GLU (sigmoid gate)
    (src/fairseq/models/wavlm/wavlm.py:322-326)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features * 2, dtype=self.dtype, param_dtype=jnp.float32)(x)
        a, b = y[..., : self.features], y[..., self.features :]
        return a * jax.nn.sigmoid(b)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HubertOutput:
    # logits[(layer, label_set)] -> (B, T, C_set) fp32 cosine logits
    logits: Dict
    targets: Optional[jax.Array]  # (B, T, num_sets) as passed in
    mask_indices: Optional[jax.Array]  # (B, T)
    padding_mask: Optional[jax.Array]  # (B, T)
    features_pen: jax.Array
    x: jax.Array  # final encoder output
    layer_outputs: Optional[jax.Array]
    # SAT speaker-contrastive branch
    spk_logits: Optional[jax.Array] = None  # (B, T, 1+N) fp32
    spk_targets: Optional[jax.Array] = None  # (B, T, 1+N) {0,1}
    vq_result: Optional[dict] = None


class HubertPretrainModel(nn.Module):
    cfg: HubertPretrainConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        source: jax.Array,  # (B, T_samples)
        targets: Optional[jax.Array] = None,  # (B, T_frames, num_sets) int32
        lengths: Optional[jax.Array] = None,
        mask: bool = True,
        deterministic: bool = True,
        num_updates: jax.Array | int = 0,
        features_only: bool = False,
        output_layer: Optional[int] = None,
    ) -> HubertOutput:
        cfg = self.cfg
        D = cfg.encoder.encoder_embed_dim
        num_sets = len(cfg.num_classes)
        predict_layers = tuple(cfg.predict_layers) or (cfg.encoder.encoder_layers,)
        need_taps = (
            len(predict_layers) > 1
            or predict_layers[0] != cfg.encoder.encoder_layers
            or cfg.utterance_contrastive_loss
        )

        backbone = WavLM(
            WavLMModelConfig(
                encoder=cfg.encoder,
                time_mask=cfg.time_mask,
                channel_mask=cfg.channel_mask,
            ),
            dtype=self.dtype,
            name="wavlm",
        )
        out = backbone(
            source,
            lengths=lengths,
            mask=mask,
            deterministic=deterministic,
            collect_layer_outputs=need_taps,
            output_layer=output_layer,
        )
        if features_only:
            return HubertOutput(
                logits={},
                targets=targets,
                mask_indices=out.mask_indices,
                padding_mask=out.padding_mask,
                features_pen=out.features_pen,
                x=out.x,
                layer_outputs=out.layer_outputs,
            )

        final_dim = cfg.final_dim

        def tap(p: int) -> jax.Array:
            """Output of 1-based layer p (layer_outputs[j] = input to layer j;
            layer_outputs[L] = final)."""
            if out.layer_outputs is not None:
                return out.layer_outputs[p]
            assert p == cfg.encoder.encoder_layers
            return out.x

        # label embeddings
        total_classes = sum(cfg.num_classes)
        if cfg.separate_label_embeds or cfg.separate_layer_targets:
            n_tables = len(predict_layers)
        else:
            n_tables = 1
        label_embs = self.param(
            "label_embs_concat",
            nn.initializers.uniform(scale=1.0),
            (n_tables, total_classes, final_dim)
            if n_tables > 1
            else (total_classes, final_dim),
            jnp.float32,
        )

        glu = (
            GLUProj(final_dim, dtype=self.dtype, name="target_glu")
            if cfg.target_glu
            else None
        )

        proj_out_dim = final_dim * (num_sets if cfg.untie_final_proj else 1)
        offsets = [0]
        for c in cfg.num_classes:
            offsets.append(offsets[-1] + c)

        if cfg.separate_label_embeds:
            projs = [
                nn.Dense(
                    proj_out_dim,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"final_proj_{li}",
                )
                for li in range(len(predict_layers))
            ]
        else:
            shared = nn.Dense(
                proj_out_dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="final_proj",
            )
            projs = [shared] * len(predict_layers)

        logits: Dict = {}
        for li, p in enumerate(predict_layers):
            h = tap(p)
            px = projs[li](h)  # (B, T, proj_out_dim)
            table = label_embs[li] if n_tables > 1 else label_embs
            for si in range(num_sets):
                if cfg.separate_layer_targets:
                    embs = table[: cfg.num_classes[si]]
                else:
                    embs = table[offsets[si] : offsets[si + 1]]
                if cfg.untie_final_proj:
                    px_s = px[..., si * final_dim : (si + 1) * final_dim]
                else:
                    px_s = px
                if glu is not None:
                    embs = glu(embs)
                logits[(p, si)] = cosine_logits(px_s, embs, cfg.logit_temp)

        spk_logits = spk_targets = vq_result = None
        if cfg.utterance_contrastive_loss:
            spk_logits, spk_targets, vq_result = self._speaker_contrastive(
                tap(cfg.utterance_contrastive_layer),
                out.padding_mask,
                num_updates,
                deterministic,
                glu,
            )

        return HubertOutput(
            logits=logits,
            targets=targets,
            mask_indices=out.mask_indices,
            padding_mask=out.padding_mask,
            features_pen=out.features_pen,
            x=out.x,
            layer_outputs=out.layer_outputs if need_taps else None,
            spk_logits=spk_logits,
            spk_targets=spk_targets,
            vq_result=vq_result,
        )

    def _speaker_contrastive(
        self, spk_x, padding_mask, num_updates, deterministic, glu
    ):
        """UniSpeech-SAT utterance/speaker contrastive branch.

        Reference: src/fairseq/models/unispeech_sat/unispeech_sat.py:699-758.
        For each (masked) frame: positive target is its own projected (or
        quantized) representation; N instances are drawn from the batch, each
        labeled 1 if it comes from the same utterance. BCE over cosine/temp
        logits. Departure (documented): the instance pool is all *valid*
        frames rather than only masked frames (the reference's masked-only
        pool relies on equalized per-row mask counts for a dense reshape; the
        label semantics — same-utterance vs not — are unchanged). Padding
        frames are never sampled: same-utterance draws are uniform over the
        row's valid length, cross-batch draws are uniform over the batch's
        total valid frames via cumulative-length rank arithmetic. The loss
        itself is still evaluated only at masked frames via loss weights.
        """
        cfg = self.cfg
        B, T, D = spk_x.shape
        final_dim = cfg.final_dim

        if padding_mask is None:
            lengths = jnp.full((B,), T, jnp.int32)
        else:
            lengths = (~padding_mask).sum(-1).astype(jnp.int32)

        if cfg.encoder.layer_norm_first:
            from unispeech_tpu.models.encoder import Fp32LayerNorm

            spk_x = Fp32LayerNorm(
                eps=cfg.encoder.layer_norm_eps, name="layer_norm_for_extract"
            )(spk_x)

        proj_x = nn.Dense(
            final_dim, dtype=self.dtype, param_dtype=jnp.float32, name="spk_proj"
        )(spk_x)

        vq_result = None
        if cfg.quantize_targets:
            vq = GumbelVectorQuantizer(
                cfg.quantizer, D, dtype=self.dtype, name="quantizer"
            )
            vq_result = vq(
                spk_x, num_updates=num_updates, deterministic=deterministic
            )
            y = nn.Dense(
                final_dim, dtype=self.dtype, param_dtype=jnp.float32, name="project_q"
            )(vq_result["x"])
        else:
            y = proj_x

        if glu is not None:
            y = glu(y)

        n_same = cfg.num_instances
        n_cross = cfg.cross_sample_instances
        N = n_same + n_cross
        rng = self.make_rng("instances")
        r_same, r_cross = jax.random.split(rng)

        # flat pool of valid candidate instances; indices are non-diff but
        # gradients flow through the gathered instances (reference gathers
        # outside no_grad, unispeech_sat.py:538)
        y_flat = y.reshape(B * T, -1)
        row_of = jnp.repeat(jnp.arange(B, dtype=jnp.int32), T)
        idx = sample_instance_indices(
            r_same, r_cross, lengths, T, n_same, n_cross
        )  # (B, T, N) flat indices into (B*T)

        instances = y_flat[idx.reshape(-1)].reshape(B, T, N, -1)
        inst_rows = row_of[idx.reshape(-1)].reshape(B, T, N)
        same_utt = (inst_rows == jnp.arange(B, dtype=jnp.int32)[:, None, None]).astype(
            jnp.float32
        )

        # logits: [own target; instances], cosine / temp, fp32
        px = proj_x.astype(jnp.float32)
        pxn = px * jax.lax.rsqrt(jnp.sum(px * px, -1, keepdims=True) + 1e-12)
        tgts = jnp.concatenate(
            [y.astype(jnp.float32)[:, :, None, :], instances.astype(jnp.float32)],
            axis=2,
        )  # (B, T, 1+N, D)
        tn = tgts * jax.lax.rsqrt(jnp.sum(tgts * tgts, -1, keepdims=True) + 1e-12)
        spk_logits = jnp.einsum("btd,btnd->btn", pxn, tn) / cfg.logit_temp

        spk_targets = jnp.concatenate(
            [jnp.ones((B, T, 1), jnp.float32), same_utt], axis=-1
        )
        return spk_logits, spk_targets, vq_result
