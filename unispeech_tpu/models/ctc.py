"""CTC fine-tuning heads for the whole family (ASR path).

Reference behavior: HubertCtc / HubertEncoder
(/root/reference/src/fairseq/models/hubert/hubert_asr.py:139-373) and
Wav2VecCtc (/root/reference/src/fairseq/models/wav2vec/wav2vec2_asr.py:162) —
both wrap a pretrained encoder, apply SpecAugment-style masking during
training, gate encoder gradients for the first `freeze_finetune_updates`
steps, and project to the vocab.

TPU reformulation:
  * freeze_finetune_updates is a traced step comparison: the encoder output
    is `where(step < n, stop_gradient(h), h)` — one compiled graph serves
    both phases (the reference re-enters a no_grad context per step,
    hubert_asr.py:357-364).
  * warm-starting from a pretrained checkpoint is a host-side param-tree
    graft (see `load_pretrained_into`), replacing fairseq's
    load_checkpoint_to_cpu + component loading (hubert_asr.py:258-276).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import EncoderConfig, MaskConfig, WavLMModelConfig
from unispeech_tpu.models.wavlm import WavLM


@dataclass(frozen=True)
class CtcFinetuneConfig:
    """Mirrors HubertAsrConfig fields (hubert_asr.py:33-130)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    vocab_size: int = 32  # len(letter dict); blank = index 0 (ctc.py:69-73)
    # SpecAugment-style masking applied to *features* during fine-tune
    apply_mask: bool = True
    time_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.65, mask_length=10)
    )
    channel_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.5, mask_length=64, min_masks=0)
    )
    final_dropout: float = 0.0
    freeze_finetune_updates: int = 0
    # conv frontend always frozen during fine-tune (feature_grad_mult=0,
    # hubert_asr.py recipe default)
    feature_grad_mult: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CtcOutput:
    logits: jax.Array  # (B, T, V) fp32
    padding_mask: Optional[jax.Array]  # (B, T) True = pad
    frame_lengths: jax.Array  # (B,) int32 valid frames


class CtcFinetuneModel(nn.Module):
    cfg: CtcFinetuneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        source: jax.Array,  # (B, n_samples)
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
        step: jax.Array | int = 0,
    ) -> CtcOutput:
        cfg = self.cfg
        enc = dataclasses.replace(cfg.encoder, feature_grad_mult=cfg.feature_grad_mult)
        backbone = WavLM(
            WavLMModelConfig(
                encoder=enc,
                time_mask=cfg.time_mask,
                channel_mask=cfg.channel_mask,
            ),
            dtype=self.dtype,
            name="wavlm",
        )
        out = backbone(
            source,
            lengths=lengths,
            mask=cfg.apply_mask and not deterministic,
            deterministic=deterministic,
        )
        h = out.x
        # freeze gate: no encoder gradients before freeze_finetune_updates
        if cfg.freeze_finetune_updates > 0:
            frozen = jnp.asarray(step) < cfg.freeze_finetune_updates
            h = jnp.where(frozen, jax.lax.stop_gradient(h), h)
        if cfg.final_dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=cfg.final_dropout, deterministic=False)(h)
        logits = nn.Dense(
            cfg.vocab_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(h).astype(jnp.float32)

        if out.padding_mask is not None:
            frame_lengths = jnp.sum(~out.padding_mask, axis=-1).astype(jnp.int32)
        else:
            frame_lengths = jnp.full((source.shape[0],), h.shape[1], jnp.int32)
        return CtcOutput(
            logits=logits, padding_mask=out.padding_mask, frame_lengths=frame_lengths
        )


def load_pretrained_into(finetune_params, pretrain_params):
    """Graft a pretrained model's backbone params into a fine-tune tree.

    Both trees carry the backbone under key 'wavlm' (HubertPretrainModel,
    Wav2Vec2PretrainModel and CtcFinetuneModel all name it that); pretraining
    heads (final_proj, label_embs, quantizer, ...) are dropped — the
    reference's remove_pretraining_modules + component load
    (hubert_asr.py:262-276, wavlm.py:599-627).
    """
    import flax

    ft = flax.core.unfreeze(finetune_params)
    pt = flax.core.unfreeze(pretrain_params)
    src = pt["wavlm"] if "wavlm" in pt else pt

    def graft(dst, src):
        out = {}
        for k, v in dst.items():
            if k in src:
                if isinstance(v, dict):
                    out[k] = graft(v, src[k])
                else:
                    assert v.shape == src[k].shape, (k, v.shape, src[k].shape)
                    out[k] = src[k]
            else:
                out[k] = v
        return out

    ft["wavlm"] = graft(ft["wavlm"], src)
    return flax.core.freeze(ft) if hasattr(finetune_params, "unfreeze") else ft
