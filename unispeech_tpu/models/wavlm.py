"""WavLM model: conv frontend + transformer encoder + masking.

The inference/feature-extraction parity target
(/root/reference/WavLM/WavLM.py:220-375). Pretraining heads (HuBERT-style
masked prediction etc.) build on top in models/hubert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import WavLMModelConfig
from unispeech_tpu.models.encoder import (
    ConvFeatureExtractor,
    Fp32LayerNorm,
    TransformerEncoder,
    grad_multiply,
)
from unispeech_tpu.ops.masking import (
    apply_channel_mask,
    apply_time_mask,
    frame_padding_mask,
    sample_span_mask,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WavLMOutput:
    x: jax.Array  # (B, T, D) encoder output
    features: jax.Array  # (B, T, D) post-projection pre-mask features
    conv_features: jax.Array  # (B, T, C) post-LN conv features
    padding_mask: Optional[jax.Array]  # (B, T) True = pad
    mask_indices: Optional[jax.Array]  # (B, T) True = masked
    layer_outputs: Optional[jax.Array]  # (L+1, B, T, D)
    features_pen: Optional[jax.Array] = None  # scalar: mean of squared raw conv feats


class WavLM(nn.Module):
    """Parity: /root/reference/WavLM/WavLM.py:220 (class WavLM)."""

    cfg: WavLMModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        source: jax.Array,  # (B, T_samples) waveform
        lengths: Optional[jax.Array] = None,  # (B,) valid sample counts
        mask: bool = False,
        deterministic: bool = True,
        collect_layer_outputs: bool = False,
        output_layer: Optional[int] = None,
        attn_mask: Optional[jax.Array] = None,  # (T, S) additive streaming
        # mask hook (reference streaming_mask, wavlm.py:698,730); build with
        # ops.masking.make_streaming_mask
        boundary_mask: Optional[jax.Array] = None,  # (B, T_frames) precomputed
        # span mask overriding the sampler (reference boundary_mask,
        # wavlm.py:360-377; segments drawn host-side or via
        # ops.masking.sample_boundary_mask)
    ) -> WavLMOutput:
        enc_cfg = self.cfg.encoder
        embed = enc_cfg.conv_layers[-1][0]
        D = enc_cfg.encoder_embed_dim

        if enc_cfg.normalize:
            # per-utterance zero-mean unit-var over valid samples
            # (reference normalizes on the host; task cfg `normalize=True`)
            if lengths is None:
                mean = source.mean(-1, keepdims=True)
                var = source.var(-1, keepdims=True)
            else:
                valid = (
                    jnp.arange(source.shape[1])[None, :] < lengths[:, None]
                ).astype(source.dtype)
                n = jnp.maximum(lengths.astype(source.dtype), 1.0)[:, None]
                mean = (source * valid).sum(-1, keepdims=True) / n
                var = (((source - mean) * valid) ** 2).sum(-1, keepdims=True) / n
            source = (source - mean) * jax.lax.rsqrt(var + 1e-5)
            if lengths is not None:
                source = jnp.where(
                    jnp.arange(source.shape[1])[None, :] < lengths[:, None],
                    source,
                    0.0,
                )

        feats = ConvFeatureExtractor(enc_cfg, dtype=self.dtype, name="feature_extractor")(
            source
        )
        if enc_cfg.feature_grad_mult != 1.0:
            if enc_cfg.feature_grad_mult > 0:
                feats = grad_multiply(feats, enc_cfg.feature_grad_mult)
            else:
                feats = jax.lax.stop_gradient(feats)

        padding_mask = None
        if lengths is not None:
            padding_mask = frame_padding_mask(
                lengths, source.shape[1], feats.shape[1]
            )

        # L2 penalty on raw conv features (reference features_pen,
        # src/fairseq/models/wavlm/wavlm.py:486) — fp32, over VALID frames
        # only (the reference's crops are unpadded; averaging over bucket
        # padding would make the penalty depend on the bucket shape)
        sq = feats.astype(jnp.float32) ** 2
        if padding_mask is None:
            features_pen = jnp.mean(sq)
        else:
            valid = (~padding_mask).astype(jnp.float32)[..., None]
            features_pen = jnp.sum(sq * valid) / jnp.maximum(
                jnp.sum(valid) * feats.shape[-1], 1.0
            )

        conv_features = Fp32LayerNorm(eps=enc_cfg.layer_norm_eps, name="layer_norm")(
            feats
        )

        if embed != D:
            features = nn.Dense(
                D, dtype=self.dtype, param_dtype=jnp.float32, name="post_extract_proj"
            )(conv_features)
        else:
            features = conv_features

        if enc_cfg.dropout_input > 0.0 and not deterministic:
            features = nn.Dropout(rate=enc_cfg.dropout_input, deterministic=False)(
                features
            )

        mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(scale=1.0),
            (D,),
            jnp.float32,
        )

        mask_indices = None
        x = features
        if mask and boundary_mask is not None:
            # boundary-aligned masking (wavlm.py:360-377): spans precomputed
            # from phone/word boundaries replace the span sampler
            mask_indices = boundary_mask.astype(bool)
            if padding_mask is not None:
                mask_indices = mask_indices & ~padding_mask
            x = apply_time_mask(features, mask_indices, mask_emb)
        elif mask and self.cfg.time_mask.mask_prob > 0:
            B, T = features.shape[:2]
            frame_lengths = None
            if padding_mask is not None:
                frame_lengths = (~padding_mask).sum(-1)
            mask_indices = sample_span_mask(
                self.make_rng("mask"), B, T, self.cfg.time_mask, frame_lengths
            )
            x = apply_time_mask(features, mask_indices, mask_emb)
        if mask and self.cfg.channel_mask.mask_prob > 0:
            B, _, C = features.shape
            ch_mask = sample_span_mask(
                self.make_rng("mask"), B, C, self.cfg.channel_mask, None
            )
            x = apply_channel_mask(x, ch_mask)

        enc_out = TransformerEncoder(enc_cfg, dtype=self.dtype, name="encoder")(
            x,
            padding_mask=padding_mask,
            deterministic=deterministic,
            collect_layer_outputs=collect_layer_outputs,
            output_layer=output_layer,
            attn_mask=attn_mask,
        )

        return WavLMOutput(
            x=enc_out.x,
            features=features,
            conv_features=conv_features,
            padding_mask=padding_mask,
            mask_indices=mask_indices,
            layer_outputs=enc_out.layer_outputs,
            features_pen=features_pen,
        )

    def extract_features(
        self,
        source: jax.Array,
        lengths: Optional[jax.Array] = None,
        output_layer: Optional[int] = None,
        collect_layer_outputs: bool = False,
    ) -> WavLMOutput:
        """Inference-mode feature extraction
        (reference WavLM.extract_features, WavLM.py:323-375)."""
        return self(
            source,
            lengths=lengths,
            mask=False,
            deterministic=True,
            collect_layer_outputs=collect_layer_outputs,
            output_layer=output_layer,
        )
