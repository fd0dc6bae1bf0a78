"""wav2vec 2.0 contrastive pretraining + the UniSpeech multitask head.

Reference behavior: /root/reference/src/fairseq/models/wav2vec/wav2vec2.py:275
(Wav2Vec2Model) and /root/reference/src/fairseq/models/unispeech/
unispeech.py:37 (Unispeech wrapper: contrastive + phonetic CTC with
quantizer-output replacement).

TPU reformulation (same math, static shapes):
  * The reference gathers masked frames before computing contrastive logits
    (`x[mask_indices].view(B,-1,D)`, wav2vec2.py:676-696) — its own XLA path
    already keeps full frames instead. We compute (B, T, 1+N) logits at all
    frames and weight the InfoNCE loss by the mask.
  * Negatives are drawn uniformly from *valid masked* frames via categorical
    sampling over mask weights (reference: uniform over the gathered masked
    set, wav2vec2.py:474-530); with negatives_from_everywhere (the UniSpeech
    recipe default) the pool is all valid frames. Self-draws and codeword
    collisions are removed the reference's way: any negative whose quantized
    codeword ids equal the positive's is -inf'd (compute_preds
    neg_is_pos, wav2vec2.py:533-553).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import Wav2Vec2PretrainConfig, WavLMModelConfig
from unispeech_tpu.models.wavlm import WavLM
from unispeech_tpu.ops.quantizer import GumbelVectorQuantizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Wav2Vec2Output:
    contrastive_logits: Optional[jax.Array]  # (B, T, 1+N) fp32, col 0 = pos
    mask_indices: Optional[jax.Array]  # (B, T)
    padding_mask: Optional[jax.Array]  # (B, T)
    features_pen: jax.Array
    vq_result: Optional[dict]
    x: jax.Array  # encoder output (B, T, D)
    ctc_logits: Optional[jax.Array] = None  # (B, T, vocab) UniSpeech head
    q_stream: Optional[jax.Array] = None  # (B, T, D) projected quantized stream


class Wav2Vec2PretrainModel(nn.Module):
    cfg: Wav2Vec2PretrainConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        source: jax.Array,
        lengths: Optional[jax.Array] = None,
        mask: bool = True,
        deterministic: bool = True,
        num_updates: jax.Array | int = 0,
        features_only: bool = False,
    ) -> Wav2Vec2Output:
        cfg = self.cfg
        D = cfg.encoder.encoder_embed_dim
        final_dim = cfg.final_dim

        backbone = WavLM(
            WavLMModelConfig(
                encoder=cfg.encoder,
                time_mask=cfg.time_mask,
                channel_mask=cfg.channel_mask,
            ),
            dtype=self.dtype,
            name="wavlm",
        )
        out = backbone(source, lengths=lengths, mask=mask, deterministic=deterministic)
        if features_only:
            return Wav2Vec2Output(
                contrastive_logits=None,
                mask_indices=out.mask_indices,
                padding_mask=out.padding_mask,
                features_pen=out.features_pen,
                vq_result=None,
                x=out.x,
            )

        # quantizer stream: unmasked conv features (post-LN, pre-proj)
        # with dropout_features (wav2vec2.py:580-591)
        unmasked = out.conv_features
        if cfg.encoder.dropout_features > 0.0 and not deterministic:
            unmasked = nn.Dropout(
                rate=cfg.encoder.dropout_features, deterministic=False
            )(unmasked)

        vq_result = None
        vq_ids = None
        cb_negs = None
        cb_ids = None
        project_q = nn.Dense(
            final_dim, dtype=self.dtype, param_dtype=jnp.float32,
            name="project_q",
        )
        if cfg.quantize_targets:
            vq = GumbelVectorQuantizer(
                cfg.quantizer,
                cfg.encoder.conv_layers[-1][0],
                dtype=self.dtype,
                name="quantizer",
            )
            vq_result = vq(
                unmasked,
                num_updates=num_updates,
                deterministic=deterministic,
                produce_targets=True,
            )
            vq_ids = vq_result["targets"]  # (B, T, G)
            y = project_q(vq_result["x"])
            if cfg.codebook_negatives > 0:
                # uniform draws over the per-group codebooks, appended to the
                # sampled negatives (reference wav2vec2.py:669-677 via
                # sample_from_codebook, gumbel_vector_quantizer.py:117-128)
                cw = vq_result["codebook"]  # (G, V, var_dim) fp32
                Gq, Vq, _ = cw.shape
                Bq, Tq = unmasked.shape[:2]
                cb_ids = jax.random.randint(
                    self.make_rng("negatives"),
                    (Bq, Tq, cfg.codebook_negatives, Gq), 0, Vq,
                )
                cb = cw[jnp.arange(Gq)[None, None, None, :], cb_ids]
                cb_negs = project_q(
                    cb.reshape(Bq, Tq, cfg.codebook_negatives, -1)
                    .astype(self.dtype)
                )
        else:
            y = project_q(unmasked)

        x = out.x
        q_stream = None
        if cfg.transpose:
            # UniSpeech mode: project targets up to encoder dim; x unprojected
            # (wav2vec2.py:704-709); also emit the quantized stream `q`
            final_proj = nn.Dense(
                D, dtype=self.dtype, param_dtype=jnp.float32, name="final_proj"
            )
            y = final_proj(y)
            if cb_negs is not None:
                cb_negs = final_proj(cb_negs)
            cx = x
            # reference computes `q` by re-quantizing unmasked_features
            # (wav2vec2.py:652-653); we quantize every frame once, so the
            # projected stream equals the target stream
            q_stream = y
        else:
            cx = nn.Dense(
                final_dim, dtype=self.dtype, param_dtype=jnp.float32, name="final_proj"
            )(x)

        if cfg.target_glu:
            from unispeech_tpu.models.hubert import GLUProj

            glu = GLUProj(y.shape[-1], dtype=self.dtype, name="target_glu")
            y = glu(y)
            if cb_negs is not None:
                cb_negs = glu(cb_negs)

        logits = self._contrastive_logits(
            cx, y, vq_ids, out.mask_indices, out.padding_mask,
            cb_negs=cb_negs, cb_ids=cb_ids,
        )

        ctc_logits = None
        if cfg.ctc_vocab_size > 0:
            # UniSpeech phonetic CTC head with quantizer-replacement trick
            # (unispeech.py:100-118): per-frame Bernoulli(replace_prob)
            # swaps encoder features with the quantized stream before the
            # vocab projection.
            h = x
            if q_stream is not None and cfg.replace_prob > 0 and not deterministic:
                rep = jax.random.bernoulli(
                    self.make_rng("replace"), cfg.replace_prob, h.shape[:2]
                )
                h = jnp.where(rep[..., None], q_stream.astype(h.dtype), h)
            if cfg.final_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=cfg.final_dropout, deterministic=False)(h)
            ctc_logits = nn.Dense(
                cfg.ctc_vocab_size,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="ctc_proj",
            )(h).astype(jnp.float32)

        return Wav2Vec2Output(
            contrastive_logits=logits,
            mask_indices=out.mask_indices,
            padding_mask=out.padding_mask,
            features_pen=out.features_pen,
            vq_result=vq_result,
            x=x,
            ctc_logits=ctc_logits,
            q_stream=q_stream,
        )

    def _contrastive_logits(self, x, y, vq_ids, mask_indices, padding_mask,
                            cb_negs=None, cb_ids=None):
        """(B, T, 1+N) cosine logits: column 0 = positive, rest = negatives
        (sampled negatives, then codebook negatives when configured)."""
        cfg = self.cfg
        B, T, _ = y.shape
        n_same = cfg.num_negatives
        n_cross = cfg.cross_sample_negatives
        N = n_same + n_cross

        valid = (
            jnp.ones((B, T), jnp.float32)
            if padding_mask is None
            else (~padding_mask).astype(jnp.float32)
        )
        if cfg.negatives_from_everywhere or mask_indices is None:
            pool_w = valid
        else:
            pool_w = mask_indices.astype(jnp.float32) * valid

        rng = self.make_rng("negatives")
        r_same, r_cross = jax.random.split(rng)
        pool_logits = jnp.where(pool_w > 0, 0.0, -1e9)  # (B, T)

        idx_parts = []
        if n_same > 0:
            draws = jax.random.categorical(
                r_same, pool_logits[:, None, :], axis=-1, shape=(B, T * n_same)
            )  # (B, T*n_same) in [0, T)
            draws = draws.reshape(B, T, n_same)
            base = (jnp.arange(B, dtype=draws.dtype) * T)[:, None, None]
            idx_parts.append(base + draws)
        if n_cross > 0:
            flat_logits = pool_logits.reshape(1, 1, B * T)
            draws = jax.random.categorical(
                r_cross, flat_logits, axis=-1, shape=(1, B * T * n_cross)
            ).reshape(B, T, n_cross)
            idx_parts.append(draws)
        idx = jnp.concatenate(idx_parts, axis=-1)  # (B, T, N) into flat (B*T)

        y_flat = y.reshape(B * T, -1)
        negs = y_flat[idx.reshape(-1)].reshape(B, T, N, -1)

        # neg_is_pos: negative identical to the positive (same codeword or
        # exact vector match) -> -inf (wav2vec2.py:533-553; fill -2^30 on XLA)
        if vq_ids is not None:
            ids_flat = vq_ids.reshape(B * T, -1)
            neg_ids = ids_flat[idx.reshape(-1)].reshape(B, T, N, -1)
            neg_is_pos = jnp.all(neg_ids == vq_ids[:, :, None, :], axis=-1)
        else:
            neg_is_pos = jnp.all(negs == y[:, :, None, :], axis=-1)

        if cb_negs is not None:
            negs = jnp.concatenate([negs, cb_negs.astype(negs.dtype)], axis=2)
            cb_is_pos = jnp.all(cb_ids == vq_ids[:, :, None, :], axis=-1)
            neg_is_pos = jnp.concatenate([neg_is_pos, cb_is_pos], axis=-1)

        xf = x.astype(jnp.float32)
        xn = xf * jax.lax.rsqrt(jnp.sum(xf * xf, -1, keepdims=True) + 1e-12)
        tgts = jnp.concatenate(
            [y.astype(jnp.float32)[:, :, None, :], negs.astype(jnp.float32)], axis=2
        )
        tn = tgts * jax.lax.rsqrt(jnp.sum(tgts * tgts, -1, keepdims=True) + 1e-12)
        logits = jnp.einsum("btd,btnd->btn", xn, tn) / cfg.logit_temp
        neg_inf = jnp.float32(-(2.0**30))
        logits = logits.at[:, :, 1:].set(
            jnp.where(neg_is_pos, neg_inf, logits[:, :, 1:])
        )
        return logits
