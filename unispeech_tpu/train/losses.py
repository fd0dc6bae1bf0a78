"""Criterion layer: pure loss functions over model outputs.

Replaces the reference's criterion classes (src/fairseq/criterions/) with
pure functions returning (loss, sample_size, metrics-pytree). All losses are
weighted sums over static-shape tensors — no boolean indexing. Metrics are
plain scalar pytrees that the train step psums across the mesh, replacing
fairseq's pickled all_gather_list (src/fairseq/trainer.py:766-777).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unispeech_tpu.models.hubert import HubertOutput


@dataclass(frozen=True)
class HubertCriterionConfig:
    """Mirrors WavLMCriterionConfig / HubertCriterionConfig
    (src/fairseq/criterions/wavlm_criterion.py:19-35)."""

    pred_masked_weight: float = 1.0
    pred_nomask_weight: float = 0.0
    # extra-loss weights by name; reference recipes use
    # loss_weights=[10] -> features_pen * 10
    features_pen_weight: float = 10.0
    spk_loss_weight: float = 0.0  # UniSpeech-SAT loss_spk_m weight
    prob_ppl_weight: float = 0.0  # diversity penalty when quantizing


def _weighted_ce(
    logits: jax.Array,  # (B, T, C) fp32
    targets: jax.Array,  # (B, T) int
    weights: jax.Array,  # (B, T) {0,1} float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sum-reduced CE over weighted positions + (correct, count) accuracy.

    Accuracy matches the reference's tie-aware count: argmax == target and
    not all logits equal (wavlm_criterion.py:115-125 counts argmax==0 minus
    argmax==argmin both hitting 0).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * weights)
    pred = jnp.argmax(logits, axis=-1)
    amin = jnp.argmin(logits, axis=-1)
    correct = jnp.sum(((pred == targets) & (amin != targets)) * weights)
    count = jnp.sum(weights)
    return loss, correct, count


def hubert_loss(
    out: HubertOutput,
    cfg: HubertCriterionConfig,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """HuBERT/WavLM/ILS/SAT criterion.

    Loss = pred_masked_weight * sum_i CE_masked_i
         + pred_nomask_weight * sum_i CE_unmasked_i
         + features_pen_weight * features_pen * sample_size
         + spk_loss_weight * loss_spk_m * sample_size
         + prob_ppl_weight * (V - prob_ppl)/V * sample_size
    matching wavlm_criterion.py:59-101 with extra losses scaled by
    sample_size. sample_size = number of masked frames (per label set 0).
    """
    assert out.mask_indices is not None, "criterion requires masked forward"
    valid = (
        jnp.ones_like(out.mask_indices, jnp.float32)
        if out.padding_mask is None
        else (~out.padding_mask).astype(jnp.float32)
    )
    w_m = out.mask_indices.astype(jnp.float32) * valid
    w_u = (1.0 - out.mask_indices.astype(jnp.float32)) * valid

    metrics: Dict[str, jax.Array] = {}
    loss = jnp.float32(0.0)
    sample_size = jnp.sum(w_m)

    loss_m_sum = jnp.float32(0.0)
    loss_u_sum = jnp.float32(0.0)
    for key_i, ((p, si), logits) in enumerate(sorted(out.logits.items())):
        tgt = out.targets[..., si]
        if cfg.pred_masked_weight > 0:
            lm, cm, nm = _weighted_ce(logits, tgt, w_m)
            loss_m_sum = loss_m_sum + lm
            metrics[f"loss_m_{key_i}"] = lm
            metrics[f"correct_m_{key_i}"] = cm
            metrics[f"count_m_{key_i}"] = nm
        if cfg.pred_nomask_weight > 0:
            lu, cu, nu = _weighted_ce(logits, tgt, w_u)
            loss_u_sum = loss_u_sum + lu
            metrics[f"loss_u_{key_i}"] = lu
            metrics[f"correct_u_{key_i}"] = cu
            metrics[f"count_u_{key_i}"] = nu

    loss = cfg.pred_masked_weight * loss_m_sum + cfg.pred_nomask_weight * loss_u_sum

    if cfg.features_pen_weight != 0.0:
        fp = cfg.features_pen_weight * out.features_pen * sample_size
        loss = loss + fp
        metrics["loss_features_pen"] = fp

    if out.spk_logits is not None and cfg.spk_loss_weight != 0.0:
        w = w_m[..., None]  # evaluate BCE at masked frames only
        logits = out.spk_logits
        tgts = out.spk_targets
        bce = jnp.maximum(logits, 0) - logits * tgts + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        # reference: .mean() over the masked set (unispeech_sat.py:755)
        denom = jnp.maximum(jnp.sum(w) * logits.shape[-1], 1.0)
        loss_spk = jnp.sum(bce * w) / denom
        loss = loss + cfg.spk_loss_weight * loss_spk * sample_size
        metrics["loss_spk_m"] = loss_spk
        acc = jnp.sum(((logits >= 0) == (tgts > 0.5)) * w) / denom
        metrics["contrastive_acc"] = acc

    if out.vq_result is not None and cfg.prob_ppl_weight != 0.0:
        V = out.vq_result["num_vars"]
        div = (V - out.vq_result["prob_perplexity"]) / V
        loss = loss + cfg.prob_ppl_weight * div * sample_size
        metrics["loss_prob_perplexity"] = div
        metrics["code_perplexity"] = out.vq_result["code_perplexity"]
        metrics["prob_perplexity"] = out.vq_result["prob_perplexity"]

    metrics["loss"] = loss
    metrics["sample_size"] = sample_size
    return loss, sample_size, metrics


def wav2vec2_contrastive_loss(
    logits: jax.Array,  # (B, T, 1+N) fp32, column 0 = positive
    mask_weights: jax.Array,  # (B, T) {0,1}
    features_pen: jax.Array,
    vq_result: Optional[dict],
    features_pen_weight: float = 10.0,
    prob_ppl_weight: float = 0.1,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """InfoNCE over masked positions (src/fairseq/criterions/
    wav2vec_criterion.py:57-74) + diversity and feature penalties."""
    targets = jnp.zeros(logits.shape[:-1], jnp.int32)
    loss_c, correct, count = _weighted_ce(logits, targets, mask_weights)
    sample_size = jnp.sum(mask_weights)
    loss = loss_c
    metrics = {
        "loss_contrastive": loss_c,
        "correct": correct,
        "count": count,
        "sample_size": sample_size,
    }
    if vq_result is not None and prob_ppl_weight != 0.0:
        V = vq_result["num_vars"]
        div = (V - vq_result["prob_perplexity"]) / V
        loss = loss + prob_ppl_weight * div * sample_size
        metrics["loss_prob_perplexity"] = div
        metrics["code_perplexity"] = vq_result["code_perplexity"]
        metrics["prob_perplexity"] = vq_result["prob_perplexity"]
    if features_pen_weight != 0.0:
        fp = features_pen_weight * features_pen * sample_size
        loss = loss + fp
        metrics["loss_features_pen"] = fp
    metrics["loss"] = loss
    return loss, sample_size, metrics
