"""Convert fairseq-side reference checkpoints into our flax parameter trees.

Inverse of convert.fairseq_export; complements convert.torch_import (which
handles the standalone-WavLM layout). Accepts flat ``{name: np.ndarray}``
state dicts (call ``.numpy()`` on torch tensors first — this module is
torch-free) in the layouts of:

  * fairseq pretrain models: HubertModel / ILSHubertModel / WavLMModel /
    UniSpeechSATModel (src/fairseq/models/hubert/hubert.py:234-308,
    ils_hubert.py:69-107, unispeech_sat/unispeech_sat.py:291-406)
  * fairseq Wav2Vec2Model / Unispeech (wav2vec/wav2vec2.py:275-393,
    unispeech/unispeech.py:37-110)
  * CTC fine-tune checkpoints: backbone under ``w2v_encoder.w2v_model.``,
    vocab head at ``w2v_encoder.proj`` (hubert_asr.py:296-307) — the same
    prefix the reference's own ``w2v_path`` warm-start loader strips
    (wav2vec2.py:383-393, hubert_asr.py:258-276).

The encoder backbone layout is byte-identical between the standalone WavLM
module tree and every fairseq-side model (fairseq wavlm.py is the origin of
the standalone file), so the backbone mapping is shared with torch_import.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unispeech_tpu.configs import EncoderConfig
from unispeech_tpu.convert.torch_import import _t, wavlm_params_from_reference


class _EncShim:
    """wavlm_params_from_reference only reads cfg.encoder."""

    def __init__(self, enc: EncoderConfig):
        self.encoder = enc


def backbone_params_from_fairseq(
    sd: Mapping[str, np.ndarray], enc: EncoderConfig
) -> Dict:
    """Backbone (ConvFeatureExtractor + TransformerEncoder + projections)
    params from any fairseq-side state dict."""
    return wavlm_params_from_reference(sd, _EncShim(enc))


def _glu_from_reference(sd: Mapping, prefix: str) -> Dict:
    """torch nn.Sequential(Linear, nn.GLU()) keys ``{prefix}.0.*`` -> our
    GLUProj {"Dense_0": ...} (both split [a; b] -> a*sigmoid(b))."""
    return {
        "Dense_0": {
            "kernel": _t(sd[prefix + ".0.weight"]),
            "bias": sd[prefix + ".0.bias"],
        }
    }


def _quantizer_from_reference(sd: Mapping, prefix: str) -> Dict:
    """Reference GumbelVectorQuantizer keys -> our ops.quantizer params
    (gumbel_vector_quantizer.py:60-80)."""
    q: Dict = {"vars": sd[prefix + ".vars"]}
    if prefix + ".weight_proj.weight" in sd:
        q["weight_proj"] = {
            "kernel": _t(sd[prefix + ".weight_proj.weight"]),
            "bias": sd[prefix + ".weight_proj.bias"],
        }
    else:
        # depth > 1: Sequential(Linear, GELU, ..., Linear) at even indices
        seq_idx = [
            int(k[len(prefix) + 13 :].split(".")[0])
            for k in sd
            if k.startswith(prefix + ".weight_proj.") and k.endswith(".weight")
        ]
        seq_idx = sorted(set(seq_idx))
        for i, s in enumerate(seq_idx[:-1]):
            q[f"weight_proj_{i}"] = {
                "kernel": _t(sd[f"{prefix}.weight_proj.{s}.weight"]),
                "bias": sd[f"{prefix}.weight_proj.{s}.bias"],
            }
        last = seq_idx[-1]
        q["weight_proj_out"] = {
            "kernel": _t(sd[f"{prefix}.weight_proj.{last}.weight"]),
            "bias": sd[f"{prefix}.weight_proj.{last}.bias"],
        }
    return q


def hubert_params_from_fairseq(sd: Mapping[str, np.ndarray], cfg) -> Dict:
    """fairseq HubertModel / ILSHubertModel / WavLMModel / UniSpeechSATModel
    state dict -> params for models.hubert.HubertPretrainModel.

    `cfg` is a HubertPretrainConfig (reads .encoder, .num_classes,
    .final_dim, .separate_label_embeds, .separate_layer_targets,
    .predict_layers).
    """
    p: Dict = {"wavlm": backbone_params_from_fairseq(sd, cfg.encoder)}

    if "label_embs_concat" in sd:
        embs = np.asarray(sd["label_embs_concat"])
        n_tables = (
            len(cfg.predict_layers or [])
            if (cfg.separate_label_embeds or cfg.separate_layer_targets)
            else 1
        )
        if n_tables > 1:
            # reference flat (layer_dim * total, final) -> (n_tables, total, final)
            embs = embs.reshape(n_tables, -1, embs.shape[-1])
        p["label_embs_concat"] = embs

    if "final_proj.weight" in sd:
        p["final_proj"] = {
            "kernel": _t(sd["final_proj.weight"]),
            "bias": sd["final_proj.bias"],
        }
    li = 0
    while f"final_proj.{li}.weight" in sd:  # ILS Sequential of Linears
        p[f"final_proj_{li}"] = {
            "kernel": _t(sd[f"final_proj.{li}.weight"]),
            "bias": sd[f"final_proj.{li}.bias"],
        }
        li += 1
    if "target_glu.0.weight" in sd:
        p["target_glu"] = _glu_from_reference(sd, "target_glu")
    # UniSpeech-SAT speaker branch (unispeech_sat.py:391-406)
    if "spk_proj.weight" in sd:
        p["spk_proj"] = {
            "kernel": _t(sd["spk_proj.weight"]),
            "bias": sd["spk_proj.bias"],
        }
    if "project_q.weight" in sd:
        p["project_q"] = {
            "kernel": _t(sd["project_q.weight"]),
            "bias": sd["project_q.bias"],
        }
    if "quantizer.vars" in sd:
        p["quantizer"] = _quantizer_from_reference(sd, "quantizer")
    if "layer_norm_for_extract.weight" in sd:
        p["layer_norm_for_extract"] = {
            "scale": sd["layer_norm_for_extract.weight"],
            "bias": sd["layer_norm_for_extract.bias"],
        }
    return p


def wav2vec2_params_from_fairseq(sd: Mapping[str, np.ndarray], cfg) -> Dict:
    """fairseq Wav2Vec2Model / Unispeech state dict -> params for
    models.wav2vec2.Wav2Vec2PretrainModel (wav2vec2.py:275-393)."""
    p: Dict = {"wavlm": backbone_params_from_fairseq(sd, cfg.encoder)}
    if "quantizer.vars" in sd:
        p["quantizer"] = _quantizer_from_reference(sd, "quantizer")
    for ours, theirs in (
        ("project_q", "project_q"),
        ("final_proj", "final_proj"),
        ("ctc_proj", "proj"),
    ):
        if f"{theirs}.weight" in sd:
            p[ours] = {
                "kernel": _t(sd[f"{theirs}.weight"]),
                "bias": sd[f"{theirs}.bias"],
            }
    if "target_glu.0.weight" in sd:
        p["target_glu"] = _glu_from_reference(sd, "target_glu")
    return p


def strip_w2v_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip the fine-tune wrapper prefix exactly like the reference's
    warm-start loader (wav2vec2.py:383-393): keep only
    ``w2v_encoder.w2v_model.*`` keys, unprefixed."""
    pre = "w2v_encoder.w2v_model."
    return {k[len(pre) :]: v for k, v in sd.items() if k.startswith(pre)}


def ctc_params_from_fairseq(sd: Mapping[str, np.ndarray], cfg) -> Dict:
    """fairseq HubertCtc / Wav2VecCtc checkpoint -> params for
    models.ctc.CtcFinetuneModel (hubert_asr.py:296-307)."""
    backbone_sd = strip_w2v_prefix(sd)
    p: Dict = {"wavlm": backbone_params_from_fairseq(backbone_sd, cfg.encoder)}
    p["proj"] = {
        "kernel": _t(sd["w2v_encoder.proj.weight"]),
        "bias": sd["w2v_encoder.proj.bias"],
    }
    return p
