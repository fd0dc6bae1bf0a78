"""Export our flax parameter trees back to reference (fairseq/standalone)
PyTorch state-dict layout.

Inverse of convert.torch_import / convert.fairseq_import: takes the nested
params dict of models.wavlm.WavLM (or a pretrain/fine-tune wrapper that nests
it under "wavlm") and emits a flat ``{name: np.ndarray}`` dict whose keys and
tensor layouts match the reference module trees, so a trained model can be
evaluated with the reference's own tooling:

  * standalone WavLM (/root/reference/WavLM/WavLM.py:220)
  * fairseq HubertModel / WavLMModel / UniSpeechSATModel
    (src/fairseq/models/hubert/hubert.py:236-380,
     src/fairseq/models/unispeech_sat/unispeech_sat.py:291-406)
  * fairseq CTC fine-tune checkpoints: every backbone key prefixed
    ``w2v_encoder.w2v_model.`` plus ``w2v_encoder.proj``
    (src/fairseq/models/hubert/hubert_asr.py:296-307; the warm-start loader
     at wav2vec2.py:383-393 strips exactly that prefix).

Layout transposes mirror torch_import: torch Linear weight (out, in) vs flax
kernel (in, out); torch Conv1d weight (out, in/g, k) vs ours (k, in/g, out).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unispeech_tpu.configs import EncoderConfig


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32).T)


def _conv_kernel_out(w) -> np.ndarray:
    # (k, in/g, out) -> (out, in/g, k)
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32), (2, 1, 0)))


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _unstack_layers(layers_tree: Mapping) -> list:
    """Split the nn.scan stacked subtree (leading L axis on every leaf) back
    into per-layer trees."""
    import jax

    leaves = jax.tree_util.tree_leaves(layers_tree)
    L = leaves[0].shape[0]
    return [jax.tree.map(lambda x: np.asarray(x)[i], dict(layers_tree)) for i in range(L)]


def wavlm_backbone_to_reference(params: Mapping, enc: EncoderConfig) -> Dict[str, np.ndarray]:
    """Flat reference-layout state dict for the WavLM backbone params."""
    sd: Dict[str, np.ndarray] = {}
    fe = params["feature_extractor"]
    for i, (dim, k, stride) in enumerate(enc.conv_layers):
        layer = fe[f"conv_{i}"]
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = _conv_kernel_out(layer["kernel"])
        if "bias" in layer:
            sd[f"feature_extractor.conv_layers.{i}.0.bias"] = _np(layer["bias"])
        if enc.extractor_mode == "default" and i == 0:
            sd["feature_extractor.conv_layers.0.2.weight"] = _np(fe["gn_0"]["scale"])
            sd["feature_extractor.conv_layers.0.2.bias"] = _np(fe["gn_0"]["bias"])
        elif enc.extractor_mode == "layer_norm":
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = _np(fe[f"ln_{i}"]["scale"])
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = _np(fe[f"ln_{i}"]["bias"])

    sd["layer_norm.weight"] = _np(params["layer_norm"]["scale"])
    sd["layer_norm.bias"] = _np(params["layer_norm"]["bias"])
    if "post_extract_proj" in params:
        sd["post_extract_proj.weight"] = _t(params["post_extract_proj"]["kernel"])
        sd["post_extract_proj.bias"] = _np(params["post_extract_proj"]["bias"])
    if "mask_emb" in params:
        sd["mask_emb"] = _np(params["mask_emb"])

    e = params["encoder"]
    # pos_conv weight norm: torch weight_g is (1, 1, K) (norm over dims 0,1;
    # weight_norm(..., dim=2) at WavLM.py:526)
    sd["encoder.pos_conv.0.weight_g"] = _np(e["pos_conv"]["g"]).reshape(1, 1, -1)
    sd["encoder.pos_conv.0.weight_v"] = _conv_kernel_out(e["pos_conv"]["v"])
    sd["encoder.pos_conv.0.bias"] = _np(e["pos_conv"]["b"])
    sd["encoder.layer_norm.weight"] = _np(e["layer_norm"]["scale"])
    sd["encoder.layer_norm.bias"] = _np(e["layer_norm"]["bias"])

    if "layers" in e:
        layers = _unstack_layers(e["layers"])
    else:
        layers = [e[f"layer_{i}"] for i in range(enc.encoder_layers)]

    for i, layer in enumerate(layers):
        pre = f"encoder.layers.{i}."
        attn = layer["self_attn"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = _t(attn[proj]["kernel"])
            sd[pre + f"self_attn.{proj}.bias"] = _np(attn[proj]["bias"])
        if enc.gru_rel_pos:
            sd[pre + "self_attn.grep_linear.weight"] = _t(attn["grep_w"])
            sd[pre + "self_attn.grep_linear.bias"] = _np(attn["grep_b"])
            sd[pre + "self_attn.grep_a"] = _np(attn["grep_a"])
        sd[pre + "self_attn_layer_norm.weight"] = _np(layer["self_attn_layer_norm"]["scale"])
        sd[pre + "self_attn_layer_norm.bias"] = _np(layer["self_attn_layer_norm"]["bias"])
        sd[pre + "final_layer_norm.weight"] = _np(layer["final_layer_norm"]["scale"])
        sd[pre + "final_layer_norm.bias"] = _np(layer["final_layer_norm"]["bias"])
        if enc.activation_fn == "glu":
            sd[pre + "fc1.linear.weight"] = _t(layer["fc1"]["linear"]["kernel"])
            sd[pre + "fc1.linear.bias"] = _np(layer["fc1"]["linear"]["bias"])
        else:
            sd[pre + "fc1.weight"] = _t(layer["fc1"]["kernel"])
            sd[pre + "fc1.bias"] = _np(layer["fc1"]["bias"])
        sd[pre + "fc2.weight"] = _t(layer["fc2"]["kernel"])
        sd[pre + "fc2.bias"] = _np(layer["fc2"]["bias"])

    if enc.relative_position_embedding and "rel_attn_bias" in e:
        sd["encoder.layers.0.self_attn.relative_attention_bias.weight"] = _np(
            e["rel_attn_bias"]
        )
    return sd


def _glu_to_reference(sd: Dict, prefix: str, glu_params: Mapping) -> None:
    """Our GLUProj (Dense_0, 2*d output, a*sigmoid(b)) -> torch
    nn.Sequential(Linear, nn.GLU()) keys ``{prefix}.0.weight/bias``
    (src/fairseq/models/wavlm/wavlm.py:322-326). torch GLU also splits
    [a; b] with output a*sigmoid(b), so the weight maps 1:1."""
    dense = glu_params["Dense_0"]
    sd[prefix + ".0.weight"] = _t(dense["kernel"])
    sd[prefix + ".0.bias"] = _np(dense["bias"])


def _quantizer_to_reference(sd: Dict, prefix: str, q: Mapping) -> None:
    """GumbelVectorQuantizer -> reference keys (gumbel_vector_quantizer.py:
    60-80): ``vars`` (1, G*V, var_dim) and ``weight_proj`` Linear(s)."""
    sd[prefix + ".vars"] = _np(q["vars"])
    if "weight_proj" in q:
        sd[prefix + ".weight_proj.weight"] = _t(q["weight_proj"]["kernel"])
        sd[prefix + ".weight_proj.bias"] = _np(q["weight_proj"]["bias"])
    else:
        # depth > 1: reference nn.Sequential(Linear, GELU, ..., Linear)
        i = 0
        seq = 0
        while f"weight_proj_{i}" in q:
            sd[prefix + f".weight_proj.{seq}.weight"] = _t(q[f"weight_proj_{i}"]["kernel"])
            sd[prefix + f".weight_proj.{seq}.bias"] = _np(q[f"weight_proj_{i}"]["bias"])
            i += 1
            seq += 2
        sd[prefix + f".weight_proj.{seq}.weight"] = _t(q["weight_proj_out"]["kernel"])
        sd[prefix + f".weight_proj.{seq}.bias"] = _np(q["weight_proj_out"]["bias"])


def hubert_to_fairseq(params: Mapping, cfg) -> Dict[str, np.ndarray]:
    """HubertPretrainModel params -> fairseq HubertModel/WavLMModel/
    UniSpeechSATModel/ILSHubertModel state dict."""
    sd = wavlm_backbone_to_reference(params["wavlm"], cfg.encoder)

    if "label_embs_concat" in params:
        embs = _np(params["label_embs_concat"])
        if embs.ndim == 3:
            # ILS separate tables (n_tables, total, final) -> reference flat
            # (layer_dim * sum(num_classes), final) (ils_hubert.py:102-107)
            embs = embs.reshape(-1, embs.shape[-1])
        sd["label_embs_concat"] = embs
    if "final_proj" in params:
        sd["final_proj.weight"] = _t(params["final_proj"]["kernel"])
        sd["final_proj.bias"] = _np(params["final_proj"]["bias"])
    # ILS separate per-layer projections -> Sequential indices
    # (src/fairseq/models/hubert/ils_hubert.py:80-89)
    li = 0
    while f"final_proj_{li}" in params:
        sd[f"final_proj.{li}.weight"] = _t(params[f"final_proj_{li}"]["kernel"])
        sd[f"final_proj.{li}.bias"] = _np(params[f"final_proj_{li}"]["bias"])
        li += 1
    if "target_glu" in params:
        _glu_to_reference(sd, "target_glu", params["target_glu"])
    # UniSpeech-SAT speaker branch (unispeech_sat.py:391-406)
    if "spk_proj" in params:
        sd["spk_proj.weight"] = _t(params["spk_proj"]["kernel"])
        sd["spk_proj.bias"] = _np(params["spk_proj"]["bias"])
    if "project_q" in params:
        sd["project_q.weight"] = _t(params["project_q"]["kernel"])
        sd["project_q.bias"] = _np(params["project_q"]["bias"])
    if "quantizer" in params:
        _quantizer_to_reference(sd, "quantizer", params["quantizer"])
    if "layer_norm_for_extract" in params:
        sd["layer_norm_for_extract.weight"] = _np(params["layer_norm_for_extract"]["scale"])
        sd["layer_norm_for_extract.bias"] = _np(params["layer_norm_for_extract"]["bias"])
    return sd


def wav2vec2_to_fairseq(params: Mapping, cfg) -> Dict[str, np.ndarray]:
    """Wav2Vec2PretrainModel params -> fairseq Wav2Vec2Model state dict
    (wav2vec2.py:275-393). The UniSpeech CTC head (ctc_proj) maps to the
    Wav2VecEncoder's ``proj`` under the ``w2v_encoder.`` wrapper — emitted
    here as plain ``proj`` so callers can prefix as needed."""
    sd = wavlm_backbone_to_reference(params["wavlm"], cfg.encoder)
    if "quantizer" in params:
        _quantizer_to_reference(sd, "quantizer", params["quantizer"])
    if "project_q" in params:
        sd["project_q.weight"] = _t(params["project_q"]["kernel"])
        sd["project_q.bias"] = _np(params["project_q"]["bias"])
    if "final_proj" in params:
        sd["final_proj.weight"] = _t(params["final_proj"]["kernel"])
        sd["final_proj.bias"] = _np(params["final_proj"]["bias"])
    if "target_glu" in params:
        _glu_to_reference(sd, "target_glu", params["target_glu"])
    if "ctc_proj" in params:
        sd["proj.weight"] = _t(params["ctc_proj"]["kernel"])
        sd["proj.bias"] = _np(params["ctc_proj"]["bias"])
    return sd


def ctc_to_fairseq(params: Mapping, cfg) -> Dict[str, np.ndarray]:
    """CtcFinetuneModel params -> fairseq HubertCtc/Wav2VecCtc checkpoint:
    backbone under ``w2v_encoder.w2v_model.``, vocab head at
    ``w2v_encoder.proj`` (hubert_asr.py:296-307)."""
    backbone = wavlm_backbone_to_reference(params["wavlm"], cfg.encoder)
    sd = {f"w2v_encoder.w2v_model.{k}": v for k, v in backbone.items()}
    sd["w2v_encoder.proj.weight"] = _t(params["proj"]["kernel"])
    sd["w2v_encoder.proj.bias"] = _np(params["proj"]["bias"])
    return sd
