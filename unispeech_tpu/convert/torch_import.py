"""Convert reference PyTorch WavLM checkpoints to our flax parameter tree.

Accepts a flat ``{name: np.ndarray}`` state dict (call ``.numpy()`` on torch
tensors first — this module is torch-free) in the layout of the standalone
reference model (/root/reference/WavLM/WavLM.py:220 module tree) and emits
the nested params dict for models.wavlm.WavLM.

Layout notes:
  * torch Linear weight is (out, in); flax Dense kernel is (in, out).
  * torch Conv1d weight is (out, in/groups, k); flax nn.Conv kernel and our
    PosConv ``v`` are (k, in/groups, out).
  * pos_conv weight-norm params: torch weight_g has shape (1, 1, K) (norm
    over dims 0,1 per kernel position, `weight_norm(..., dim=2)` at
    WavLM.py:526); ours is g of shape (K,).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unispeech_tpu.configs import WavLMModelConfig


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # (out, in/g, k) -> (k, in/g, out)
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def wavlm_params_from_reference(
    sd: Mapping[str, np.ndarray], cfg: WavLMModelConfig
) -> Dict:
    """Build flax params for models.wavlm.WavLM from a reference state dict."""
    enc = cfg.encoder
    p: Dict = {}

    # conv feature extractor
    fe: Dict = {}
    for i, (dim, k, stride) in enumerate(enc.conv_layers):
        conv_w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        layer = {"kernel": _conv_kernel(conv_w)}
        if f"feature_extractor.conv_layers.{i}.0.bias" in sd:
            layer["bias"] = sd[f"feature_extractor.conv_layers.{i}.0.bias"]
        fe[f"conv_{i}"] = layer
        if enc.extractor_mode == "default" and i == 0:
            fe["gn_0"] = {
                "scale": sd["feature_extractor.conv_layers.0.2.weight"],
                "bias": sd["feature_extractor.conv_layers.0.2.bias"],
            }
        elif enc.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = {
                "scale": sd[f"feature_extractor.conv_layers.{i}.2.1.weight"],
                "bias": sd[f"feature_extractor.conv_layers.{i}.2.1.bias"],
            }
    p["feature_extractor"] = fe

    p["layer_norm"] = {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]}
    if "post_extract_proj.weight" in sd:
        p["post_extract_proj"] = {
            "kernel": _t(sd["post_extract_proj.weight"]),
            "bias": sd["post_extract_proj.bias"],
        }
    if "mask_emb" in sd:  # absent in some fine-tuned exports
        p["mask_emb"] = sd["mask_emb"]

    # encoder
    e: Dict = {}
    pg = sd["encoder.pos_conv.0.weight_g"]
    pv = sd["encoder.pos_conv.0.weight_v"]
    e["pos_conv"] = {
        "g": pg.reshape(-1),
        "v": _conv_kernel(pv),
        "b": sd["encoder.pos_conv.0.bias"],
    }
    e["layer_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    if enc.relative_position_embedding:
        e["rel_attn_bias"] = sd[
            "encoder.layers.0.self_attn.relative_attention_bias.weight"
        ]

    layers = []
    for i in range(enc.encoder_layers):
        pre = f"encoder.layers.{i}."
        attn: Dict = {}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            attn[proj] = {
                "kernel": _t(sd[pre + f"self_attn.{proj}.weight"]),
                "bias": sd[pre + f"self_attn.{proj}.bias"],
            }
        if enc.gru_rel_pos:
            attn["grep_w"] = _t(sd[pre + "self_attn.grep_linear.weight"])
            attn["grep_b"] = sd[pre + "self_attn.grep_linear.bias"]
            attn["grep_a"] = sd[pre + "self_attn.grep_a"]
        layer: Dict = {
            "self_attn": attn,
            "self_attn_layer_norm": {
                "scale": sd[pre + "self_attn_layer_norm.weight"],
                "bias": sd[pre + "self_attn_layer_norm.bias"],
            },
            "final_layer_norm": {
                "scale": sd[pre + "final_layer_norm.weight"],
                "bias": sd[pre + "final_layer_norm.bias"],
            },
            "fc2": {
                "kernel": _t(sd[pre + "fc2.weight"]),
                "bias": sd[pre + "fc2.bias"],
            },
        }
        if enc.activation_fn == "glu":
            layer["fc1"] = {
                "linear": {
                    "kernel": _t(sd[pre + "fc1.linear.weight"]),
                    "bias": sd[pre + "fc1.linear.bias"],
                }
            }
        else:
            layer["fc1"] = {
                "kernel": _t(sd[pre + "fc1.weight"]),
                "bias": sd[pre + "fc1.bias"],
            }
        layers.append(layer)

    if enc.scan_layers:
        # nn.scan layout: one subtree with a leading L axis on every leaf
        import jax

        e["layers"] = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    else:
        for i, layer in enumerate(layers):
            e[f"layer_{i}"] = layer
    p["encoder"] = e
    return p
