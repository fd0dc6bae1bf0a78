"""Typed configuration dataclasses for the TPU-native UniSpeech-family stack.

Replaces the reference's hydra/omegaconf + argparse flag system
(/root/reference/src/fairseq/dataclass/configs.py) with plain Python
dataclasses: configs are constructed in code or loaded from JSON/YAML-free
dicts, cross-references are resolved explicitly at build time instead of
OmegaConf `II(...)` interpolation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


# Conv frontend spec: list of (dim, kernel, stride).
# Matches reference default "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
# (/root/reference/WavLM/WavLM.py:173) -> 320x downsample, 50 Hz frame rate.
DEFAULT_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


@dataclass(frozen=True)
class MaskConfig:
    """Span-mask sampling config (time or channel axis).

    Mirrors the masking fields of WavLMConfig
    (/root/reference/WavLM/WavLM.py:188-201) but formulated for a
    shape-static on-device sampler (see ops/masking.py).
    """

    mask_prob: float = 0.65
    mask_length: int = 10
    mask_selection: str = "static"  # static|uniform|normal|poisson
    mask_other: float = 0.0
    min_masks: int = 2
    # no_overlap/min_space intentionally unsupported on-device (reference
    # recipes never enable them); the sampler allows overlaps like the
    # reference default path.


@dataclass(frozen=True)
class EncoderConfig:
    """Shared conv-frontend + transformer encoder configuration.

    Field-for-field coverage of the architectural part of WavLMConfig
    (/root/reference/WavLM/WavLM.py:162-214); the same skeleton backs
    wav2vec2/UniSpeech/HuBERT/UniSpeech-SAT/WavLM.
    """

    # conv feature extractor
    conv_layers: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_LAYERS
    extractor_mode: str = "default"  # default (groupnorm 1st block) | layer_norm
    conv_bias: bool = False
    feature_grad_mult: float = 1.0

    # transformer
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    activation_fn: str = "gelu"  # gelu | gelu_accurate | relu | glu (GLU FFN)
    layer_norm_first: bool = False
    layer_norm_eps: float = 1e-5  # torch default; flax default (1e-6) differs!

    # dropouts
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    encoder_layerdrop: float = 0.0
    dropout_input: float = 0.0
    dropout_features: float = 0.0

    # conv positional embedding
    conv_pos: int = 128
    conv_pos_groups: int = 16

    # WavLM bucketed relative position bias (+ GRU gate)
    relative_position_embedding: bool = False
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = False
    # q/k head-dim expansion (reference multihead_attention.py:38-92:
    # q/k project to H*expand while v keeps embed_dim/H; scaling expand^-0.5)
    expand_attention_head_size: int = -1

    # input normalization (matched to extractor_mode=layer_norm in recipes)
    normalize: bool = False

    # iPQ quantization noise on encoder linears (reference quant_noise,
    # WavLM/modules.py:203-287; off in all published recipes)
    quant_noise_pq: float = 0.0
    quant_noise_pq_block_size: int = 8

    # TPU hot path: Pallas fused attention (bias+gate+softmax+PV in VMEM).
    # Auto-disabled off-TPU.
    use_flash_attention: bool = True
    # q-stripe rows per kernel iteration (micro-bench: 256 beats 128 by
    # ~10% at Base shapes; VMEM-checked at runtime)
    attention_q_tile: int = 256
    # Fused (gelu->)conv(k in {2,3}, s=2)->gelu Pallas blocks for the
    # 512-channel frontend layers (ops/pallas/conv_stack.py). The round-4
    # kernels deinterleave IN-KERNEL via a lane-collapse reshape, so the
    # whole L1..L6 chain runs back-to-back with no XLA ops in between:
    # chain fwd+bwd 15.6 ms vs 26.3 ms for the XLA stride-collapsed matmul
    # path at Base bench shapes (scripts/exp_conv_stack_tpu.py). TPU only.
    use_fused_conv: bool = True

    # Fuse the first (waveform, cin=1) conv layer with the frontend
    # GroupNorm statistics into one Pallas pass, and fold its backward's
    # stats-backprop + dW1 into a second single pass
    # (ops/pallas/l1_frontend.py). The L1 output is the largest tensor of
    # the model (~1.2 GB bf16 at Base bench shapes) and the unfused path
    # spent ~12.5 ms/step of pure HBM traffic on it in the forward alone.
    # Effective only when use_fused_conv is active and the next layer is a
    # fused block. TPU only.
    use_fused_l1: bool = True

    # Stack the transformer layers with nn.scan (single compiled layer body,
    # params get a leading L axis) and rematerialize activations inside each
    # layer (jax.checkpoint) so attention/FFN intermediates are never saved
    # for backward. This is the TPU-idiomatic replacement for the reference's
    # checkpoint_activations wrapper (src/fairseq/modules/
    # checkpoint_activations.py) and is required for Large-scale training.
    scan_layers: bool = True
    # fully unroll the layer scan (lax.scan unroll=L): params stay STACKED
    # (cheap big-fusion optimizer updates, converter-stable names) while
    # the compute gets static layer indices. Measured r5 on v5e vs the
    # dynamic scan — see R5_NOTES.md.
    scan_unroll: bool = False
    remat_layers: bool = True
    # rematerialize ONLY the FFN branch (fc1+gelu recomputed in backward)
    # instead of storing the (L, B, T, 4D) fc1 activations — cheaper than
    # full remat_layers when HBM fits everything else (on-chip: -2.7 ms/step
    # at Base bench shapes). Ignored when remat_layers covers the layer.
    remat_ffn: bool = True

    @property
    def frame_hop(self) -> int:
        hop = 1
        for _, _, s in self.conv_layers:
            hop *= s
        return hop

    @property
    def frame_receptive_field(self) -> int:
        rf = 1
        for _, k, s in reversed(self.conv_layers):
            rf = (rf - 1) * s + k
        return rf

    def num_frames(self, num_samples: int) -> int:
        t = num_samples
        for _, k, s in self.conv_layers:
            t = (t - k) // s + 1
        return t


def base_encoder_config(**over: Any) -> EncoderConfig:
    """WavLM/HuBERT Base shape: 12L/768d/12h/3072ffn."""
    return dataclasses.replace(EncoderConfig(), **over)


def large_encoder_config(**over: Any) -> EncoderConfig:
    """Large shape: 24L/1024d/16h/4096ffn, layer_norm extractor, pre-LN."""
    cfg = EncoderConfig(
        encoder_layers=24,
        encoder_embed_dim=1024,
        encoder_ffn_embed_dim=4096,
        encoder_attention_heads=16,
        layer_norm_first=True,
        extractor_mode="layer_norm",
        normalize=True,
    )
    return dataclasses.replace(cfg, **over)


@dataclass(frozen=True)
class WavLMModelConfig:
    """Full WavLM(-style) model config wrapping the shared encoder.

    Parity target: /root/reference/WavLM/WavLM.py:162 (WavLMConfig).
    """

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    time_mask: MaskConfig = field(default_factory=MaskConfig)
    channel_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.0, mask_length=10, min_masks=0)
    )

    @staticmethod
    def from_reference_dict(d: dict) -> "WavLMModelConfig":
        """Build from a reference `ckpt['cfg']` dict (WavLM.py:213-217)."""
        enc_fields = {f.name for f in dataclasses.fields(EncoderConfig)}
        enc_kwargs = {k: v for k, v in d.items() if k in enc_fields}
        if "conv_feature_layers" in d:
            layers = d["conv_feature_layers"]
            if isinstance(layers, str):
                layers = eval_conv_spec(layers)
            enc_kwargs["conv_layers"] = tuple(tuple(l) for l in layers)
        enc = EncoderConfig(**enc_kwargs)
        tm = MaskConfig(
            mask_prob=d.get("mask_prob", 0.65),
            mask_length=d.get("mask_length", 10),
            mask_selection=d.get("mask_selection", "static"),
            mask_other=d.get("mask_other", 0.0),
            min_masks=2,
        )
        cm = MaskConfig(
            mask_prob=d.get("mask_channel_prob", 0.0),
            mask_length=d.get("mask_channel_length", 10),
            mask_selection=d.get("mask_channel_selection", "static"),
            mask_other=d.get("mask_channel_other", 0.0),
            min_masks=0,
        )
        return WavLMModelConfig(encoder=enc, time_mask=tm, channel_mask=cm)


@dataclass(frozen=True)
class GumbelVQConfig:
    """Gumbel-softmax vector quantizer config
    (/root/reference/src/fairseq/modules/gumbel_vector_quantizer.py:11)."""

    num_vars: int = 320  # V codewords per group
    groups: int = 2  # G groups
    vq_dim: int = 256  # output dim (split across groups)
    temp_start: float = 2.0
    temp_min: float = 0.5
    temp_decay: float = 0.999995
    weight_proj_depth: int = 1
    weight_proj_factor: int = 1

    def temp_at(self, num_updates) -> float:
        import jax.numpy as jnp

        return jnp.maximum(
            self.temp_start * self.temp_decay**num_updates, self.temp_min
        )


@dataclass(frozen=True)
class HubertPretrainConfig:
    """Masked pseudo-label prediction pretraining (HuBERT / WavLM / ILS / SAT).

    Covers: HubertConfig (src/fairseq/models/hubert/hubert.py), fairseq
    WavLMConfig (src/fairseq/models/wavlm/wavlm.py:49), ILSHubertConfig
    (src/fairseq/models/hubert/ils_hubert.py:27), and UniSpeechSATConfig's
    speaker-contrastive extras (src/fairseq/models/unispeech_sat/
    unispeech_sat.py:250-297).
    """

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    time_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.8, mask_length=10)
    )
    channel_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.0, min_masks=0)
    )

    label_rate: float = 50.0
    sample_rate: int = 16000
    num_classes: Tuple[int, ...] = (504,)  # len(dict) per label stream
    final_dim: int = 256
    logit_temp: float = 0.1
    untie_final_proj: bool = False
    target_glu: bool = False
    skip_masked: bool = False
    skip_nomask: bool = False

    # ILS: 1-based encoder layers whose outputs get a prediction loss;
    # empty = final output only (plain HuBERT/WavLM)
    predict_layers: Tuple[int, ...] = ()
    separate_label_embeds: bool = False
    separate_layer_targets: bool = False

    # UniSpeech-SAT speaker contrastive branch
    utterance_contrastive_loss: bool = False
    utterance_contrastive_layer: int = 6  # 1-based tap layer
    num_instances: int = 0  # same-utterance instances
    cross_sample_instances: int = 100  # cross-utterance instances
    quantize_targets: bool = False  # GumbelVQ on the tapped features
    quantizer: GumbelVQConfig = field(default_factory=GumbelVQConfig)

    @property
    def feat2tar_ratio(self) -> float:
        return self.label_rate * self.encoder.frame_hop / self.sample_rate


@dataclass(frozen=True)
class Wav2Vec2PretrainConfig:
    """wav2vec 2.0 contrastive pretraining
    (/root/reference/src/fairseq/models/wav2vec/wav2vec2.py:Wav2Vec2Config),
    including the UniSpeech multitask extensions (`transpose` mode returning
    the quantized stream, replace_prob CTC mixing — unispeech.py:27-34)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    time_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.65, mask_length=10)
    )
    channel_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.0, min_masks=0)
    )

    final_dim: int = 256
    logit_temp: float = 0.1
    quantize_targets: bool = True
    quantizer: GumbelVQConfig = field(default_factory=GumbelVQConfig)
    num_negatives: int = 100
    cross_sample_negatives: int = 0
    codebook_negatives: int = 0
    negatives_from_everywhere: bool = False
    target_glu: bool = False

    # UniSpeech multitask: also produce the quantized stream for the CTC
    # head and use transposed final projection (wav2vec2.py:185,652-653)
    transpose: bool = False
    replace_prob: float = 0.5  # unispeech.py:28-30
    final_dropout: float = 0.1
    ctc_vocab_size: int = 0  # >0 enables the phonetic CTC head


def eval_conv_spec(spec: str) -> Tuple[Tuple[int, int, int], ...]:
    """Safely evaluate a conv layer spec string like
    "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
    (reference stores these as python-eval'd strings, WavLM.py:229).
    Only list/tuple/int literals with + and * are allowed.
    """
    import ast

    node = ast.parse(spec, mode="eval").body

    def ev(n):
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Add):
            return ev(n.left) + ev(n.right)
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult):
            left, right = ev(n.left), ev(n.right)
            if isinstance(left, list):
                return left * right
            return right * left
        if isinstance(n, ast.List):
            return [ev(e) for e in n.elts]
        if isinstance(n, ast.Tuple):
            return tuple(ev(e) for e in n.elts)
        if isinstance(n, ast.Constant) and isinstance(n.value, int):
            return n.value
        raise ValueError(f"disallowed node in conv spec: {ast.dump(n)}")

    out = ev(node)
    return tuple(tuple(l) for l in out)
