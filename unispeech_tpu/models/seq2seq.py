"""Seq2seq ASR fine-tuning: encoder backbone + autoregressive transformer
decoder.

Reference behavior: Wav2Vec2Seq2SeqModel + TransformerDecoder
(/root/reference/src/fairseq/models/wav2vec/wav2vec2_asr.py:267-305,442-658):
scaled token embedding + sinusoidal (or learned) positions, N post-LN decoder
layers (causal self-attn, cross-attn over encoder frames, FFN), output
projection (optionally tied to the input embedding). Defaults mirror
Wav2Vec2Seq2SeqConfig (wav2vec2_asr.py:216-263).

TPU reformulation:
  * teacher-forcing training path is one static-shape forward with a causal
    additive mask — no incremental state, no per-layer python loops over time;
  * greedy decoding runs as a single `lax.scan` over target positions with a
    functional KV cache (carried arrays, `dynamic_update_slice`), replacing
    fairseq's dict-of-tensors incremental_state;
  * cross-attention K/V are computed once per utterance before the scan.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unispeech_tpu.configs import EncoderConfig, MaskConfig, WavLMModelConfig
from unispeech_tpu.models.encoder import Fp32LayerNorm, gelu_fp32
from unispeech_tpu.models.wavlm import WavLM

Dtype = Any
NEG_INF = -1e30


@dataclass(frozen=True)
class Seq2SeqDecoderConfig:
    """Mirrors Wav2Vec2Seq2SeqConfig decoder fields
    (wav2vec2_asr.py:216-263)."""

    vocab_size: int = 32
    embed_dim: int = 768
    ffn_embed_dim: int = 3072
    layers: int = 6
    heads: int = 4
    learned_pos: bool = False
    normalize_before: bool = False
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layerdrop: float = 0.0
    max_target_positions: int = 2048
    share_input_output_embed: bool = False
    padding_idx: int = 1  # Dictionary.pad()


def sinusoidal_positions(
    num_positions: int, dim: int, padding_idx: int
) -> jnp.ndarray:
    """fairseq SinusoidalPositionalEmbedding table: [sin | cos] halves,
    position ids offset by padding_idx+1, row padding_idx zeroed
    (fairseq/modules/sinusoidal_positional_embedding.py)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    n = num_positions + padding_idx + 1
    pos = jnp.arange(n, dtype=jnp.float32)[:, None] * freqs[None, :]
    table = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((n, 1))], axis=1)
    return table.at[padding_idx].set(0.0)


class DecoderMHA(nn.Module):
    """Decoder attention (self or cross) with optional single-step KV cache.

    Smaller and simpler than the encoder's gated-rel-pos attention: no bias
    table, no Pallas — decoder shapes (T<=~500, hd up to 192) are XLA-friendly.
    """

    embed_dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def setup(self):
        dense = lambda name: nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02),
            name=name,
        )
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    def _heads(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        return x.reshape(B, T, self.heads, self.embed_dim // self.heads)

    def kv(self, kv_src: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self._heads(self.k_proj(kv_src)), self._heads(self.v_proj(kv_src))

    def attend(
        self,
        q_src: jax.Array,  # (B, Tq, D)
        k: jax.Array,  # (B, S, H, hd)
        v: jax.Array,
        mask: Optional[jax.Array],  # additive (B|1, 1|H, Tq, S) fp32
        dropout_rng: Optional[jax.Array],
        rate: float,
    ) -> jax.Array:
        hd = self.embed_dim // self.heads
        q = self._heads(self.q_proj(q_src)) * (hd**-0.5)
        logits = jnp.einsum("bqhd,bshd->bhqs", q, k).astype(jnp.float32)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1)
        if dropout_rng is not None and rate > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        out = jnp.einsum("bhqs,bshd->bqhd", probs.astype(v.dtype), v)
        return self.out_proj(out.reshape(*q_src.shape[:2], self.embed_dim))


class TransformerDecoderLayer(nn.Module):
    """Post-/pre-LN decoder layer (fairseq TransformerDecoderLayer wiring:
    self-attn -> cross-attn -> FFN, residuals around each)."""

    cfg: Seq2SeqDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.self_attn = DecoderMHA(c.embed_dim, c.heads, self.dtype, name="self_attn")
        self.encoder_attn = DecoderMHA(
            c.embed_dim, c.heads, self.dtype, name="encoder_attn"
        )
        self.self_attn_layer_norm = Fp32LayerNorm(name="self_attn_layer_norm")
        self.encoder_attn_layer_norm = Fp32LayerNorm(name="encoder_attn_layer_norm")
        self.final_layer_norm = Fp32LayerNorm(name="final_layer_norm")
        dense = lambda feats, name: nn.Dense(
            feats,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02),
            name=name,
        )
        self.fc1 = dense(c.ffn_embed_dim, "fc1")
        self.fc2 = dense(c.embed_dim, "fc2")

    def _block(self, x, residual, ln, fn, pre):
        if pre:
            return residual + fn(ln(x))
        return ln(residual + fn(x))

    def __call__(
        self,
        x: jax.Array,  # (B, Tq, D)
        self_k: jax.Array,  # (B, S, H, hd) cached/projected self keys
        self_v: jax.Array,
        self_mask: Optional[jax.Array],
        enc_k: jax.Array,
        enc_v: jax.Array,
        enc_mask: Optional[jax.Array],
        deterministic: bool = True,
        drop_rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> jax.Array:
        c = self.cfg
        pre = c.normalize_before
        rngs = drop_rngs or {}

        def drop(h, rate, key):
            if deterministic or rate <= 0.0 or key not in rngs:
                return h
            keep = jax.random.bernoulli(rngs[key], 1.0 - rate, h.shape)
            return jnp.where(keep, h / (1.0 - rate), 0.0).astype(h.dtype)

        x = self._block(
            x, x, self.self_attn_layer_norm,
            lambda h: drop(
                self.self_attn.attend(
                    h, self_k, self_v, self_mask,
                    rngs.get("attn_self") if not deterministic else None,
                    c.attention_dropout,
                ),
                c.dropout, "res_self",
            ),
            pre,
        )
        x = self._block(
            x, x, self.encoder_attn_layer_norm,
            lambda h: drop(
                self.encoder_attn.attend(
                    h, enc_k, enc_v, enc_mask,
                    rngs.get("attn_cross") if not deterministic else None,
                    c.attention_dropout,
                ),
                c.dropout, "res_cross",
            ),
            pre,
        )

        def ffn(h):
            h = gelu_fp32(self.fc1(h))
            h = drop(h, c.activation_dropout, "act")
            return drop(self.fc2(h), c.dropout, "res_ffn")

        x = self._block(x, x, self.final_layer_norm, ffn, pre)
        return x


class TransformerDecoder(nn.Module):
    """Teacher-forcing decoder over (B, S) token ids
    (wav2vec2_asr.py:442-658)."""

    cfg: Seq2SeqDecoderConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(
            c.vocab_size, c.embed_dim,
            embedding_init=nn.initializers.normal(c.embed_dim**-0.5),
            param_dtype=jnp.float32, dtype=self.dtype, name="embed_tokens",
        )
        if c.learned_pos:
            self.embed_positions = nn.Embed(
                c.max_target_positions + c.padding_idx + 1, c.embed_dim,
                embedding_init=nn.initializers.normal(0.02),
                param_dtype=jnp.float32, dtype=self.dtype, name="embed_positions",
            )
        self.decoder_layers = [
            TransformerDecoderLayer(c, self.dtype, name=f"layer_{i}")
            for i in range(c.layers)
        ]
        if c.normalize_before:
            self.layer_norm = Fp32LayerNorm(name="layer_norm")
        if not c.share_input_output_embed:
            self.embed_out = self.param(
                "embed_out",
                nn.initializers.normal(c.embed_dim**-0.5),
                (c.vocab_size, c.embed_dim),
                jnp.float32,
            )

    def _positions(self, tokens: jax.Array) -> jax.Array:
        """fairseq make_positions: cumsum over non-pad + padding_idx."""
        c = self.cfg
        mask = (tokens != c.padding_idx).astype(jnp.int32)
        pos = jnp.cumsum(mask, axis=1) * mask + c.padding_idx
        if c.learned_pos:
            return self.embed_positions(pos)
        table = sinusoidal_positions(
            c.max_target_positions, c.embed_dim, c.padding_idx
        )
        return table[pos].astype(self.dtype)

    def embed(self, tokens: jax.Array) -> jax.Array:
        c = self.cfg
        x = self.embed_tokens(tokens) * math.sqrt(c.embed_dim)
        return x + self._positions(tokens)

    def output_layer(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        w = (
            self.embed_tokens.embedding
            if c.share_input_output_embed
            else self.embed_out
        )
        return jnp.einsum(
            "btd,vd->btv", x.astype(jnp.float32), w.astype(jnp.float32)
        )

    def __call__(
        self,
        prev_tokens: jax.Array,  # (B, S) teacher-forcing inputs
        enc_out: jax.Array,  # (B, T, D_enc)
        enc_padding_mask: Optional[jax.Array],  # (B, T) True = pad
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        B, S = prev_tokens.shape
        x = self.embed(prev_tokens)
        if not deterministic and c.dropout > 0.0:
            x = nn.Dropout(rate=c.dropout, deterministic=False)(x)

        causal = jnp.triu(jnp.full((S, S), NEG_INF, jnp.float32), 1)[None, None]
        enc_mask = None
        if enc_padding_mask is not None:
            enc_mask = jnp.where(enc_padding_mask, NEG_INF, 0.0).astype(
                jnp.float32
            )[:, None, None, :]

        for i, layer in enumerate(self.decoder_layers):
            self_k, self_v = layer.self_attn.kv(x)
            enc_k, enc_v = layer.encoder_attn.kv(enc_out)
            y = layer(
                x, self_k, self_v, causal, enc_k, enc_v, enc_mask,
                deterministic=deterministic,
                drop_rngs=(
                    None if deterministic else {
                        k: self.make_rng("dropout")
                        for k in ("attn_self", "attn_cross", "res_self",
                                  "res_cross", "act", "res_ffn")
                    }
                ),
            )
            if c.layerdrop > 0.0 and not deterministic:
                keep = (
                    jax.random.uniform(self.make_rng("layerdrop"), ())
                    > c.layerdrop
                )
                y = jnp.where(keep, y, x)
            x = y

        if c.normalize_before:
            x = self.layer_norm(x)
        return self.output_layer(x)  # (B, S, V) fp32


@dataclass(frozen=True)
class Seq2SeqConfig:
    """Wav2Vec2Seq2SeqModel = masked encoder backbone + decoder
    (wav2vec2_asr.py:267-305)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: Seq2SeqDecoderConfig = field(default_factory=Seq2SeqDecoderConfig)
    apply_mask: bool = True
    time_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.5, mask_length=10)
    )
    channel_mask: MaskConfig = field(
        default_factory=lambda: MaskConfig(mask_prob=0.5, mask_length=64, min_masks=0)
    )
    freeze_finetune_updates: int = 0
    feature_grad_mult: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Seq2SeqOutput:
    logits: jax.Array  # (B, S, V) fp32
    enc_padding_mask: Optional[jax.Array]


class Seq2SeqModel(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        enc = dataclasses.replace(
            cfg.encoder, feature_grad_mult=cfg.feature_grad_mult
        )
        self.wavlm = WavLM(
            WavLMModelConfig(
                encoder=enc,
                time_mask=cfg.time_mask,
                channel_mask=cfg.channel_mask,
            ),
            dtype=self.dtype,
            name="wavlm",
        )
        self.decoder = TransformerDecoder(cfg.decoder, self.dtype, name="decoder")
        if cfg.decoder.embed_dim != cfg.encoder.encoder_embed_dim:
            self.enc_proj = nn.Dense(
                cfg.decoder.embed_dim, dtype=self.dtype,
                param_dtype=jnp.float32, name="enc_proj",
            )

    def encode(
        self,
        source: jax.Array,
        lengths: Optional[jax.Array],
        deterministic: bool,
        step: jax.Array | int = 0,
    ):
        cfg = self.cfg
        out = self.wavlm(
            source,
            lengths=lengths,
            mask=cfg.apply_mask and not deterministic,
            deterministic=deterministic,
        )
        h = out.x
        if cfg.freeze_finetune_updates > 0:
            frozen = jnp.asarray(step) < cfg.freeze_finetune_updates
            h = jnp.where(frozen, jax.lax.stop_gradient(h), h)
        if cfg.decoder.embed_dim != cfg.encoder.encoder_embed_dim:
            h = self.enc_proj(h)
        return h, out.padding_mask

    def __call__(
        self,
        source: jax.Array,  # (B, n_samples)
        prev_tokens: jax.Array,  # (B, S) bos-shifted targets
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
        step: jax.Array | int = 0,
    ) -> Seq2SeqOutput:
        h, pad = self.encode(source, lengths, deterministic, step)
        logits = self.decoder(prev_tokens, h, pad, deterministic=deterministic)
        return Seq2SeqOutput(logits=logits, enc_padding_mask=pad)


def cross_entropy_loss(
    logits: jax.Array,  # (B, S, V) fp32
    targets: jax.Array,  # (B, S) int32
    target_mask: jax.Array,  # (B, S) {0,1}
    label_smoothing: float = 0.1,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Label-smoothed NLL, sum-reduced over valid targets (the reference
    trains seq2seq ASR with label_smoothed_cross_entropy, finetune recipes)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    smooth = -lp.mean(axis=-1)
    loss_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    w = target_mask.astype(jnp.float32)
    loss = jnp.sum(loss_tok * w)
    ntokens = jnp.sum(w)
    pred = lp.argmax(-1)
    correct = jnp.sum((pred == targets) * w)
    metrics = {
        "loss": loss,
        "nll_loss": jnp.sum(nll * w),
        "ntokens": ntokens,
        "correct": correct,
        "sample_size": ntokens,
    }
    return loss, ntokens, metrics


def greedy_decode(
    model: Seq2SeqModel,
    variables: Dict,
    source: jax.Array,
    lengths: Optional[jax.Array],
    bos: int,
    eos: int,
    max_len: int = 200,
) -> jax.Array:
    """Greedy autoregressive decode as one jittable `lax.scan`.

    Teacher-forcing re-forward per step over a fixed (B, max_len) token
    buffer: O(S^2) in decoder compute, but entirely static-shape and
    compiled once — the decoder is ~6 layers over <=200 tokens, so this is
    cheap next to the encoder. Returns (B, max_len) ids, eos-padded.
    """

    def apply_dec(tokens, h, pad):
        return model.apply(
            variables, tokens, h, pad,
            method=lambda m, t, hh, pp: m.decoder(t, hh, pp, deterministic=True),
        )

    h, pad = model.apply(
        variables, source, lengths, True,
        method=lambda m, s, l, det: m.encode(s, l, det),
    )
    B = source.shape[0]
    tokens0 = jnp.full((B, max_len + 1), eos, jnp.int32).at[:, 0].set(bos)
    finished0 = jnp.zeros((B,), bool)

    def step(carry, t):
        tokens, finished = carry
        logits = apply_dec(tokens[:, :-1], h, pad)  # (B, max_len, V)
        nxt = logits[:, t, :].argmax(-1).astype(jnp.int32)
        nxt = jnp.where(finished, eos, nxt)
        tokens = tokens.at[:, t + 1].set(nxt)
        finished = finished | (nxt == eos)
        return (tokens, finished), None

    (tokens, _), _ = jax.lax.scan(
        step, (tokens0, finished0), jnp.arange(max_len)
    )
    return tokens[:, 1:]


def _ngram_ban_mask(
    tokens: jax.Array,  # (B, K, L) token history (positions 0..t valid)
    t: jax.Array,  # current last filled position (traced)
    n: int,  # ngram size
    vocab: int,
) -> jax.Array:
    """(B, K, V) {0,1} mask of tokens that would complete an n-gram already
    present in the prefix — pure-JAX replacement for the reference CUDA
    `ngram_repeat_block` kernel (src/fairseq/clib/cuda/ngram_repeat_block*,
    python fallback fairseq/ngram_repeat_block.py:87-150)."""
    B, K, L = tokens.shape
    m = n - 1
    Lw = L - m  # number of window start positions
    # stacked (n-1)-gram windows starting at every i: (B, K, Lw, m)
    wins = jnp.stack([tokens[:, :, j : j + Lw] for j in range(m)], axis=-1)
    # the (n-1)-gram ending at position t: tokens[t-m+1 : t+1]
    start = jnp.maximum(t - m + 1, 0)
    last = jax.lax.dynamic_slice_in_dim(tokens, start, m, axis=2)  # (B,K,m)
    match = jnp.all(wins == last[:, :, None, :], axis=-1)  # (B, K, Lw)
    pos = jnp.arange(Lw)[None, None, :]
    valid = (pos + n - 1 <= t) & (t >= m)
    match = match & valid
    banned = tokens[:, :, m : m + Lw]  # token following each window
    onehot = jax.nn.one_hot(banned, vocab, dtype=jnp.float32)  # (B,K,Lw,V)
    return jnp.max(onehot * match[..., None].astype(jnp.float32), axis=2)


def beam_decode(
    model: Seq2SeqModel,
    variables: Dict,
    source: jax.Array,
    lengths: Optional[jax.Array],
    bos: int,
    eos: int,
    beam_size: int = 5,
    max_len: int = 200,
    len_penalty: float = 1.0,
    no_repeat_ngram: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Static-shape beam search over the seq2seq decoder.

    Reference behavior: fairseq SequenceGenerator
    (/root/reference/src/fairseq/sequence_generator.py:178-438 — beam
    expansion via top-2k over (K*V), eos-finalization with length penalty
    score/len^alpha, no-repeat-ngram blocking). TPU reformulation: beams
    live in the batch axis ((B*K) decoder forwards), one `lax.scan` over
    positions, no dynamic shapes or hypothesis lists; finished beams are
    frozen by forcing eos at zero cost.

    Returns (tokens (B, K, max_len), scores (B, K)) sorted best-first.
    """
    h, pad = model.apply(
        variables, source, lengths, True,
        method=lambda m, s, l, det: m.encode(s, l, det),
    )
    B, T = source.shape[0], h.shape[1]
    K = beam_size
    V = model.cfg.decoder.vocab_size
    hK = jnp.repeat(h, K, axis=0)  # (B*K, T, D)
    padK = None if pad is None else jnp.repeat(pad, K, axis=0)

    def apply_dec(tokens_flat):
        return model.apply(
            variables, tokens_flat, hK, padK,
            method=lambda m, tk, hh, pp: m.decoder(tk, hh, pp,
                                                   deterministic=True),
        )

    tokens0 = jnp.full((B, K, max_len + 1), eos, jnp.int32).at[:, :, 0].set(bos)
    # only beam 0 is live initially (all beams share the bos prefix)
    scores0 = jnp.where(
        jnp.arange(K)[None, :] == 0, 0.0, NEG_INF
    ).astype(jnp.float32).repeat(B, axis=0).reshape(B, K)
    finished0 = jnp.zeros((B, K), bool)
    out_len0 = jnp.full((B, K), max_len, jnp.int32)

    def step(carry, t):
        tokens, scores, finished, out_len = carry
        logits = apply_dec(tokens.reshape(B * K, -1)[:, :-1])
        lp = jax.nn.log_softmax(
            logits.reshape(B, K, max_len, V)[:, :, t, :], axis=-1
        )  # (B, K, V)
        if no_repeat_ngram > 1:
            ban = _ngram_ban_mask(tokens, t, no_repeat_ngram, V)
            lp = lp + ban * NEG_INF
        # frozen beams: only eos continuation, at zero incremental cost
        eos_only = jnp.full((V,), NEG_INF).at[eos].set(0.0)
        lp = jnp.where(finished[..., None], eos_only[None, None, :], lp)

        cand = scores[..., None] + lp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # (B, K)
        src_beam = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(
            tokens, src_beam[:, :, None], axis=1
        ).at[:, :, t + 1].set(tok)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        out_len = jnp.take_along_axis(out_len, src_beam, axis=1)
        newly = (~finished) & (tok == eos)
        out_len = jnp.where(newly, t + 1, out_len)
        finished = finished | newly
        return (tokens, top_scores, finished, out_len), None

    (tokens, scores, finished, out_len), _ = jax.lax.scan(
        step, (tokens0, scores0, finished0, out_len0), jnp.arange(max_len)
    )
    # fairseq length penalty: score / len^alpha (sequence_generator.py:667)
    norm = scores / jnp.maximum(out_len, 1).astype(jnp.float32) ** len_penalty
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(tokens[:, :, 1:], order[:, :, None], axis=1)
    norm = jnp.take_along_axis(norm, order, axis=1)
    return tokens, norm
