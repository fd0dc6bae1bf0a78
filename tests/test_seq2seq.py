"""Seq2seq fine-tune head: TransformerDecoder + Wav2Vec2Seq2SeqModel analog
(/root/reference/src/fairseq/models/wav2vec/wav2vec2_asr.py:267-305,442-658)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unispeech_tpu.configs import EncoderConfig, MaskConfig
from unispeech_tpu.models.seq2seq import (
    Seq2SeqConfig,
    Seq2SeqDecoderConfig,
    Seq2SeqModel,
    TransformerDecoder,
    cross_entropy_loss,
    greedy_decode,
    sinusoidal_positions,
)


def _tiny_enc():
    return EncoderConfig(
        encoder_layers=2,
        encoder_embed_dim=64,
        encoder_ffn_embed_dim=128,
        encoder_attention_heads=4,
        conv_layers=((32, 10, 5), (32, 3, 2)),
        conv_pos=16,
        conv_pos_groups=4,
        dropout=0.0,
        attention_dropout=0.0,
        encoder_layerdrop=0.0,
    )


def _tiny_dec(**over):
    kw = dict(
        vocab_size=20, embed_dim=64, ffn_embed_dim=128, layers=2, heads=4,
        max_target_positions=64,
    )
    kw.update(over)
    return Seq2SeqDecoderConfig(**kw)


def test_sinusoidal_table_properties():
    t = sinusoidal_positions(32, 16, padding_idx=1)
    assert t.shape == (34, 16)
    np.testing.assert_allclose(np.asarray(t[1]), 0.0)  # pad row zeroed
    # [sin | cos] halves: position 0 row has sin(0)=0, cos(0)=1
    np.testing.assert_allclose(np.asarray(t[0, :8]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0, 8:]), 1.0, atol=1e-6)


def test_decoder_causality():
    """Logits at position t must not depend on tokens after t."""
    dec = TransformerDecoder(_tiny_dec())
    rng = jax.random.PRNGKey(0)
    B, S, T = 2, 10, 7
    tokens = jax.random.randint(rng, (B, S), 3, 20)
    enc = jax.random.normal(rng, (B, T, 64))
    variables = dec.init({"params": rng}, tokens, enc, None)

    out1 = dec.apply(variables, tokens, enc, None)
    tokens2 = tokens.at[:, 6:].set(5)  # perturb the future
    out2 = dec.apply(variables, tokens2, enc, None)
    np.testing.assert_allclose(
        np.asarray(out1[:, :6]), np.asarray(out2[:, :6]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out1[:, 6:]), np.asarray(out2[:, 6:]))


def test_decoder_respects_encoder_padding():
    dec = TransformerDecoder(_tiny_dec())
    rng = jax.random.PRNGKey(1)
    B, S, T = 2, 6, 9
    tokens = jax.random.randint(rng, (B, S), 3, 20)
    enc = jax.random.normal(rng, (B, T, 64))
    pad = jnp.zeros((B, T), bool).at[:, 6:].set(True)
    variables = dec.init({"params": rng}, tokens, enc, pad)
    out1 = dec.apply(variables, tokens, enc, pad)
    enc2 = enc.at[:, 6:].set(123.0)  # garbage in padded frames
    out2 = dec.apply(variables, tokens, enc2, pad)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_full_model_loss_decreases():
    cfg = Seq2SeqConfig(
        encoder=_tiny_enc(), decoder=_tiny_dec(), apply_mask=False,
        time_mask=MaskConfig(mask_prob=0.0),
    )
    model = Seq2SeqModel(cfg)
    rng = jax.random.PRNGKey(0)
    B, n, S = 2, 4000, 8
    src = jax.random.normal(rng, (B, n))
    prev = jax.random.randint(rng, (B, S), 3, 20).at[:, 0].set(0)
    tgt = jnp.roll(prev, -1, axis=1).at[:, -1].set(2)
    mask = jnp.ones((B, S))

    variables = model.init({"params": rng}, src, prev, deterministic=True)
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            out = model.apply({"params": p}, src, prev, deterministic=True)
            loss, nt, _ = cross_entropy_loss(out.logits, tgt, mask)
            return loss / nt

        loss, g = jax.value_and_grad(lf)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_greedy_decode_matches_stepwise_argmax():
    cfg = Seq2SeqConfig(
        encoder=_tiny_enc(), decoder=_tiny_dec(), apply_mask=False,
        time_mask=MaskConfig(mask_prob=0.0),
    )
    model = Seq2SeqModel(cfg)
    rng = jax.random.PRNGKey(3)
    B, n = 2, 4000
    src = jax.random.normal(rng, (B, n))
    prev = jnp.zeros((B, 4), jnp.int32)
    variables = model.init({"params": rng}, src, prev, deterministic=True)

    bos, eos, max_len = 0, 2, 6
    out = greedy_decode(model, variables, src, None, bos, eos, max_len=max_len)
    assert out.shape == (B, max_len)

    # oracle: python loop calling the full model each step
    h, pad = model.apply(
        variables, src, None, True, method=lambda m, s, l, det: m.encode(s, l, det)
    )
    toks = np.full((B, max_len + 1), eos, np.int32)
    toks[:, 0] = bos
    fin = np.zeros((B,), bool)
    for t in range(max_len):
        logits = model.apply(
            variables, jnp.asarray(toks[:, :-1]), h, pad,
            method=lambda m, tk, hh, pp: m.decoder(tk, hh, pp, deterministic=True),
        )
        nxt = np.asarray(logits)[:, t, :].argmax(-1)
        nxt = np.where(fin, eos, nxt)
        toks[:, t + 1] = nxt
        fin |= nxt == eos
    np.testing.assert_array_equal(np.asarray(out), toks[:, 1:])


def test_label_smoothing_math():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 5)),
                         jnp.float32)
    tgt = jnp.asarray([[1, 2, 3], [0, 4, 2]], jnp.int32)
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]], jnp.float32)
    loss0, nt, m = cross_entropy_loss(logits, tgt, mask, label_smoothing=0.0)
    lp = jax.nn.log_softmax(logits, -1)
    nll = -np.take_along_axis(np.asarray(lp), np.asarray(tgt)[..., None], -1)[..., 0]
    np.testing.assert_allclose(float(loss0), (nll * np.asarray(mask)).sum(), rtol=1e-6)
    assert float(nt) == 5.0
    # smoothing mixes in the uniform term
    loss_s, _, _ = cross_entropy_loss(logits, tgt, mask, label_smoothing=0.1)
    smooth = (-np.asarray(lp).mean(-1) * np.asarray(mask)).sum()
    np.testing.assert_allclose(
        float(loss_s), 0.9 * (nll * np.asarray(mask)).sum() + 0.1 * smooth,
        rtol=1e-6,
    )
