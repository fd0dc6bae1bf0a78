"""Neural LM (TransformerLM + shallow fusion) and seq2seq beam search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unispeech_tpu.data.dictionary import Dictionary
from unispeech_tpu.models.lm import TransformerLM, TransformerLMConfig, lm_loss


def _word_dict(words):
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    return d


def _tiny_lm(vocab, rng):
    cfg = TransformerLMConfig(
        vocab_size=vocab, embed_dim=32, ffn_dim=64, layers=2, heads=2,
        dropout=0.0, max_positions=64,
    )
    model = TransformerLM(cfg)
    params = model.init({"params": rng}, jnp.zeros((1, 8), jnp.int32))["params"]
    return cfg, model, params


def test_lm_forward_shapes_and_loss():
    rng = jax.random.PRNGKey(0)
    cfg, model, params = _tiny_lm(17, rng)
    toks = jax.random.randint(rng, (3, 12), 2, 17)
    logits = model.apply({"params": params}, toks)
    assert logits.shape == (3, 12, 17)
    loss, n = lm_loss(logits, toks, padding_idx=cfg.padding_idx)
    assert n == 3 * 12 - int((np.asarray(toks) == cfg.padding_idx).sum())
    assert np.isfinite(float(loss))


def test_lm_causality():
    """Changing a future token must not change past predictions."""
    rng = jax.random.PRNGKey(1)
    cfg, model, params = _tiny_lm(17, rng)
    toks = jax.random.randint(rng, (1, 10), 2, 17)
    toks2 = toks.at[0, 7].set((toks[0, 7] + 1) % 15 + 2)
    a = model.apply({"params": params}, toks)
    b = model.apply({"params": params}, toks2)
    np.testing.assert_allclose(
        np.asarray(a[0, :7]), np.asarray(b[0, :7]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(a[0, 7:]), np.asarray(b[0, 7:]))


def test_lm_training_learns_toy_grammar():
    """A deterministic cyclic sequence should become near-perfectly
    predictable in a few hundred steps (language_modeling task parity)."""
    import optax

    rng = jax.random.PRNGKey(2)
    V = 12
    cfg, model, params = _tiny_lm(V, rng)
    seq = np.tile(np.arange(4, 10), 30)[None, :48].astype(np.int32)
    toks = jnp.asarray(seq[:, :-1])
    tgts = jnp.asarray(seq[:, 1:])

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            logits = model.apply({"params": p}, toks)
            loss, n = lm_loss(logits, tgts, cfg.padding_idx)
            return loss / n

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for i in range(150):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2, (first, float(loss))


def test_neural_lm_fusion_changes_beam_output():
    """Shallow fusion must re-rank lexicon beam hypotheses (reference
    W2lFairseqLMDecoder behavior)."""
    from unispeech_tpu.decode.beam import CtcBeamDecoder
    from unispeech_tpu.decode.lm_fusion import NeuralLMScorer

    # unit vocab: blank=0 handled by dict.blank(); letters a,b,d plus |
    units = _word_dict(["|", "a", "b", "d"])
    sil = units.index("|")
    ia, ib, idd = units.index("a"), units.index("b"), units.index("d")
    words = _word_dict(["ab", "ad"])
    lexicon = {"ab": [[ia, ib]], "ad": [[ia, idd]]}

    # emissions: ambiguous second letter, slight acoustic preference for d
    T, V = 4, len(units)
    em = np.full((T, V), -8.0, np.float32)
    em[0, ia] = -0.1
    em[1, ib] = -0.8
    em[1, idd] = -0.6
    em[2, sil] = -0.1
    em[3, units.blank()] = -0.1

    rng = jax.random.PRNGKey(3)
    cfg, model, params = _tiny_lm(len(words), rng)

    class Biased(NeuralLMScorer):
        def _next_logprobs(self, state):
            lp = np.full((len(words),), -10.0, np.float32)
            lp[words.index("ab")] = -0.01  # LM loves "ab"
            return lp

    no_lm = CtcBeamDecoder(
        beam=8, blank_id=units.blank(), silence_id=sil, lexicon=lexicon
    )
    best_no_lm = no_lm.decode(em)[0][1]
    assert best_no_lm == ["ad"]

    lm = Biased(params, cfg, words, window=8)
    with_lm = CtcBeamDecoder(
        beam=8, blank_id=units.blank(), silence_id=sil, lexicon=lexicon,
        lm=lm, lm_weight=5.0, word_score=0.0,
    )
    best_with_lm = with_lm.decode(em)[0][1]
    assert best_with_lm == ["ab"]

    # the real (unbiased) scorer also runs end to end and returns finite logp
    real = NeuralLMScorer(params, cfg, words, window=8)
    st = real.start()
    st2, s = real.score(st, "ab")
    assert np.isfinite(s) and s < 0.0
    assert st2 == st + (words.index("ab"),)


def _tiny_seq2seq(rng):
    from unispeech_tpu.configs import base_encoder_config
    from unispeech_tpu.models.seq2seq import (
        Seq2SeqConfig,
        Seq2SeqDecoderConfig,
        Seq2SeqModel,
    )

    enc = base_encoder_config(
        encoder_layers=1, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2,
        conv_layers=((16, 10, 5), (16, 8, 4)),
        relative_position_embedding=False, use_flash_attention=False,
    )
    dec = Seq2SeqDecoderConfig(
        vocab_size=20, embed_dim=32, ffn_embed_dim=64, layers=1, heads=2,
        dropout=0.0, max_target_positions=64,
    )
    cfg = Seq2SeqConfig(encoder=enc, decoder=dec, apply_mask=False)
    model = Seq2SeqModel(cfg)
    wav = jax.random.normal(rng, (2, 2000))
    toks = jax.random.randint(rng, (2, 8), 3, 20)
    variables = model.init(
        {"params": rng}, wav, toks, None, deterministic=True
    )
    return model, variables, wav


def test_beam_matches_greedy_at_beam_one():
    from unispeech_tpu.models.seq2seq import beam_decode, greedy_decode

    rng = jax.random.PRNGKey(4)
    model, variables, wav = _tiny_seq2seq(rng)
    bos, eos = 0, 2
    g = greedy_decode(model, variables, wav, None, bos, eos, max_len=12)
    b, scores = beam_decode(
        model, variables, wav, None, bos, eos, beam_size=1, max_len=12
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b[:, 0]))


def test_beam_returns_sorted_distinct_hypotheses():
    from unispeech_tpu.models.seq2seq import beam_decode

    rng = jax.random.PRNGKey(5)
    model, variables, wav = _tiny_seq2seq(rng)
    bos, eos = 0, 2
    toks, s4 = beam_decode(model, variables, wav, None, bos, eos,
                           beam_size=4, max_len=12)
    s4 = np.asarray(s4)
    assert toks.shape == (2, 4, 12)
    assert np.all(np.isfinite(s4))
    # best-first ordering by length-normalized score
    assert np.all(np.diff(s4, axis=1) <= 1e-6)
    # hypotheses within a beam are not all identical
    rows = {tuple(r) for r in np.asarray(toks[0])}
    assert len(rows) > 1


def test_ngram_ban_mask():
    from unispeech_tpu.models.seq2seq import _ngram_ban_mask

    # prefix: 5 6 5 — at t=2 (last token 5), bigram "5 6" exists, so 6 is
    # banned; nothing else is
    toks = jnp.asarray([[[5, 6, 5, 0, 0]]], jnp.int32)
    ban = _ngram_ban_mask(toks, jnp.int32(2), 2, 10)
    assert ban.shape == (1, 1, 10)
    assert float(ban[0, 0, 6]) == 1.0
    assert float(ban.sum()) == 1.0
    # too-short prefix: no bans
    ban0 = _ngram_ban_mask(toks, jnp.int32(0), 2, 10)
    assert float(ban0.sum()) == 0.0


def test_beam_no_repeat_ngram_blocks_loops():
    from unispeech_tpu.models.seq2seq import beam_decode

    rng = jax.random.PRNGKey(6)
    model, variables, wav = _tiny_seq2seq(rng)
    bos, eos = 0, 2
    toks, _ = beam_decode(
        model, variables, wav, None, bos, eos, beam_size=2, max_len=16,
        no_repeat_ngram=2,
    )
    for row in np.asarray(toks[:, 0]):
        seq = [bos] + [int(x) for x in row]
        if eos in seq[1:]:
            seq = seq[: seq[1:].index(eos) + 1]  # up to (excl) first eos
        bigrams = set()
        for a, b in zip(seq, seq[1:]):
            assert (a, b) not in bigrams, (seq, (a, b))
            bigrams.add((a, b))
