"""Pure-python ARPA LM (decode/arpa.py): scoring vs hand computation, the
KenLMWrapper fallback gate, and KenLM-decoded valid-time WER
(make_ctc_valid_decode_fn decoder='kenlm'), matching the reference's
wer_args dev decoding (/root/reference/src/fairseq/criterions/ctc.py:86-104)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unispeech_tpu.decode.arpa import ArpaLM

LN10 = math.log(10.0)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.5\t<s>\t-0.3
-1.0\t</s>
-0.7\ta\t-0.2
-0.9\tb\t-0.1
-2.0\t<unk>

\\2-grams:
-0.3\t<s> a
-0.4\ta b

\\end\\
"""


@pytest.fixture()
def lm(tmp_path):
    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


def test_arpa_scores_match_hand_computation(lm):
    assert lm.order == 2
    st = lm.start()
    # bigram hit: P(a | <s>) = 10^-0.3
    st, s = lm.score(st, "a")
    assert s == pytest.approx(-0.3 * LN10)
    # bigram hit: P(b | a) = 10^-0.4
    st_b, s = lm.score(st, "b")
    assert s == pytest.approx(-0.4 * LN10)
    # backoff: P(a | a) = b(a) * P(a) = 10^(-0.2 + -0.7)
    _, s = lm.score(st, "a")
    assert s == pytest.approx(-0.9 * LN10)
    # OOV maps to <unk>: b(a) * P(<unk>)
    _, s = lm.score(st, "zzz")
    assert s == pytest.approx(-2.2 * LN10)
    # sentence end from state (b,): b(b) * P(</s>)
    assert lm.finish(st_b) == pytest.approx(-1.1 * LN10)


def test_kenlm_wrapper_falls_back_to_arpa(tmp_path):
    from unispeech_tpu.decode.beam import KenLMWrapper

    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    try:
        import kenlm  # noqa
        has_kenlm = True
    except ImportError:
        has_kenlm = False
    wrapped = KenLMWrapper(str(p))
    if not has_kenlm:
        assert isinstance(wrapped, ArpaLM)
        with pytest.raises(ImportError):
            KenLMWrapper(str(tmp_path / "x.bin"))
    st = wrapped.start()
    _, s = wrapped.score(st, "a")
    assert np.isfinite(s)


def test_valid_decode_fn_kenlm(tmp_path):
    """decoder='kenlm' + lexicon: valid stats carry LM-decoded WER sums."""
    from unispeech_tpu.configs import base_encoder_config
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.models.ctc import CtcFinetuneConfig, CtcFinetuneModel
    from unispeech_tpu.train.state import TrainState
    from unispeech_tpu.train.tasks import make_ctc_valid_decode_fn

    p = tmp_path / "tiny.arpa"
    p.write_text(ARPA)
    d = Dictionary.letters()
    enc = base_encoder_config(
        conv_layers=((16, 10, 5), (16, 8, 4), (16, 4, 2)),
        encoder_layers=1, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
        encoder_attention_heads=2, dropout=0.0, attention_dropout=0.0,
        relative_position_embedding=False, gru_rel_pos=False,
    )
    model = CtcFinetuneModel(
        CtcFinetuneConfig(encoder=enc, vocab_size=len(d), apply_mask=False)
    )
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 3200))
    variables = model.init({"params": rng}, wav[:1], deterministic=True)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"], opt_state=())

    lexicon = {
        "a": [[d.index("A"), d.index("|")]],
        "b": [[d.index("B"), d.index("|")]],
    }
    fn = make_ctc_valid_decode_fn(
        model, d, decoder="kenlm", beam=4, lexicon=lexicon,
        lm_path=str(p), lm_weight=1.0,
    )
    # letter format: "|" terminates each word, so "B | A |" is two words
    labels = np.zeros((2, 4), np.int32)
    for r, txt in enumerate(["A |", "B | A |"]):
        ids = [d.index(t) for t in txt.split()]
        labels[r, : len(ids)] = ids
    stats = fn(state, {
        "source": wav,
        "lengths": jnp.asarray([3200, 3200], jnp.int32),
        "labels": labels,
        "label_lengths": np.asarray([2, 4], np.int32),
    })
    assert set(stats) == {"wer_errs", "wer_len", "uer_errs", "uer_len"}
    assert stats["wer_len"] == 3.0  # "a" + "b a" reference words
    assert stats["wer_errs"] >= 0.0 and np.isfinite(stats["wer_errs"])
