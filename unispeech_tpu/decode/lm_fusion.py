"""Neural-LM shallow fusion for the CTC prefix beam decoder.

Reference capability: `W2lFairseqLMDecoder`
(/root/reference/src/examples/speech_recognition/w2l_decoder.py:417-560) —
a word-level fairseq TransformerLM scores each completed word during the
lexicon beam search; scores combine as am + lm_weight * lm + word_score
(same contract as the KenLM wrapper, so `CtcBeamDecoder` takes either).

TPU reformulation: the reference keeps per-hypothesis incremental decoder
state; here the LM is a pure function over whole prefixes. Each distinct
prefix's next-word log-softmax is computed once (memoized) by a jitted
fixed-length forward — prefixes are right-padded to the model's scoring
window so ONE compiled program serves every call (no dynamic shapes,
no per-state tensors).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from unispeech_tpu.data.dictionary import Dictionary
from unispeech_tpu.models.lm import TransformerLM, TransformerLMConfig


class NeuralLMScorer:
    """Word-level LM scorer with `.start()` / `.score(state, word)`.

    state = tuple of word-ids consumed so far (starting with <s>); score
    returns (new_state, log p(word | state)) in natural log. Unknown words
    score via <unk> (reference w2l_decoder.py:499-505 does the same).
    """

    def __init__(
        self,
        params,
        cfg: TransformerLMConfig,
        word_dict: Dictionary,
        window: int = 128,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.dict = word_dict
        self.window = window
        model = TransformerLM(cfg, dtype=dtype)
        pad = cfg.padding_idx

        def logprobs(tokens):  # (1, window) padded prefix
            logits = model.apply({"params": params}, tokens)
            return jax.nn.log_softmax(logits[0], axis=-1)  # (window, V)

        self._logprobs = jax.jit(logprobs)
        self._pad = pad
        self._cache: Dict[Tuple[int, ...], np.ndarray] = {}

    def start(self):
        return (self.dict.eos(),)  # fairseq LMs condition on </s> as BOS

    def _next_logprobs(self, state: Tuple[int, ...]) -> np.ndarray:
        got = self._cache.get(state)
        if got is not None:
            return got
        ctx = state[-self.window:]
        toks = np.full((1, self.window), self._pad, np.int32)
        toks[0, : len(ctx)] = ctx
        lp = np.asarray(self._logprobs(jnp.asarray(toks)))
        out = lp[len(ctx) - 1]  # next-token distribution after the prefix
        self._cache[state] = out
        return out

    def score(self, state, word: str):
        wid = self.dict.index(word)
        lp = self._next_logprobs(tuple(state))
        return tuple(state) + (wid,), float(lp[wid])

    def finish(self, state) -> float:
        """log p(</s> | state) — sentence-end bonus (w2l_decoder.py:546)."""
        return float(self._next_logprobs(tuple(state))[self.dict.eos()])


def load_neural_lm(
    checkpoint: str, dict_path: str, window: int = 128
) -> NeuralLMScorer:
    """Load a TransformerLM trained by `python -m unispeech_tpu.train lm`
    (.npz flat params + json config alongside)."""
    import json
    import os

    from unispeech_tpu.train.checkpoint import load_params_npz

    word_dict = Dictionary.load(dict_path)
    cfg_path = os.path.splitext(checkpoint)[0] + ".json"
    if not os.path.exists(cfg_path):
        # fallback: train-lm also writes <checkpoint_dir>/lm_config.json
        alt = os.path.join(os.path.dirname(checkpoint) or ".", "lm_config.json")
        if os.path.exists(alt):
            cfg_path = alt
    with open(cfg_path) as f:
        cfg = TransformerLMConfig(**json.load(f))
    params = load_params_npz(checkpoint)
    return NeuralLMScorer(params, cfg, word_dict, window=window)
