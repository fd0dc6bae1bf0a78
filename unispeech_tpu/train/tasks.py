"""Task glue: build loss_fn closures binding model + criterion.

Replaces the reference task layer's train_step plumbing
(src/fairseq/tasks/fairseq_task.py:475-516) — here a task is just a function
from (params, batch, rng, step) to (loss_sum, sample_size, metrics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from unispeech_tpu.models.ctc import CtcFinetuneModel
from unispeech_tpu.models.hubert import HubertPretrainModel
from unispeech_tpu.models.wav2vec2 import Wav2Vec2PretrainModel
from unispeech_tpu.ops.ctc import ctc_loss
from unispeech_tpu.train.losses import (
    HubertCriterionConfig,
    hubert_loss,
    wav2vec2_contrastive_loss,
)

_RNG_NAMES = ("mask", "dropout", "layerdrop", "instances", "gumbel",
              "negatives", "replace")


def split_rngs(rng: jax.Array) -> Dict[str, jax.Array]:
    keys = jax.random.split(rng, len(_RNG_NAMES))
    return dict(zip(_RNG_NAMES, keys))


def make_hubert_loss_fn(
    model: HubertPretrainModel, crit: HubertCriterionConfig
):
    """Masked-prediction pretraining objective (HuBERT/WavLM/ILS/SAT).

    batch: {"source": (B, n), "targets": (B, T, num_sets),
            "lengths": optional (B,)}
    """

    def loss_fn(params, batch, rng, step):
        out = model.apply(
            {"params": params},
            batch["source"],
            batch["targets"],
            batch.get("lengths"),
            mask=True,
            deterministic=False,
            num_updates=step,
            rngs=split_rngs(rng),
        )
        return hubert_loss(out, crit)

    return loss_fn


def make_wav2vec2_loss_fn(
    model: Wav2Vec2PretrainModel,
    features_pen_weight: float = 0.0,
    prob_ppl_weight: float = 0.1,
    mtlalpha: float = 0.0,
):
    """wav2vec2 InfoNCE; with mtlalpha > 0 adds the UniSpeech phonetic CTC
    multitask term: mtlalpha * ctc + (1-mtlalpha) * infonce
    (src/fairseq/criterions/unispeech_criterion.py:40-50).

    batch: {"source", optional "lengths", for CTC: "labels" (B,S),
            "label_lengths" (B,)}
    """

    def loss_fn(params, batch, rng, step):
        out = model.apply(
            {"params": params},
            batch["source"],
            batch.get("lengths"),
            mask=True,
            deterministic=False,
            num_updates=step,
            rngs=split_rngs(rng),
        )
        valid = (
            jnp.ones_like(out.mask_indices, jnp.float32)
            if out.padding_mask is None
            else (~out.padding_mask).astype(jnp.float32)
        )
        w_m = out.mask_indices.astype(jnp.float32) * valid
        loss_c, ss, metrics = wav2vec2_contrastive_loss(
            out.contrastive_logits,
            w_m,
            out.features_pen,
            out.vq_result,
            features_pen_weight=features_pen_weight,
            prob_ppl_weight=prob_ppl_weight,
        )
        loss = loss_c
        if mtlalpha > 0.0:
            assert out.ctc_logits is not None, "ctc_vocab_size=0 but mtlalpha>0"
            frame_lengths = valid.sum(-1).astype(jnp.int32)
            # ops.ctc_loss normalizes internally (optax applies log_softmax)
            loss_ctc, ntok = ctc_loss(
                out.ctc_logits, frame_lengths,
                batch["labels"], batch["label_lengths"],
            )
            metrics["loss_ctc"] = loss_ctc
            metrics["ctc_ntokens"] = ntok
            loss = mtlalpha * loss_ctc + (1.0 - mtlalpha) * loss_c
        metrics["loss"] = loss
        return loss, ss, metrics

    return loss_fn


def make_ctc_finetune_loss_fn(model: CtcFinetuneModel, deterministic=False):
    """CTC fine-tuning objective (src/fairseq/criterions/ctc.py:113-160).

    batch: {"source" (B,n), "lengths" (B,), "labels" (B,S) pad=dict.pad,
            "label_lengths" (B,)}. sample_size = B (ctc criterion's
    sentence_avg=False uses ntokens; pretrain recipes normalize per sample —
    we report both and normalize by ntokens like the reference default).
    `deterministic=True` builds the eval-loss variant (no dropout/masking).
    """

    def loss_fn(params, batch, rng, step):
        out = model.apply(
            {"params": params},
            batch["source"],
            batch.get("lengths"),
            deterministic=deterministic,
            step=step,
            rngs=split_rngs(rng),
        )
        loss, ntokens = ctc_loss(
            out.logits,
            out.frame_lengths,
            batch["labels"],
            batch["label_lengths"],
        )
        sample_size = ntokens.astype(jnp.float32)
        metrics = {
            "loss": loss,
            "ntokens": sample_size,
            "sample_size": sample_size,
            "nsentences": jnp.float32(batch["source"].shape[0]),
        }
        return loss, sample_size, metrics

    return loss_fn


def make_ctc_valid_decode_fn(
    model,
    dictionary,
    post_process_symbol="letter",
    decoder: str = "greedy",
    beam: int = 50,
    lexicon=None,  # {word: [[unit ids], ...]} (pre-indexed) or None
    lm_path=None,  # KenLM .arpa/.bin (decoder="kenlm")
    lm_weight: float = 2.0,
    word_score: float = -1.0,
):
    """Valid-time CTC decode + WER/UER scoring, mirroring the dev scoring
    inside the reference CTC criterion
    (/root/reference/src/fairseq/criterions/ctc.py:161-233) that drives
    `best_checkpoint_metric=wer` in every fine-tune recipe.

    decoder="greedy" is the criterion's default argmax path; "beam" and
    "kenlm" reuse the offline CtcBeamDecoder so checkpoint selection can
    run on LM-decoded WER, matching the reference's `wer_args` 4-gram
    KenLM dev decoding (ctc.py:86-104, w2l_decoder.py W2lKenLMDecoder).

    Returns (state, batch) -> {"wer_errs", "wer_len", "uer_errs",
    "uer_len"} error/length SUMS for MetricsAggregator; run_validation
    derives the percentages."""
    from unispeech_tpu.decode.wer import WerScorer, post_process

    import numpy as np

    blank = dictionary.blank()
    beam_decoder = None
    if decoder != "greedy":
        from unispeech_tpu.decode.beam import CtcBeamDecoder, KenLMWrapper

        lm = None
        if decoder == "kenlm":
            if not lm_path:
                raise ValueError("valid decoder 'kenlm' needs an LM path")
            lm = KenLMWrapper(lm_path)
        sil = dictionary.index("|") if "|" in dictionary else None
        beam_decoder = CtcBeamDecoder(
            beam=beam, blank_id=blank, silence_id=sil, lexicon=lexicon,
            lm=lm, lm_weight=lm_weight, word_score=word_score,
        )

    @jax.jit
    def greedy(params, source, lengths):
        out = model.apply(
            {"params": params}, source, lengths, deterministic=True
        )
        return jnp.argmax(out.logits, axis=-1), out.frame_lengths

    @jax.jit
    def emissions(params, source, lengths):
        out = model.apply(
            {"params": params}, source, lengths, deterministic=True
        )
        return jax.nn.log_softmax(out.logits, axis=-1), out.frame_lengths

    def decode_fn(state, batch):
        if beam_decoder is not None:
            lp, flens = emissions(
                state.params, batch["source"], batch.get("lengths")
            )
            lp = np.asarray(lp, dtype=np.float32)
            flens = np.asarray(flens)
            labels = np.asarray(batch["labels"])
            label_lengths = np.asarray(batch["label_lengths"])
            sc = WerScorer()
            for b in range(lp.shape[0]):
                nbest = beam_decoder.decode(lp[b], int(flens[b]))
                units, words, _ = nbest[0] if nbest else ([], [], 0.0)
                hyp = (
                    " ".join(words)
                    if words
                    else post_process(dictionary.string(units),
                                      post_process_symbol)
                )
                ref_ids = labels[b, : int(label_lengths[b])].tolist()
                ref = post_process(dictionary.string(ref_ids),
                                   post_process_symbol)
                sc.add(hyp, ref)
            return {
                "wer_errs": float(sc.w_errs), "wer_len": float(sc.w_len),
                "uer_errs": float(sc.c_errs), "uer_len": float(sc.c_len),
            }

        ids, flens = greedy(
            state.params, batch["source"], batch.get("lengths")
        )
        ids = np.asarray(ids)
        flens = np.asarray(flens)
        labels = np.asarray(batch["labels"])
        label_lengths = np.asarray(batch["label_lengths"])
        sc = WerScorer()
        for b in range(ids.shape[0]):
            # greedy path is already argmaxed; collapse repeats + blanks
            path = ids[b, : int(flens[b])]
            hyp_ids, prev = [], -1
            for t in path.tolist():
                if t != blank and t != prev:
                    hyp_ids.append(t)
                prev = t
            hyp = post_process(dictionary.string(hyp_ids),
                               post_process_symbol)
            ref_ids = labels[b, : int(label_lengths[b])].tolist()
            ref = post_process(dictionary.string(ref_ids),
                               post_process_symbol)
            sc.add(hyp, ref)
        return {
            "wer_errs": float(sc.w_errs), "wer_len": float(sc.w_len),
            "uer_errs": float(sc.c_errs), "uer_len": float(sc.c_len),
        }

    return decode_fn


def make_seq2seq_loss_fn(model, label_smoothing: float = 0.1,
                         deterministic=False):
    """Seq2seq ASR fine-tuning objective (reference trains
    Wav2Vec2Seq2SeqModel with label_smoothed_cross_entropy).

    batch: {"source" (B,n), "lengths" (B,), "prev_tokens" (B,S) bos-shifted,
            "targets" (B,S) eos-terminated, "target_mask" (B,S) {0,1}}.
    """
    from unispeech_tpu.models.seq2seq import cross_entropy_loss

    def loss_fn(params, batch, rng, step):
        out = model.apply(
            {"params": params},
            batch["source"],
            batch["prev_tokens"],
            batch.get("lengths"),
            deterministic=deterministic,
            step=step,
            rngs=split_rngs(rng),
        )
        loss, ntokens, metrics = cross_entropy_loss(
            out.logits, batch["targets"], batch["target_mask"], label_smoothing
        )
        metrics["nsentences"] = jnp.float32(batch["source"].shape[0])
        return loss, ntokens.astype(jnp.float32), metrics

    return loss_fn


def make_seq2seq_valid_decode_fn(model, dictionary, max_len: int = 128,
                                 post_process_symbol="letter"):
    """Valid-time greedy decode + WER for seq2seq fine-tuning (reference
    seq2seq valid WER hook,
    /root/reference/src/fairseq/tasks/audio_pretraining.py:361-394).

    Returns (state, batch) -> WER/UER error/length sums."""
    import numpy as np

    from unispeech_tpu.decode.wer import WerScorer, post_process
    from unispeech_tpu.models.seq2seq import greedy_decode

    eos = dictionary.eos()
    bos = eos  # fairseq conditions on </s> as bos

    @jax.jit
    def greedy(params, source, lengths):
        return greedy_decode(
            model, {"params": params}, source, lengths, bos, eos,
            max_len=max_len,
        )

    def decode_fn(state, batch):
        ids = np.asarray(
            greedy(state.params, batch["source"], batch.get("lengths"))
        )
        tgts = np.asarray(batch["targets"])
        tmask = np.asarray(batch["target_mask"])
        sc = WerScorer()
        for b in range(ids.shape[0]):
            hyp_ids = []
            for t in ids[b].tolist():
                if t == eos:
                    break
                hyp_ids.append(t)
            hyp = post_process(dictionary.string(hyp_ids),
                               post_process_symbol)
            L = int(tmask[b].sum()) - 1  # strip the eos terminator
            ref = post_process(dictionary.string(tgts[b, :max(L, 0)].tolist()),
                               post_process_symbol)
            sc.add(hyp, ref)
        return {
            "wer_errs": float(sc.w_errs), "wer_len": float(sc.w_len),
            "uer_errs": float(sc.c_errs), "uer_len": float(sc.c_len),
        }

    return decode_fn


def make_lm_loss_fn(model, padding_idx: int):
    """Next-token CE for TransformerLM (reference language_modeling task +
    cross_entropy criterion, src/fairseq/tasks/language_modeling.py).

    batch: {"tokens": (B, S), "targets": (B, S)} — targets are tokens
    shifted left by one, pad-masked.
    """
    from unispeech_tpu.models.lm import lm_loss

    def loss_fn(params, batch, rng, step):
        logits = model.apply(
            {"params": params}, batch["tokens"], deterministic=False,
            rngs={"dropout": rng},
        )
        loss, n_tokens = lm_loss(logits, batch["targets"], padding_idx)
        metrics = {
            "loss": loss,
            "sample_size": n_tokens,
            "ntokens": n_tokens,
        }
        return loss, n_tokens, metrics

    return loss_fn
