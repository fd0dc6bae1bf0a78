"""CLI: `python -m unispeech_tpu.decode ...` — offline CTC inference + WER.

Replaces the reference's offline eval driver
(/root/reference/src/examples/speech_recognition/infer.py:261-340): load a
fine-tuned CTC model, batch a manifest by length, run jitted emissions on
the chip, decode host-side (best-path or lexicon/KenLM prefix beam), write
hypo/ref files, and report WER/UER.

TPU design notes:
  * batches are length-sorted and padded to a fixed bucket grid so the
    emissions function compiles once per bucket, not per batch;
  * emissions (log-softmax) are computed on device in one jit; everything
    after the (T, V) log-prob matrix is host-side python, as in the
    reference (w2l_decoder.py decoders run on CPU there too).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def _parse_args(argv=None):
    p = argparse.ArgumentParser("unispeech_tpu.decode")
    p.add_argument("--manifest", required=True, help="eval TSV manifest")
    p.add_argument("--checkpoint", required=True, nargs="+",
                   help="fine-tuned params .npz; pass several to decode an "
                        "ensemble (log-prob average on device, reference "
                        "infer.py:281 load_model_ensemble)")
    p.add_argument("--transcripts", default=None,
                   help="reference transcripts, one letter-format line per "
                        "manifest row; omit for hypothesis-only decoding")
    p.add_argument("--dict", default=None, help="target dictionary (letters "
                   "default, matching finetune-ctc)")
    p.add_argument("--arch", choices=["base", "large"], default="base")
    p.add_argument("--no-rel-pos", action="store_true")
    p.add_argument("--unroll-layers", action="store_true",
                   help="match checkpoints trained with --unroll-layers "
                        "(per-layer params instead of the scan stack)")
    p.add_argument("--encoder-json", default=None,
                   help="JSON dict of EncoderConfig field overrides (e.g. "
                        "toy shapes for smoke tests)")
    p.add_argument("--decoder",
                   choices=["viterbi", "beam", "kenlm", "neural", "seq2seq"],
                   default="viterbi")
    p.add_argument("--decoder-json", default=None,
                   help="(--decoder seq2seq) JSON dict of "
                        "Seq2SeqDecoderConfig overrides")
    p.add_argument("--seq2seq-beam", type=int, default=5)
    p.add_argument("--max-decode-len", type=int, default=200)
    p.add_argument("--len-penalty", type=float, default=1.0)
    p.add_argument("--no-repeat-ngram", type=int, default=0)
    p.add_argument("--beam", type=int, default=50)
    p.add_argument("--beam-threshold", type=float, default=25.0)
    p.add_argument("--lexicon", default=None,
                   help="word -> space-separated units, one per line")
    p.add_argument("--lm-model", default=None,
                   help="KenLM .arpa/.bin path, or (--decoder neural) a "
                        "TransformerLM params .npz with its .json config")
    p.add_argument("--lm-dict", default=None,
                   help="word dictionary of the neural LM")
    p.add_argument("--lm-weight", type=float, default=2.0)
    p.add_argument("--word-score", type=float, default=-1.0)
    p.add_argument("--post-process", default="letter",
                   help="symbol collapse rule (reference post_process)")
    p.add_argument("--max-tokens", type=int, default=1_280_000)
    p.add_argument("--batch-size", type=int, default=0,
                   help="cap sentences per batch (0 = token budget only)")
    p.add_argument("--results-path", default=None,
                   help="directory for hypo.units/hypo.word/ref files")
    p.add_argument("--normalize", action="store_true",
                   help="per-utterance input layer-norm (Large models)")
    return p.parse_args(argv)


def load_lexicon(path: str) -> Dict[str, List[str]]:
    """word TAB/space units... (reference flashlight load_words format)."""
    lex: Dict[str, List[str]] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").replace("\t", " ").split()
            if not parts:
                continue
            lex.setdefault(parts[0], []).append(parts[1:])
    return lex


def build_decoder(args, dictionary):
    from unispeech_tpu.decode.beam import CtcBeamDecoder, KenLMWrapper

    blank = dictionary.blank()
    if args.decoder == "viterbi":
        return None  # best-path, handled inline
    lexicon = None
    if args.lexicon:
        raw = load_lexicon(args.lexicon)
        lexicon = {
            w: [[dictionary.index(u) for u in sp] for sp in sps]
            for w, sps in raw.items()
        }
    lm = None
    if args.decoder == "kenlm":
        if not args.lm_model:
            sys.exit("--decoder kenlm requires --lm-model")
        lm = KenLMWrapper(args.lm_model)
    elif args.decoder == "neural":
        # shallow fusion with a jax TransformerLM (reference
        # W2lFairseqLMDecoder, w2l_decoder.py:417)
        if not (args.lm_model and args.lm_dict):
            sys.exit("--decoder neural requires --lm-model and --lm-dict")
        from unispeech_tpu.decode.lm_fusion import load_neural_lm

        lm = load_neural_lm(args.lm_model, args.lm_dict)
    sil = dictionary.index("|") if "|" in dictionary else None
    return CtcBeamDecoder(
        beam=args.beam,
        blank_id=blank,
        silence_id=sil,
        lexicon=lexicon,
        lm=lm,
        lm_weight=args.lm_weight,
        word_score=args.word_score,
        beam_threshold=args.beam_threshold,
    )


def plan_eval_batches(
    sizes: np.ndarray, max_tokens: int, max_sentences: int, buckets: np.ndarray
) -> List[np.ndarray]:
    """Length-sorted batches under a token budget over *bucketed* lengths, so
    every batch compiles to one of a few shapes (reference sorts by length
    too: ordered_indices; infer.py uses max_tokens batching)."""
    order = np.argsort(sizes, kind="stable")
    batches: List[List[int]] = []
    cur: List[int] = []
    cur_bucket = 0
    for i in order:
        b = int(buckets[np.searchsorted(buckets, sizes[i])])
        n_next = (len(cur) + 1) * b
        if cur and (
            n_next > max_tokens
            or (max_sentences and len(cur) >= max_sentences)
            or b != cur_bucket
        ):
            batches.append(cur)
            cur = []
        cur_bucket = b
        cur.append(int(i))
    if cur:
        batches.append(cur)
    return [np.asarray(b) for b in batches]


def run_seq2seq(args) -> None:
    """Offline seq2seq (attention decoder) evaluation: batched beam search
    with length penalty + no-repeat-ngram, WER report — the seq2seq side of
    the reference eval surface (Wav2Vec2Seq2SeqModel decoded by fairseq's
    SequenceGenerator, /root/reference/src/fairseq/sequence_generator.py)."""
    import jax
    import jax.numpy as jnp

    from unispeech_tpu.configs import base_encoder_config, large_encoder_config
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest, load_audio
    from unispeech_tpu.decode.wer import WerScorer, post_process
    from unispeech_tpu.models.seq2seq import (
        Seq2SeqConfig,
        Seq2SeqDecoderConfig,
        Seq2SeqModel,
        beam_decode,
    )
    from unispeech_tpu.train.checkpoint import load_params_npz

    d = Dictionary.load(args.dict) if args.dict else Dictionary.letters()
    enc_fn = base_encoder_config if args.arch == "base" else large_encoder_config
    enc = enc_fn(
        relative_position_embedding=not args.no_rel_pos,
        gru_rel_pos=not args.no_rel_pos,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        encoder_layerdrop=0.0,
        **({"scan_layers": False} if args.unroll_layers else {}),
    )
    import dataclasses

    if args.encoder_json:
        over = json.loads(args.encoder_json)
        if "conv_layers" in over:
            over["conv_layers"] = tuple(tuple(c) for c in over["conv_layers"])
        enc = dataclasses.replace(enc, **over)
    dec = Seq2SeqDecoderConfig(vocab_size=len(d), padding_idx=d.pad())
    if args.decoder_json:
        dec = dataclasses.replace(dec, **json.loads(args.decoder_json))
    cfg = Seq2SeqConfig(encoder=enc, decoder=dec, apply_mask=False)
    model = Seq2SeqModel(cfg, dtype=jnp.bfloat16)
    if len(args.checkpoint) > 1:
        sys.exit("--decoder seq2seq supports a single checkpoint")
    params = load_params_npz(args.checkpoint[0])
    eos = d.eos()

    @jax.jit
    def decode(source, lengths):
        return beam_decode(
            model, {"params": params}, source, lengths, eos, eos,
            beam_size=args.seq2seq_beam, max_len=args.max_decode_len,
            len_penalty=args.len_penalty,
            no_repeat_ngram=args.no_repeat_ngram,
        )

    man = Manifest.load(args.manifest)
    sizes = np.asarray(man.sizes)
    lo, hi = int(sizes.min()), int(sizes.max())
    buckets = [lo]
    while buckets[-1] < hi:
        buckets.append(int(np.ceil(buckets[-1] * 1.3 / 320) * 320))
    buckets = np.asarray(buckets)
    batches = plan_eval_batches(sizes, args.max_tokens, args.batch_size,
                                buckets)
    refs = None
    if args.transcripts:
        refs = open(args.transcripts).read().splitlines()
        assert len(refs) == len(man)

    scorer = WerScorer()
    hypo_word_f = None
    if args.results_path:
        os.makedirs(args.results_path, exist_ok=True)
        hypo_word_f = open(os.path.join(args.results_path, "hypo.word"), "w")

    t0 = time.perf_counter()
    total_audio = 0.0
    n_done = 0
    for batch_idx in batches:
        wavs = [load_audio(man.abspath(int(i)), 16_000) for i in batch_idx]
        if args.normalize:
            wavs = [(w - w.mean()) / np.sqrt(w.var() + 1e-5) for w in wavs]
        lengths = np.asarray([len(w) for w in wavs], dtype=np.int32)
        Tb = int(buckets[np.searchsorted(buckets, lengths.max())])
        source = np.zeros((len(wavs), Tb), dtype=np.float32)
        for r, w in enumerate(wavs):
            source[r, : len(w)] = w
        total_audio += float(lengths.sum()) / 16_000.0
        toks, _ = decode(jnp.asarray(source), jnp.asarray(lengths))
        toks = np.asarray(toks)[:, 0]  # best beam
        for r, i in enumerate(batch_idx):
            ids = []
            for t in toks[r].tolist():
                if t == eos:
                    break
                ids.append(t)
            hyp = post_process(d.string(ids), args.post_process)
            if hypo_word_f:
                hypo_word_f.write(f"{hyp} ({i})\n")
            if refs is not None:
                ref = post_process(refs[int(i)], args.post_process)
                scorer.add(hyp, ref)
            n_done += 1
    if hypo_word_f:
        hypo_word_f.close()

    dt = time.perf_counter() - t0
    report = {
        "utterances": n_done,
        "audio_sec": round(total_audio, 1),
        "rtf_inv": round(total_audio / dt, 1),
    }
    if refs is not None:
        report["wer"] = round(scorer.wer, 4)
        report["uer"] = round(scorer.uer, 4)
    print(json.dumps(report))
    if args.results_path:
        with open(os.path.join(args.results_path, "wer_report.json"), "w") as f:
            json.dump(report, f, indent=1)


def main(argv=None) -> None:
    args = _parse_args(argv)

    if args.decoder == "seq2seq":
        run_seq2seq(args)
        return

    import jax
    import jax.numpy as jnp

    from unispeech_tpu.configs import base_encoder_config, large_encoder_config
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest, load_audio
    from unispeech_tpu.decode.beam import best_path_decode
    from unispeech_tpu.decode.wer import WerScorer, post_process
    from unispeech_tpu.models.ctc import CtcFinetuneConfig, CtcFinetuneModel
    from unispeech_tpu.train.checkpoint import load_params_npz

    d = Dictionary.load(args.dict) if args.dict else Dictionary.letters()
    enc_fn = base_encoder_config if args.arch == "base" else large_encoder_config
    enc = enc_fn(
        relative_position_embedding=not args.no_rel_pos,
        gru_rel_pos=not args.no_rel_pos,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        encoder_layerdrop=0.0,
        **({"scan_layers": False} if args.unroll_layers else {}),
    )
    if args.encoder_json:
        import dataclasses

        over = json.loads(args.encoder_json)
        if "conv_layers" in over:
            over["conv_layers"] = tuple(tuple(c) for c in over["conv_layers"])
        enc = dataclasses.replace(enc, **over)
    cfg = CtcFinetuneConfig(encoder=enc, vocab_size=len(d), apply_mask=False)
    model = CtcFinetuneModel(cfg, dtype=jnp.bfloat16)
    # ensemble: N same-architecture checkpoints, log-probs averaged in
    # probability space on device (reference EnsembleModel,
    # sequence_generator.py:756-767: logsumexp over models - log N;
    # checkpoints loaded as in checkpoint_utils.py:384)
    params_list = [load_params_npz(p) for p in args.checkpoint]

    @jax.jit
    def emissions(source, lengths):
        lps = []
        flen = None
        for params in params_list:
            out = model.apply(
                {"params": params}, source, lengths=lengths, deterministic=True
            )
            lps.append(jax.nn.log_softmax(out.logits, axis=-1))
            flen = out.frame_lengths
        if len(lps) == 1:
            return lps[0], flen
        lp = jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(
            float(len(lps))
        )
        return lp, flen

    man = Manifest.load(args.manifest)
    sizes = np.asarray(man.sizes)
    # bucket grid: powers-of-√2 style multiples of the frame hop, ≤16 shapes
    lo, hi = int(sizes.min()), int(sizes.max())
    buckets = [lo]
    while buckets[-1] < hi:
        buckets.append(int(np.ceil(buckets[-1] * 1.3 / 320) * 320))
    buckets = np.asarray(buckets)
    batches = plan_eval_batches(sizes, args.max_tokens, args.batch_size, buckets)

    refs: Optional[List[str]] = None
    if args.transcripts:
        refs = open(args.transcripts).read().splitlines()
        assert len(refs) == len(man), "one transcript line per manifest row"

    decoder = build_decoder(args, d)
    scorer = WerScorer()
    unit_scorer = WerScorer()
    hypo_units_f = hypo_word_f = ref_units_f = ref_word_f = None
    if args.results_path:
        os.makedirs(args.results_path, exist_ok=True)
        hypo_units_f = open(os.path.join(args.results_path, "hypo.units"), "w")
        hypo_word_f = open(os.path.join(args.results_path, "hypo.word"), "w")
        if refs is not None:
            ref_units_f = open(os.path.join(args.results_path, "ref.units"), "w")
            ref_word_f = open(os.path.join(args.results_path, "ref.word"), "w")

    t0 = time.perf_counter()
    total_audio = 0.0
    n_done = 0
    for batch_idx in batches:
        wavs = []
        for i in batch_idx:
            wav = load_audio(man.abspath(int(i)), 16_000)
            if args.normalize:
                wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
            wavs.append(wav)
        lengths = np.asarray([len(w) for w in wavs], dtype=np.int32)
        Tb = int(buckets[np.searchsorted(buckets, lengths.max())])
        source = np.zeros((len(wavs), Tb), dtype=np.float32)
        for r, w in enumerate(wavs):
            source[r, : len(w)] = w
        total_audio += float(lengths.sum()) / 16_000.0

        lp, flen = emissions(jnp.asarray(source), jnp.asarray(lengths))
        lp = np.asarray(lp, dtype=np.float32)
        flen = np.asarray(flen)

        for r, i in enumerate(batch_idx):
            if decoder is None:
                units = best_path_decode(lp[r], int(flen[r]), blank_id=d.blank())
                words: Optional[List[str]] = None
            else:
                nbest = decoder.decode(lp[r], int(flen[r]))
                units, words, _ = nbest[0] if nbest else ([], [], 0.0)
            unit_str = d.string(units)
            # lexicon-free decodes derive words from the unit string
            word_str = (
                " ".join(words)
                if words
                else post_process(unit_str, args.post_process)
            )
            if hypo_units_f:
                hypo_units_f.write(f"{unit_str} ({i})\n")
                hypo_word_f.write(f"{word_str} ({i})\n")
            if refs is not None:
                ref_unit_str = refs[int(i)]
                ref_word_str = post_process(ref_unit_str, args.post_process)
                scorer.add(word_str, ref_word_str)
                unit_scorer.add(
                    " ".join(unit_str.split()), " ".join(ref_unit_str.split())
                )
                if ref_units_f:
                    ref_units_f.write(f"{ref_unit_str} ({i})\n")
                    ref_word_f.write(f"{ref_word_str} ({i})\n")
            n_done += 1

    for f in (hypo_units_f, hypo_word_f, ref_units_f, ref_word_f):
        if f:
            f.close()

    dt = time.perf_counter() - t0
    report = {
        "utterances": n_done,
        "audio_sec": round(total_audio, 1),
        "rtf_inv": round(total_audio / dt, 1),  # audio-sec decoded per second
    }
    if refs is not None:
        report["wer"] = round(scorer.wer, 4)
        report["uer"] = round(unit_scorer.wer, 4)
    print(json.dumps(report))
    if args.results_path:
        with open(os.path.join(args.results_path, "wer_report.json"), "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
