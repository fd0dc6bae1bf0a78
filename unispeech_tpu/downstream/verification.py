"""CLI: `python -m unispeech_tpu.downstream.verification` — speaker
verification trial scoring.

Reference behavior (/root/reference/downstreams/speaker_verification/
verification.py:36-62): for each trial (label, enroll_wav, test_wav), embed
both utterances with the SSL backbone + ECAPA-TDNN head, cosine-score, and
report EER over the trial list.

Trial file format (VoxCeleb style): "label path1 path2" per line.

TPU design: utterances are batched by length bucket and embedded in one
jitted (backbone layer-sweep -> weighted sum -> ECAPA) pass; each unique
wav is embedded once and trials are scored from the embedding cache.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Tuple

import numpy as np


def parse_trials(path: str) -> List[Tuple[int, str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            out.append((int(parts[0]), parts[1], parts[2]))
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser("unispeech_tpu.downstream.verification")
    p.add_argument("--trials", required=True, help="label path1 path2 lines")
    p.add_argument("--wav-root", default="", help="prefix for trial paths")
    p.add_argument("--backbone", required=True, help="pretrained params .npz")
    p.add_argument("--head", default=None,
                   help="ECAPA head params .npz (random init if absent — "
                        "useful only for smoke testing)")
    p.add_argument("--arch", choices=["base", "large"], default="base")
    p.add_argument("--encoder-json", default=None,
                   help="JSON EncoderConfig overrides (toy smoke tests)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-samples", type=int, default=16000 * 20)
    p.add_argument("--scores-path", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from unispeech_tpu.configs import base_encoder_config, large_encoder_config
    from unispeech_tpu.data.manifest import load_audio
    from unispeech_tpu.downstream.ecapa_tdnn import (
        EcapaConfig,
        EcapaTdnn,
        compute_eer,
        cosine_score,
    )
    from unispeech_tpu.models.wavlm import WavLM, WavLMModelConfig
    from unispeech_tpu.train.checkpoint import load_params_npz

    enc_fn = base_encoder_config if args.arch == "base" else large_encoder_config
    enc = enc_fn(
        relative_position_embedding=True, gru_rel_pos=True,
        dropout=0.0, attention_dropout=0.0, encoder_layerdrop=0.0,
    )
    if args.encoder_json:
        import dataclasses

        over = json.loads(args.encoder_json)
        if "conv_layers" in over:
            over["conv_layers"] = tuple(tuple(c) for c in over["conv_layers"])
        enc = dataclasses.replace(enc, **over)

    backbone = WavLM(WavLMModelConfig(encoder=enc), dtype=jnp.bfloat16)
    bb_params = load_params_npz(args.backbone)
    head = EcapaTdnn(EcapaConfig(num_layer_feats=enc.encoder_layers + 1))

    trials = parse_trials(args.trials)
    uniq = sorted({p for _, a, b in trials for p in (a, b)})

    import os

    def load(path):
        wav = load_audio(os.path.join(args.wav_root, path), 16_000)
        return wav[: args.max_samples]

    # head init (or restore)
    probe = load(uniq[0])
    probe_feats = backbone.apply(
        {"params": bb_params}, jnp.asarray(probe[None, :]),
        collect_layer_outputs=True,
    ).layer_outputs
    rng = jax.random.PRNGKey(0)
    head_vars = head.init({"params": rng}, probe_feats)
    if args.head:
        head_params = load_params_npz(args.head)
        head_vars = {**head_vars, "params": head_params}

    @jax.jit
    def embed(source, lengths):
        out = backbone.apply(
            {"params": bb_params}, source, lengths=lengths,
            collect_layer_outputs=True,
        )
        return head.apply(head_vars, out.layer_outputs, out.padding_mask)

    # batch unique wavs by padded length (single bucket per batch)
    sizes = {u: len(load(u)) for u in uniq}
    order = sorted(uniq, key=lambda u: sizes[u])
    embs: Dict[str, np.ndarray] = {}
    for i in range(0, len(order), args.batch_size):
        chunk = order[i : i + args.batch_size]
        wavs = [load(u) for u in chunk]
        T = int(np.ceil(max(len(w) for w in wavs) / 320) * 320)
        src = np.zeros((len(wavs), T), np.float32)
        lens = np.zeros((len(wavs),), np.int32)
        for r, w in enumerate(wavs):
            src[r, : len(w)] = w
            lens[r] = len(w)
        e = np.asarray(embed(jnp.asarray(src), jnp.asarray(lens)), np.float32)
        for r, u in enumerate(chunk):
            embs[u] = e[r]

    labels = np.asarray([t[0] for t in trials])
    scores = np.asarray([
        float(cosine_score(jnp.asarray(embs[a]), jnp.asarray(embs[b])))
        for _, a, b in trials
    ])
    eer = compute_eer(scores, labels)
    if args.scores_path:
        with open(args.scores_path, "w") as f:
            for (lab, a, b), s in zip(trials, scores):
                f.write(f"{s:.5f} {lab} {a} {b}\n")
    print(json.dumps({"trials": len(trials), "eer": round(eer * 100, 4)}))


if __name__ == "__main__":
    main()
