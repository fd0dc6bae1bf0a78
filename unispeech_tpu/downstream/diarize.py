"""CLI: `python -m unispeech_tpu.downstream.diarize` — speaker diarization
inference + optional DER scoring.

Reference behavior (/root/reference/downstreams/speaker_diarization/
diarization.py:18-110): SSL features -> chunked EEND inference -> AHC over
speaker vectors (cannot-link within chunk) -> median filter -> RTTM; scored
with md-eval DER. Here the whole per-chunk path (backbone + diarization
head) runs as one jitted function on fixed chunk shapes.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser("unispeech_tpu.downstream.diarize")
    p.add_argument("--manifest", required=True, help="TSV of recordings")
    p.add_argument("--backbone", required=True, help="pretrained params .npz")
    p.add_argument("--head", default=None,
                   help="diarization head params .npz (random init if absent "
                        "— smoke testing only)")
    p.add_argument("--arch", choices=["base", "large"], default="base")
    p.add_argument("--encoder-json", default=None)
    p.add_argument("--chunk-frames", type=int, default=2000)
    p.add_argument("--num-speakers", type=int, default=3)
    p.add_argument("--threshold", type=float, default=0.6)
    p.add_argument("--median-width", type=int, default=11)
    p.add_argument("--rttm-dir", default=None)
    p.add_argument("--ref-rttm", default=None, help="reference RTTM to score")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unispeech_tpu.configs import base_encoder_config, large_encoder_config
    from unispeech_tpu.data.manifest import Manifest, load_audio
    from unispeech_tpu.downstream.diarization import (
        DiarizationConfig,
        TransformerDiarization,
        chunked_diarization,
        compute_der,
        to_rttm,
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
    head = TransformerDiarization(
        DiarizationConfig(num_speakers=args.num_speakers)
    )

    @jax.jit
    def features(source):
        return backbone.apply({"params": bb_params}, source).x

    rng = jax.random.PRNGKey(0)
    head_vars = None

    @jax.jit
    def head_infer(feats):
        out = head.apply(head_vars, feats[None])
        return out.logits[0], out.spk_vectors[0]

    man = Manifest.load(args.manifest)
    frame_shift = enc.frame_hop / 16_000.0
    results = {}
    hyp_rttms = {}
    for i in range(len(man)):
        wav = load_audio(man.abspath(i), 16_000)
        # pad to x320 so the frame count is exact
        n = int(np.ceil(len(wav) / 320) * 320)
        src = np.zeros((1, n), np.float32)
        src[0, : len(wav)] = wav
        feats = np.asarray(features(jnp.asarray(src))[0], np.float32)
        if head_vars is None:
            head_vars = head.init(
                {"params": rng}, jnp.asarray(feats[None, : args.chunk_frames])
            )
            if args.head:
                head_vars = {**head_vars, "params": load_params_npz(args.head)}
        act = chunked_diarization(
            head_infer, feats,
            chunk_size=args.chunk_frames,
            threshold=args.threshold,
            median_width=args.median_width,
        )
        uri = os.path.splitext(os.path.basename(man.paths[i]))[0]
        rttm = to_rttm(act.astype(int), frame_shift, uri=uri)
        hyp_rttms[uri] = rttm
        results[uri] = {"speakers": int(act.shape[1]), "frames": int(act.shape[0])}
        if args.rttm_dir:
            os.makedirs(args.rttm_dir, exist_ok=True)
            with open(os.path.join(args.rttm_dir, f"{uri}.rttm"), "w") as f:
                f.write(rttm + "\n")

    report = {"recordings": len(results)}
    if args.ref_rttm:
        ref_all = open(args.ref_rttm).read()
        # score each uri against the matching reference lines
        ders = []
        for uri, rttm in hyp_rttms.items():
            ref_lines = "\n".join(
                l for l in ref_all.splitlines() if f" {uri} " in l
            )
            if ref_lines:
                ders.append(compute_der(ref_lines, rttm)["der"])
        if ders:
            report["der"] = round(float(np.mean(ders)) * 100, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
