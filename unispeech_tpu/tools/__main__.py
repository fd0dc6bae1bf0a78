"""K-means label pipeline CLI: `python -m unispeech_tpu.tools <subcommand>`

Parity with the reference simple_kmeans scripts
(/root/reference/src/examples/hubert/simple_kmeans/): feature dumps are
sharded over (nshard, rank) workers writing {split}_{rank}_{nshard}.npy/.len,
k-means learns from the dumped shards, and label dumps write
{split}_{rank}_{nshard}.km (concatenate shards with `cat` as in the
reference README).

  dump-features   MFCC-39 or model-layer features (dump_mfcc_feature.py /
                  dump_hubert_feature.py; (nshard, rank) split per
                  get_path_iterator, dump_hubert_feature.py:35-82)
  learn-kmeans    minibatch k-means++ on dumped shards (learn_kmeans.py)
  dump-labels     nearest-centroid frame labels (dump_km_label.py)
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np


def _shard_rows(n: int, nshard: int, rank: int):
    """Reference shard split (dump_mfcc_feature.py get_path_iterator)."""
    shard_size = math.ceil(n / nshard)
    start, end = rank * shard_size, min((rank + 1) * shard_size, n)
    assert start < end, f"empty shard: start={start}, end={end}, tot={n}"
    return start, end


def _feature_fn(args):
    from unispeech_tpu.tools.kmeans import mfcc_39

    if args.feature == "mfcc":
        return lambda wav: mfcc_39(wav)
    # model features at a transformer layer (HubertFeatureReader analog)
    import json

    import jax
    import jax.numpy as jnp

    from unispeech_tpu.configs import (
        WavLMModelConfig,
        base_encoder_config,
        large_encoder_config,
    )
    from unispeech_tpu.models.wavlm import WavLM
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
    model = WavLM(WavLMModelConfig(encoder=enc), dtype=jnp.bfloat16)
    params = load_params_npz(args.checkpoint)
    if "wavlm" in params:
        params = params["wavlm"]

    @jax.jit
    def forward(wav):
        out = model.apply(
            {"params": params}, wav, deterministic=True,
            output_layer=args.layer,
        )
        return out.x.astype(jnp.float32)

    from unispeech_tpu.tools.kmeans import dump_model_features

    def feats(wav):
        return next(dump_model_features(
            lambda x: forward(jnp.asarray(x))[0], [wav],
            max_chunk=args.max_chunk,
        ))

    return feats


def cmd_dump_features(args) -> None:
    from unispeech_tpu.data.manifest import Manifest, load_audio

    man = Manifest.load(args.manifest)
    start, end = _shard_rows(len(man), args.nshard, args.rank)
    print(
        f"rank {args.rank} of {args.nshard}: rows {start}-{end} of {len(man)}",
        file=sys.stderr,
    )
    fn = _feature_fn(args)
    os.makedirs(args.feat_dir, exist_ok=True)
    stem = f"{args.split}_{args.rank}_{args.nshard}"
    feats, lens = [], []
    for i in range(start, end):
        wav = load_audio(man.abspath(i), 16_000)
        f = np.asarray(fn(wav), np.float32)
        feats.append(f)
        lens.append(len(f))
    np.save(os.path.join(args.feat_dir, stem + ".npy"),
            np.concatenate(feats, axis=0))
    with open(os.path.join(args.feat_dir, stem + ".len"), "w") as lf:
        lf.write("\n".join(str(n) for n in lens) + "\n")


def cmd_learn_kmeans(args) -> None:
    from unispeech_tpu.tools.kmeans import learn_kmeans

    feats = []
    rng = np.random.default_rng(args.seed)
    for rank in range(args.nshard):
        stem = f"{args.split}_{rank}_{args.nshard}"
        x = np.load(os.path.join(args.feat_dir, stem + ".npy"))
        if args.percent < 1.0:
            keep = rng.random(len(x)) < args.percent
            x = x[keep]
        feats.append(x)
    n = sum(len(x) for x in feats)
    print(f"learning k-means on {n} frames", file=sys.stderr)
    km = learn_kmeans(feats, n_clusters=args.n_clusters, seed=args.seed,
                      epochs=args.epochs)
    km.save(args.km_path)


def cmd_dump_labels(args) -> None:
    from unispeech_tpu.data.manifest import Manifest, load_audio
    from unispeech_tpu.tools.kmeans import KmeansModel, apply_kmeans

    man = Manifest.load(args.manifest)
    start, end = _shard_rows(len(man), args.nshard, args.rank)
    km = KmeansModel.load(args.km_path)
    fn = _feature_fn(args)
    os.makedirs(args.lab_dir, exist_ok=True)
    stem = f"{args.split}_{args.rank}_{args.nshard}"
    with open(os.path.join(args.lab_dir, stem + ".km"), "w") as f:
        for i in range(start, end):
            wav = load_audio(man.abspath(i), 16_000)
            labs = apply_kmeans(km, np.asarray(fn(wav), np.float32))
            f.write(" ".join(str(int(v)) for v in labs) + "\n")


def _feature_args(p) -> None:
    p.add_argument("--feature", choices=["mfcc", "model"], default="mfcc")
    p.add_argument("--checkpoint", default=None, help="model params .npz")
    p.add_argument("--layer", type=int, default=6,
                   help="1-based transformer layer for model features")
    p.add_argument("--arch", choices=["base", "large"], default="base")
    p.add_argument("--encoder-json", default=None)
    p.add_argument("--max-chunk", type=int, default=1_600_000)


def main(argv=None) -> None:
    p = argparse.ArgumentParser("unispeech_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    df = sub.add_parser("dump-features")
    df.add_argument("--manifest", required=True)
    df.add_argument("--split", default="train")
    df.add_argument("--nshard", type=int, default=1)
    df.add_argument("--rank", type=int, default=0)
    df.add_argument("--feat-dir", required=True)
    _feature_args(df)
    df.set_defaults(fn=cmd_dump_features)

    lk = sub.add_parser("learn-kmeans")
    lk.add_argument("--feat-dir", required=True)
    lk.add_argument("--split", default="train")
    lk.add_argument("--nshard", type=int, default=1)
    lk.add_argument("--n-clusters", type=int, default=100)
    lk.add_argument("--percent", type=float, default=1.0,
                    help="fraction of frames to sample (learn_kmeans.py)")
    lk.add_argument("--epochs", type=int, default=2)
    lk.add_argument("--seed", type=int, default=0)
    lk.add_argument("--km-path", required=True)
    lk.set_defaults(fn=cmd_learn_kmeans)

    dl = sub.add_parser("dump-labels")
    dl.add_argument("--manifest", required=True)
    dl.add_argument("--split", default="train")
    dl.add_argument("--nshard", type=int, default=1)
    dl.add_argument("--rank", type=int, default=0)
    dl.add_argument("--km-path", required=True)
    dl.add_argument("--lab-dir", required=True)
    _feature_args(dl)
    dl.set_defaults(fn=cmd_dump_labels)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
