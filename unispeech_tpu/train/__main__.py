"""CLI: `python -m unispeech_tpu.train <subcommand> ...`

Replaces the reference's hydra/argparse train driver
(/root/reference/src/train.py -> fairseq_cli/train.py:cli_main) and its
shell-script recipes (src/examples/hubert/scripts/pretrain.sh etc.) with
three subcommands covering the recipe surface:

  pretrain-hubert   HuBERT / WavLM / ILS / UniSpeech-SAT masked prediction
  pretrain-wav2vec2 wav2vec2 contrastive (+ UniSpeech CTC multitask)
  finetune-ctc      CTC ASR fine-tune from a pretrained checkpoint
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--manifest", required=True, help="train TSV manifest")
    p.add_argument("--valid-manifest", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--max-updates", type=int, default=400_000)
    p.add_argument("--max-tokens", type=int, default=1_400_000)
    p.add_argument("--max-sample-size", type=int, default=250_000)
    p.add_argument("--min-sample-size", type=int, default=32_000)
    p.add_argument("--num-buckets", type=int, default=8,
                   help="distinct batch shapes (= compiled step programs)")
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--warmup-steps", type=int, default=32_000)
    p.add_argument("--clip-norm", type=float, default=0.0)
    p.add_argument("--stacked-optimizer", action="store_true",
                   help="group same-shape param leaves for the adam update "
                        "(fewer, bigger fusions; pairs with "
                        "--unroll-layers; leave off with --fsdp)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--save-interval-updates", type=int, default=25_000)
    p.add_argument("--arch", choices=["base", "large"], default="base")
    p.add_argument("--encoder-json", default=None,
                   help="JSON dict of EncoderConfig overrides")
    p.add_argument("--n-model", type=int, default=1, help="tensor-parallel mesh axis")
    p.add_argument("--fsdp", action="store_true", help="ZeRO-3 param sharding")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--tensorboard-dir", default=None)
    p.add_argument("--wandb-project", default=None,
                   help="mirror progress to Weights & Biases (needs wandb)")
    p.add_argument("--azureml", action="store_true",
                   help="mirror progress to the Azure ML run context")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation (reference update_freq)")
    p.add_argument("--inner-steps", type=int, default=1,
                   help="optimizer steps per device dispatch: K distinct "
                        "microbatches scanned in-graph (amortizes host "
                        "dispatch on high-latency runtimes)")
    p.add_argument("--unroll-layers", action="store_true",
                   help="unroll transformer layers instead of nn.scan: "
                        "per-layer params, no stacked-dW update-slice "
                        "copies (~15%% faster Base steps on v5e; scan "
                        "keeps compile time down and enables scan-remat "
                        "for Large)")
    # multi-host bootstrap (reference distributed_init, distributed/utils.py)
    p.add_argument("--export-params", default=None,
                   help="write final params as flat .npz (for --w2v-path / "
                        "decode --checkpoint / downstream CLIs)")
    p.add_argument("--hang-timeout", type=float, default=0.0,
                   help="dump stacks if a step exceeds this many seconds "
                        "(0 disables; DistributedTimeoutWrapper analog)")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 for multi-host runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _encoder(args, **over):
    import dataclasses
    import json as _json

    from unispeech_tpu.configs import base_encoder_config, large_encoder_config

    fn = base_encoder_config if args.arch == "base" else large_encoder_config
    enc = fn(**over)
    if getattr(args, "unroll_layers", False):
        enc = dataclasses.replace(enc, scan_layers=False)
    if getattr(args, "encoder_json", None):
        extra = _json.loads(args.encoder_json)
        if "conv_layers" in extra:
            extra["conv_layers"] = tuple(tuple(c) for c in extra["conv_layers"])
        enc = dataclasses.replace(enc, **extra)
    return enc


def _loop_cfg(args):
    from unispeech_tpu.train.loop import LoopConfig

    return LoopConfig(
        max_updates=args.max_updates,
        log_interval=args.log_interval,
        save_interval_updates=args.save_interval_updates,
        validate_interval_updates=getattr(
            args, "validate_interval_updates", None
        ) or args.save_interval_updates,
        checkpoint_dir=args.checkpoint_dir,
        seed=args.seed,
        n_model=args.n_model,
        fsdp=args.fsdp,
        tensorboard_dir=args.tensorboard_dir,
        wandb_project=getattr(args, "wandb_project", None),
        azureml=getattr(args, "azureml", False),
        accum_steps=args.accum_steps,
        inner_steps=getattr(args, "inner_steps", 1),
        export_params=getattr(args, "export_params", None),
        best_metric=getattr(args, "best_metric", None) or "loss_avg",
        hang_timeout_s=getattr(args, "hang_timeout", 0.0),
    )


def _data_cfg(args, **over):
    from unispeech_tpu.data.dataset import DataConfig

    return DataConfig(
        max_sample_size=args.max_sample_size,
        min_sample_size=args.min_sample_size,
        max_tokens=args.max_tokens,
        num_buckets=args.num_buckets,
        **over,
    )


def cmd_pretrain_hubert(args) -> None:
    from unispeech_tpu.configs import HubertPretrainConfig, MaskConfig
    from unispeech_tpu.data.dataset import PretrainIterator
    from unispeech_tpu.data.labels import LabelFile
    from unispeech_tpu.data.manifest import Manifest
    from unispeech_tpu.data.mixing import MixingConfig, NoiseStore
    from unispeech_tpu.models.hubert import HubertPretrainModel
    from unispeech_tpu.train.loop import run_training
    from unispeech_tpu.train.losses import HubertCriterionConfig
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.tasks import make_hubert_loss_fn

    enc = _encoder(
        args,
        relative_position_embedding=not args.no_rel_pos,
        gru_rel_pos=not args.no_rel_pos,
        encoder_layerdrop=0.05,
    )
    labels = [LabelFile(p, args.label_rate) for p in args.labels]
    num_classes = tuple(int(n) for n in args.num_classes)
    cfg = HubertPretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=args.mask_prob, mask_length=10),
        label_rate=args.label_rate,
        num_classes=num_classes,
        final_dim=256 if args.arch == "base" else 768,
        predict_layers=tuple(args.predict_layers or ()),
        utterance_contrastive_loss=args.sat,
        num_instances=1 if args.sat else 0,
    )
    model = HubertPretrainModel(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    man = Manifest.load(args.manifest)
    mixing = (
        MixingConfig(
            mixing_prob=args.mixing_prob,
            mixing_num=args.mixing_num,
            mixing_noise_prob=args.noise_prob,
        )
        if args.mixing_prob > 0
        else None
    )
    noise = NoiseStore(args.noise_path) if args.noise_path else None
    data = PretrainIterator(
        man,
        _data_cfg(args, label_rate=args.label_rate),
        label_files=labels,
        frame_hop=enc.frame_hop,
        frames_fn=enc.num_frames,
        mixing=mixing,
        noise=noise,
        seed=args.seed,
        num_shards=jax.process_count(),
        shard_id=jax.process_index(),
    )
    crit = HubertCriterionConfig(
        spk_loss_weight=0.1 if args.sat else 0.0,
    )
    loss_fn = make_hubert_loss_fn(model, crit)
    tx = make_optimizer(
        OptimConfig(
            lr=args.lr, warmup_steps=args.warmup_steps,
            total_steps=args.max_updates, clip_norm=args.clip_norm,
                    stacked_update=getattr(args, 'stacked_optimizer', False),
        )
    )
    rng = jax.random.PRNGKey(args.seed)
    init_batch = next(iter(data.epoch_batches(1)))
    run_training(
        model, loss_fn, tx, iter(data), init_batch, _loop_cfg(args),
        init_rngs={"params": rng, "mask": rng},
        data_state=data,
    )


def cmd_pretrain_wav2vec2(args) -> None:
    from unispeech_tpu.configs import MaskConfig, Wav2Vec2PretrainConfig
    from unispeech_tpu.data.dataset import FinetuneIterator, PretrainIterator
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest
    from unispeech_tpu.models.wav2vec2 import Wav2Vec2PretrainModel
    from unispeech_tpu.train.loop import run_training
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.tasks import make_wav2vec2_loss_fn

    enc = _encoder(args)
    unispeech = args.mtlalpha > 0
    d = Dictionary.load(args.dict) if unispeech else None
    cfg = Wav2Vec2PretrainConfig(
        encoder=enc,
        time_mask=MaskConfig(mask_prob=args.mask_prob, mask_length=10),
        transpose=unispeech,
        ctc_vocab_size=len(d) if d else 0,
        replace_prob=args.replace_prob,
    )
    model = Wav2Vec2PretrainModel(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    # multilingual: comma-separated per-language manifests enable temperature
    # resampling (reference audio_pretraining.py:270-308)
    man_paths = args.manifest.split(",")
    lang_groups = None
    if len(man_paths) > 1:
        from unispeech_tpu.data.multilingual import concat_manifests

        man, lang_groups = concat_manifests(
            [Manifest.load(p) for p in man_paths]
        )
    else:
        man = Manifest.load(args.manifest)
    ml_kw = dict(lang_groups=lang_groups, multilang_alpha=args.multilang_alpha)
    dc = _data_cfg(args)
    if unispeech:
        texts = []
        for p in args.transcripts.split(","):
            texts.extend(open(p).read().splitlines())
        data = FinetuneIterator(
            man, dc, texts, d, seed=args.seed,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            **ml_kw,
        )
    else:
        data = PretrainIterator(
            man, dc, seed=args.seed,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            **ml_kw,
        )
    loss_fn = make_wav2vec2_loss_fn(model, mtlalpha=args.mtlalpha)
    tx = make_optimizer(
        OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.max_updates, clip_norm=args.clip_norm,
                    stacked_update=getattr(args, 'stacked_optimizer', False))
    )
    rng = jax.random.PRNGKey(args.seed)
    init_batch = next(iter(data.epoch_batches(1)))
    run_training(
        model, loss_fn, tx, iter(data), init_batch, _loop_cfg(args),
        init_rngs={"params": rng, "mask": rng, "gumbel": rng, "negatives": rng},
        data_state=data,
    )


def cmd_finetune_ctc(args) -> None:
    from unispeech_tpu.configs import MaskConfig
    from unispeech_tpu.data.dataset import FinetuneIterator
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest
    from unispeech_tpu.models.ctc import (
        CtcFinetuneConfig,
        CtcFinetuneModel,
        load_pretrained_into,
    )
    from unispeech_tpu.train.checkpoint import load_params_npz
    from unispeech_tpu.train.loop import run_training
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.tasks import make_ctc_finetune_loss_fn

    d = Dictionary.load(args.dict) if args.dict else Dictionary.letters()
    enc = _encoder(
        args, relative_position_embedding=not args.no_rel_pos,
        gru_rel_pos=not args.no_rel_pos,
    )
    cfg = CtcFinetuneConfig(
        encoder=enc,
        vocab_size=len(d),
        apply_mask=True,
        time_mask=MaskConfig(mask_prob=args.mask_prob, mask_length=10),
        freeze_finetune_updates=args.freeze_finetune_updates,
        final_dropout=0.1,
    )
    model = CtcFinetuneModel(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    man = Manifest.load(args.manifest)
    texts = open(args.transcripts).read().splitlines()
    data = FinetuneIterator(
        man, _data_cfg(args), texts, d, seed=args.seed,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    loss_fn = make_ctc_finetune_loss_fn(model)
    tx = make_optimizer(
        OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.max_updates, clip_norm=args.clip_norm,
                    stacked_update=getattr(args, 'stacked_optimizer', False),
                    schedule="tri_stage", hold_steps=args.max_updates * 4 // 10)
    )
    rng = jax.random.PRNGKey(args.seed)
    init_batch = next(iter(data.epoch_batches(1)))

    init_params = None
    if args.w2v_path:
        from unispeech_tpu.train.loop import _init_kwargs

        variables = model.init(
            {"params": rng, "mask": rng, "dropout": rng},
            **_init_kwargs(init_batch),
        )
        pre = load_params_npz(args.w2v_path)
        init_params = load_pretrained_into(variables["params"], pre)

    # dev-set decode-and-score every validation pass (reference computes
    # UER/WER inside the CTC criterion and selects checkpoints by WER:
    # ctc.py:161-233, examples/hubert/scripts/finetune.sh)
    valid_kw = {}
    if args.valid_manifest and args.valid_transcripts:
        from unispeech_tpu.train.tasks import make_ctc_valid_decode_fn

        vman = Manifest.load(args.valid_manifest)
        vtexts = open(args.valid_transcripts).read().splitlines()

        def valid_batches_fn():
            vdata = FinetuneIterator(
                vman, _data_cfg(args), vtexts, d, seed=args.seed,
                num_shards=jax.process_count(),
                shard_id=jax.process_index(),
            )
            return vdata.epoch_batches(1)

        valid_lexicon = None
        if args.valid_lexicon:
            from unispeech_tpu.decode.__main__ import load_lexicon

            raw = load_lexicon(args.valid_lexicon)
            valid_lexicon = {
                w: [[d.index(u) for u in sp] for sp in sps]
                for w, sps in raw.items()
            }
        valid_kw = dict(
            valid_batches_fn=valid_batches_fn,
            eval_loss_fn=make_ctc_finetune_loss_fn(model, deterministic=True),
            valid_decode_fn=make_ctc_valid_decode_fn(
                model, d, post_process_symbol=args.post_process,
                decoder=args.valid_decoder, beam=args.valid_beam,
                lexicon=valid_lexicon, lm_path=args.valid_lm_model,
                lm_weight=args.valid_lm_weight,
                word_score=args.valid_word_score,
            ),
        )

    run_training(
        model, loss_fn, tx, iter(data), init_batch, _loop_cfg(args),
        init_rngs={"params": rng, "mask": rng, "dropout": rng},
        data_state=data, init_params=init_params, **valid_kw,
    )


def cmd_finetune_seq2seq(args) -> None:
    """Seq2seq ASR fine-tune (reference Wav2Vec2Seq2SeqModel,
    /root/reference/src/fairseq/models/wav2vec/wav2vec2_asr.py:267-658,
    trained with label_smoothed_cross_entropy; valid WER via greedy decode
    per tasks/audio_pretraining.py:361-394)."""
    import dataclasses

    from unispeech_tpu.configs import MaskConfig
    from unispeech_tpu.data.dataset import Seq2SeqIterator
    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.manifest import Manifest
    from unispeech_tpu.models.ctc import load_pretrained_into
    from unispeech_tpu.models.seq2seq import (
        Seq2SeqConfig,
        Seq2SeqDecoderConfig,
        Seq2SeqModel,
    )
    from unispeech_tpu.train.checkpoint import load_params_npz
    from unispeech_tpu.train.loop import run_training
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.tasks import (
        make_seq2seq_loss_fn,
        make_seq2seq_valid_decode_fn,
    )

    d = Dictionary.load(args.dict) if args.dict else Dictionary.letters()
    enc = _encoder(
        args, relative_position_embedding=not args.no_rel_pos,
        gru_rel_pos=not args.no_rel_pos,
    )
    dec = Seq2SeqDecoderConfig(
        vocab_size=len(d),
        embed_dim=args.decoder_embed_dim,
        ffn_embed_dim=args.decoder_ffn_dim,
        layers=args.decoder_layers,
        heads=args.decoder_heads,
        padding_idx=d.pad(),
    )
    if args.decoder_json:
        dec = dataclasses.replace(dec, **json.loads(args.decoder_json))
    cfg = Seq2SeqConfig(
        encoder=enc,
        decoder=dec,
        apply_mask=True,
        time_mask=MaskConfig(mask_prob=args.mask_prob, mask_length=10),
        freeze_finetune_updates=args.freeze_finetune_updates,
    )
    model = Seq2SeqModel(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    man = Manifest.load(args.manifest)
    texts = open(args.transcripts).read().splitlines()
    data = Seq2SeqIterator(
        man, _data_cfg(args), texts, d, seed=args.seed,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    loss_fn = make_seq2seq_loss_fn(model, label_smoothing=args.label_smoothing)
    tx = make_optimizer(
        OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.max_updates, clip_norm=args.clip_norm,
                    stacked_update=getattr(args, 'stacked_optimizer', False),
                    schedule="tri_stage", hold_steps=args.max_updates * 4 // 10)
    )
    rng = jax.random.PRNGKey(args.seed)
    init_batch = next(iter(data.epoch_batches(1)))

    init_params = None
    if args.w2v_path:
        variables = model.init(
            {"params": rng, "mask": rng, "dropout": rng},
            init_batch["source"][:1],
            init_batch["prev_tokens"][:1],
            deterministic=True,
        )
        pre = load_params_npz(args.w2v_path)
        init_params = load_pretrained_into(variables["params"], pre)

    valid_kw = {}
    if args.valid_manifest and args.valid_transcripts:
        vman = Manifest.load(args.valid_manifest)
        vtexts = open(args.valid_transcripts).read().splitlines()

        def valid_batches_fn():
            vdata = Seq2SeqIterator(
                vman, _data_cfg(args), vtexts, d, seed=args.seed,
                num_shards=jax.process_count(),
                shard_id=jax.process_index(),
            )
            return vdata.epoch_batches(1)

        valid_kw = dict(
            valid_batches_fn=valid_batches_fn,
            eval_loss_fn=make_seq2seq_loss_fn(
                model, label_smoothing=args.label_smoothing,
                deterministic=True,
            ),
            valid_decode_fn=make_seq2seq_valid_decode_fn(
                model, d, max_len=args.valid_decode_max_len,
                post_process_symbol=args.post_process,
            ),
        )

    run_training(
        model, loss_fn, tx, iter(data), init_batch, _loop_cfg(args),
        init_rngs={"params": rng, "mask": rng, "dropout": rng},
        data_state=data, init_params=init_params, **valid_kw,
    )


def cmd_train_lm(args) -> None:
    """Train a word/subword TransformerLM for shallow-fusion decoding
    (reference language_modeling task, src/fairseq/tasks/language_modeling.py;
    consumed by decode --decoder neural)."""
    import json
    import os

    from unispeech_tpu.data.dictionary import Dictionary
    from unispeech_tpu.data.lm_dataset import (
        LMIterator,
        TokenBlockDataset,
        tokenize_corpus,
    )
    from unispeech_tpu.models.lm import TransformerLM, TransformerLMConfig
    from unispeech_tpu.train.loop import run_training
    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.tasks import make_lm_loss_fn

    d = Dictionary.load(args.dict)
    cfg = TransformerLMConfig(
        vocab_size=len(d),
        embed_dim=args.embed_dim,
        ffn_dim=args.ffn_dim,
        layers=args.layers,
        heads=args.heads,
        padding_idx=d.pad(),
        max_positions=max(args.block_size * 2, 2048),
    )
    model = TransformerLM(cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.corpus.endswith(".bin") or os.path.exists(
        args.corpus + ".idx.npz"
    ):
        # mmap'd binarized corpus (python -m unispeech_tpu.data
        # binarize-text) — scales past in-RAM text files
        from unispeech_tpu.data.indexed_dataset import MMapIndexedDataset

        stem = args.corpus[:-4] if args.corpus.endswith(".bin") else args.corpus
        tokens = MMapIndexedDataset(stem).flat
    else:
        tokens = tokenize_corpus(args.corpus, d)
    data = LMIterator(
        TokenBlockDataset(tokens, args.block_size),
        batch_size=args.batch_size or 32,
        padding_idx=d.pad(),
        seed=args.seed,
    )
    loss_fn = make_lm_loss_fn(model, d.pad())
    tx = make_optimizer(
        OptimConfig(lr=args.lr, warmup_steps=args.warmup_steps,
                    total_steps=args.max_updates, clip_norm=args.clip_norm,
                    stacked_update=getattr(args, 'stacked_optimizer', False))
    )
    rng = jax.random.PRNGKey(args.seed)
    it = iter(data)
    init_batch = next(it)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    cfg_json = {k: getattr(cfg, k) for k in (
        "vocab_size", "embed_dim", "ffn_dim", "layers", "heads",
        "dropout", "padding_idx", "max_positions", "learned_pos",
        "normalize_before", "share_input_output_embed")}
    with open(os.path.join(args.checkpoint_dir, "lm_config.json"), "w") as f:
        json.dump(cfg_json, f)
    if getattr(args, "export_params", None):
        # decode --decoder neural loads the config from <stem>.json next to
        # the exported npz (decode/lm_fusion.py:load_neural_lm) — write it
        # there too so the advertised train-lm -> decode pipeline works
        # without manual renames.
        with open(os.path.splitext(args.export_params)[0] + ".json", "w") as f:
            json.dump(cfg_json, f)
    run_training(
        model, loss_fn, tx, it, init_batch, _loop_cfg(args),
        init_rngs={"params": rng, "dropout": rng},
        data_state=data,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("unispeech_tpu.train")
    sub = parser.add_subparsers(dest="cmd", required=True)

    ph = sub.add_parser("pretrain-hubert")
    _common(ph)
    ph.add_argument("--labels", nargs="+", required=True, help=".km label files")
    ph.add_argument("--label-rate", type=float, default=50.0)
    ph.add_argument("--num-classes", nargs="+", default=["504"])
    ph.add_argument("--mask-prob", type=float, default=0.8)
    ph.add_argument("--predict-layers", type=int, nargs="*", default=None,
                    help="ILS: 1-based layers with prediction losses")
    ph.add_argument("--sat", action="store_true",
                    help="UniSpeech-SAT speaker contrastive branch")
    ph.add_argument("--mixing-prob", type=float, default=0.0)
    ph.add_argument("--mixing-num", type=int, default=1)
    ph.add_argument("--noise-path", default=None,
                    help="noise store: reference JSON-of-h5py-slices or a "
                         "TSV audio manifest (WavLM denoising)")
    ph.add_argument("--noise-prob", type=float, default=0.0,
                    help="probability a mix overlays noise instead of speech")
    ph.add_argument("--no-rel-pos", action="store_true")
    ph.set_defaults(fn=cmd_pretrain_hubert)

    pw = sub.add_parser("pretrain-wav2vec2")
    _common(pw)
    pw.add_argument("--mask-prob", type=float, default=0.65)
    pw.add_argument("--mtlalpha", type=float, default=0.0,
                    help=">0 enables UniSpeech CTC multitask")
    pw.add_argument("--replace-prob", type=float, default=0.5)
    pw.add_argument("--dict", default=None, help="phone dict for UniSpeech CTC")
    pw.add_argument("--transcripts", default=None,
                    help="comma-separated per-language transcript files when "
                         "--manifest is comma-separated")
    pw.add_argument("--multilang-alpha", type=float, default=1.0,
                    help="temperature resampling alpha over comma-separated "
                         "per-language manifests (audio_pretraining.py:211)")
    pw.set_defaults(fn=cmd_pretrain_wav2vec2)

    fc = sub.add_parser("finetune-ctc")
    _common(fc)
    fc.add_argument("--transcripts", required=True,
                    help="one letter-format line per manifest row")
    fc.add_argument("--dict", default=None)
    fc.add_argument("--w2v-path", default=None, help="pretrained params .npz")
    fc.add_argument("--mask-prob", type=float, default=0.65)
    fc.add_argument("--freeze-finetune-updates", type=int, default=10_000)
    fc.add_argument("--no-rel-pos", action="store_true")
    fc.add_argument("--valid-transcripts", default=None,
                    help="dev transcripts (with --valid-manifest enables "
                         "valid-time greedy WER/UER scoring)")
    fc.add_argument("--best-metric", default="loss_avg",
                    choices=["loss_avg", "wer", "uer"],
                    help="checkpoint-selection metric (reference "
                         "best_checkpoint_metric=wer)")
    fc.add_argument("--valid-decoder", default="greedy",
                    choices=["greedy", "beam", "kenlm"],
                    help="dev decode for valid-time WER: greedy argmax "
                         "(criterion default) or beam/KenLM via the "
                         "offline decoder (reference wer_args, "
                         "ctc.py:86-104)")
    fc.add_argument("--valid-beam", type=int, default=50)
    fc.add_argument("--valid-lexicon", default=None,
                    help="word -> units lexicon for the valid beam decode")
    fc.add_argument("--valid-lm-model", default=None,
                    help="KenLM .arpa/.bin for --valid-decoder kenlm")
    fc.add_argument("--valid-lm-weight", type=float, default=2.0)
    fc.add_argument("--valid-word-score", type=float, default=-1.0)
    fc.add_argument("--post-process", default="letter",
                    help="hyp/ref detokenization rule")
    fc.add_argument("--validate-interval-updates", type=int, default=None)
    fc.set_defaults(fn=cmd_finetune_ctc)

    fs = sub.add_parser("finetune-seq2seq")
    _common(fs)
    fs.add_argument("--transcripts", required=True,
                    help="one letter-format line per manifest row")
    fs.add_argument("--dict", default=None)
    fs.add_argument("--w2v-path", default=None, help="pretrained params .npz")
    fs.add_argument("--mask-prob", type=float, default=0.5)
    fs.add_argument("--freeze-finetune-updates", type=int, default=10_000)
    fs.add_argument("--no-rel-pos", action="store_true")
    fs.add_argument("--label-smoothing", type=float, default=0.1)
    fs.add_argument("--decoder-embed-dim", type=int, default=768)
    fs.add_argument("--decoder-ffn-dim", type=int, default=3072)
    fs.add_argument("--decoder-layers", type=int, default=6)
    fs.add_argument("--decoder-heads", type=int, default=4)
    fs.add_argument("--decoder-json", default=None,
                    help="JSON dict of Seq2SeqDecoderConfig overrides")
    fs.add_argument("--valid-transcripts", default=None)
    fs.add_argument("--valid-decode-max-len", type=int, default=128)
    fs.add_argument("--best-metric", default="loss_avg",
                    choices=["loss_avg", "wer", "uer"])
    fs.add_argument("--post-process", default="letter")
    fs.add_argument("--validate-interval-updates", type=int, default=None)
    fs.set_defaults(fn=cmd_finetune_seq2seq)

    lm = sub.add_parser("train-lm")
    lm.add_argument("--corpus", required=True, help="tokenized text file")
    lm.add_argument("--dict", required=True, help="word/subword dictionary")
    lm.add_argument("--block-size", type=int, default=128)
    lm.add_argument("--batch-size", type=int, default=32)
    lm.add_argument("--embed-dim", type=int, default=512)
    lm.add_argument("--ffn-dim", type=int, default=2048)
    lm.add_argument("--layers", type=int, default=6)
    lm.add_argument("--heads", type=int, default=8)
    lm.add_argument("--checkpoint-dir", default="checkpoints")
    lm.add_argument("--max-updates", type=int, default=50_000)
    lm.add_argument("--lr", type=float, default=5e-4)
    lm.add_argument("--warmup-steps", type=int, default=4_000)
    lm.add_argument("--clip-norm", type=float, default=0.0)
    lm.add_argument("--seed", type=int, default=1)
    lm.add_argument("--log-interval", type=int, default=100)
    lm.add_argument("--save-interval-updates", type=int, default=10_000)
    lm.add_argument("--n-model", type=int, default=1)
    lm.add_argument("--fsdp", action="store_true")
    lm.add_argument("--bf16", action="store_true", default=True)
    lm.add_argument("--tensorboard-dir", default=None)
    lm.add_argument("--accum-steps", type=int, default=1)
    lm.add_argument("--export-params", default=None)
    lm.add_argument("--coordinator-address", default=None)
    lm.add_argument("--num-processes", type=int, default=None)
    lm.add_argument("--process-id", type=int, default=None)
    lm.set_defaults(fn=cmd_train_lm)

    args = parser.parse_args(argv)
    # must run before any other jax use so every host sees the global mesh
    from unispeech_tpu.parallel.bootstrap import maybe_initialize_distributed

    maybe_initialize_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    args.fn(args)


if __name__ == "__main__":
    main()
