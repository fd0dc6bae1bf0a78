"""CTC fine-tune model: forward shapes, freeze gate, pretrain grafting,
and one end-to-end train step that reduces the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unispeech_tpu.configs import (
    HubertPretrainConfig,
    MaskConfig,
    base_encoder_config,
)
from unispeech_tpu.models.ctc import (
    CtcFinetuneConfig,
    CtcFinetuneModel,
    load_pretrained_into,
)
from unispeech_tpu.models.hubert import HubertPretrainModel

TINY = base_encoder_config(
    conv_layers=((32, 10, 5), (32, 8, 4), (32, 4, 2), (32, 4, 2), (32, 4, 2)),
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    relative_position_embedding=True,
    gru_rel_pos=True,
    num_buckets=32,
    max_distance=64,
    dropout=0.0,
    attention_dropout=0.0,
)
VOCAB = 8


def _model():
    return CtcFinetuneModel(
        CtcFinetuneConfig(
            encoder=TINY,
            vocab_size=VOCAB,
            apply_mask=True,
            time_mask=MaskConfig(mask_prob=0.5, mask_length=4),
            freeze_finetune_updates=5,
        )
    )


def _init(model, B=2, n=3200):
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, n))
    variables = model.init(
        {"params": rng, "mask": rng, "dropout": rng}, wav, deterministic=True
    )
    return variables, wav


def test_forward_shapes():
    model = _model()
    variables, wav = _init(model)
    out = model.apply(variables, wav, deterministic=True)
    B, T, V = out.logits.shape
    assert B == 2 and V == VOCAB
    assert out.logits.dtype == jnp.float32
    assert (out.frame_lengths == T).all()
    lengths = jnp.asarray([3200, 1600])
    out = model.apply(variables, wav, lengths, deterministic=True)
    assert out.frame_lengths[1] < out.frame_lengths[0]


def test_freeze_gate_blocks_encoder_grads():
    model = _model()
    variables, wav = _init(model)
    labels = jnp.asarray([[1, 2, 3], [2, 3, 4]], jnp.int32)
    lab_len = jnp.asarray([3, 3], jnp.int32)

    def loss(params, step):
        from unispeech_tpu.ops.ctc import ctc_loss

        out = model.apply(
            {"params": params}, wav, deterministic=True, step=step
        )
        l, _ = ctc_loss(out.logits, out.frame_lengths, labels, lab_len)
        return l

    g_frozen = jax.grad(loss)(variables["params"], 0)
    g_live = jax.grad(loss)(variables["params"], 10)
    enc_frozen = jax.tree_util.tree_leaves(g_frozen["wavlm"])
    enc_live = jax.tree_util.tree_leaves(g_live["wavlm"])
    assert all(float(jnp.abs(g).max()) == 0.0 for g in enc_frozen)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in enc_live)
    # head always trains
    assert float(jnp.abs(g_frozen["proj"]["kernel"]).max()) > 0.0


def test_pretrain_graft():
    pre_cfg = HubertPretrainConfig(
        encoder=TINY, num_classes=(10,), final_dim=16,
        time_mask=MaskConfig(mask_prob=0.5, mask_length=4),
    )
    pre = HubertPretrainModel(pre_cfg)
    rng = jax.random.PRNGKey(1)
    wav = jax.random.normal(rng, (1, 3200))
    T = TINY.num_frames(3200)
    tgt = jnp.zeros((1, T, 1), jnp.int32)
    pre_vars = pre.init({"params": rng, "mask": rng}, wav, tgt, mask=True)

    ft = _model()
    ft_vars, _ = _init(ft)
    grafted = load_pretrained_into(ft_vars["params"], pre_vars["params"])
    # backbone params must now equal the pretrained ones
    a = jax.tree_util.tree_leaves(grafted["wavlm"])
    b = jax.tree_util.tree_leaves(pre_vars["params"]["wavlm"])
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # head untouched
    assert np.array_equal(
        grafted["proj"]["kernel"], ft_vars["params"]["proj"]["kernel"]
    )


def test_ctc_train_step_reduces_loss():
    import optax

    from unispeech_tpu.train.optim import OptimConfig, make_optimizer
    from unispeech_tpu.train.state import create_train_state, make_train_step
    from unispeech_tpu.train.tasks import make_ctc_finetune_loss_fn

    model = CtcFinetuneModel(
        CtcFinetuneConfig(encoder=TINY, vocab_size=VOCAB, apply_mask=False)
    )
    variables, wav = _init(model, B=2, n=3200)
    batch = {
        "source": wav,
        "lengths": jnp.asarray([3200, 3200], jnp.int32),
        "labels": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "label_lengths": jnp.asarray([3, 3], jnp.int32),
    }
    tx = make_optimizer(OptimConfig(lr=1e-3, schedule="fixed", clip_norm=1.0))
    state = create_train_state(variables["params"], tx)
    step = make_train_step(make_ctc_finetune_loss_fn(model), tx)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(8):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]) / float(m["sample_size"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_finetune_cli_valid_wer_drives_best_checkpoint(tmp_path):
    """finetune-ctc with --valid-manifest/--valid-transcripts computes
    valid-time greedy WER/UER (reference ctc.py:161-233) and --best-metric
    wer drives checkpoint selection (best_checkpoint_metric=wer)."""
    import contextlib
    import io
    import json
    import wave

    def write_wav(path, samples, rate=16000):
        pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())

    rngnp = np.random.default_rng(0)
    rows = []
    sizes = [2000, 2100, 2200, 2300, 2000, 2100, 2200, 2300]
    for i, n in enumerate(sizes):
        write_wav(tmp_path / f"u{i}.wav", rngnp.standard_normal(n) * 0.1)
        rows.append(f"u{i}.wav\t{n}")
    (tmp_path / "train.tsv").write_text(f"{tmp_path}\n" + "\n".join(rows) + "\n")
    (tmp_path / "train.ltr").write_text(
        "A |\nB A |\nA B |\nB |\nA |\nB A |\nA B |\nB |\n")

    from unispeech_tpu.train.__main__ import main as train_main

    enc_json = (
        '{"encoder_layers": 2, "encoder_embed_dim": 64, '
        '"encoder_ffn_embed_dim": 128, "encoder_attention_heads": 4, '
        '"conv_layers": [[32, 10, 5], [32, 3, 2]], "conv_pos": 16, '
        '"conv_pos_groups": 4, "num_buckets": 32, "max_distance": 64}'
    )
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        train_main([
            "finetune-ctc",
            "--manifest", str(tmp_path / "train.tsv"),
            "--transcripts", str(tmp_path / "train.ltr"),
            "--valid-manifest", str(tmp_path / "train.tsv"),
            "--valid-transcripts", str(tmp_path / "train.ltr"),
            "--best-metric", "wer",
            "--max-updates", "3",
            "--save-interval-updates", "3",
            "--validate-interval-updates", "2",
            "--max-tokens", "30000",
            "--min-sample-size", "1000",
            "--num-buckets", "2",
            "--warmup-steps", "2",
            "--freeze-finetune-updates", "0",
            "--log-interval", "10",
            "--encoder-json", enc_json,
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ])
    valid_lines = [
        json.loads(l) for l in err.getvalue().splitlines()
        if l.startswith("{") and '"tag": "valid"' in l
    ]
    assert valid_lines, "expected a valid log line"
    assert "wer" in valid_lines[-1] and "uer" in valid_lines[-1]
    assert 0.0 <= valid_lines[-1]["wer"]

    # the step-3 save (validate interval 2 -> last metrics from step 2)
    # carries the WER and is marked best
    from unispeech_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), best_metric="wer")
    assert mgr.best_step() == 3
    mgr.close()
