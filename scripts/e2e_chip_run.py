"""End-to-end product-path run ON THE CHIP: labels -> pretrain -> CTC
fine-tune -> decode WER, driven through the real CLIs.

The sandbox has no speech corpora (zero egress), so the corpus is
synthesized tone-coded "speech": each letter is a distinct windowed
harmonic tone; words are 2-4 letters; silence marks boundaries. This is the
same end-to-end contract as BASELINE configs 2-3 — data pipeline, kmeans
label pipeline, pretrain loop with checkpointing, backbone grafting,
CTC training, and WER decode all run exactly as a user would run them —
with learnability guaranteed by construction (CTC WER must approach 0 on a
separable corpus; pretrain loss must fall).

Run: python scripts/e2e_chip_run.py [workdir]
Records E2E_CHIP_r05.json at the repo root.
"""

import contextlib
import io
import json
import os
import sys
import time
import wave

import numpy as np


class _Tee(io.TextIOBase):
    """Mirror train-loop stderr JSONL both to the console and a buffer."""

    def __init__(self, mirror):
        self.mirror = mirror
        self.buf = io.StringIO()

    def write(self, s):
        self.mirror.write(s)
        self.buf.write(s)
        return len(s)

    def flush(self):
        self.mirror.flush()


def _run_train(argv):
    from unispeech_tpu.train.__main__ import main as train_main

    tee = _Tee(sys.stderr)
    with contextlib.redirect_stderr(tee):
        train_main(argv)
    recs = []
    for line in tee.buf.getvalue().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("tag") in ("train", "valid"):
                recs.append(r)
    return recs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16_000
LETTERS = "ABCDEFGHIJ"
SEED = 7


def letter_wave(idx: int, dur: float, rng) -> np.ndarray:
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = 220.0 * (2.0 ** (idx / 4.0))  # quarter-octave spacing
    sig = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
        + 0.03 * rng.standard_normal(n)
    )
    win = np.hanning(n)
    return (sig * win * 0.5).astype(np.float32)


def make_utterance(rng):
    n_words = rng.integers(2, 4)
    pieces, letters = [], []
    pieces.append(np.zeros(int(SR * 0.05), np.float32))
    for w in range(n_words):
        if w:
            letters.append("|")
            pieces.append(np.zeros(int(SR * 0.12), np.float32))
        for _ in range(rng.integers(2, 5)):
            li = int(rng.integers(0, len(LETTERS)))
            letters.append(LETTERS[li])
            pieces.append(letter_wave(li, float(rng.uniform(0.10, 0.16)), rng))
    pieces.append(np.zeros(int(SR * 0.05), np.float32))
    wav = np.concatenate(pieces)
    # transcripts in letter format: chars space-separated, | = word boundary
    return wav, " ".join(letters)


def write_wav(path, wav):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())


def build_corpus(root, n_train=96, n_eval=16):
    """Write wavs + transcripts, then index them with the PUBLIC manifest
    tool (`python -m unispeech_tpu.data manifest`) instead of inline TSV
    writing — the same entry ramp a real-corpus user takes."""
    from unispeech_tpu.data.__main__ import main as data_main

    rng = np.random.default_rng(SEED)
    rows = {"train": [], "eval": []}
    texts = {"train": [], "eval": []}
    for split, n in [("train", n_train), ("eval", n_eval)]:
        audio_dir = os.path.join(root, f"audio_{split}")
        os.makedirs(audio_dir, exist_ok=True)
        for i in range(n):
            wav, text = make_utterance(rng)
            name = f"{split}_{i}.wav"
            write_wav(os.path.join(audio_dir, name), wav)
            rows[split].append((name, len(wav)))
            texts[split].append(text)
        dest = os.path.join(root, f"man_{split}")
        data_main([
            "manifest", audio_dir, "--ext", "wav", "--dest", dest,
            "--valid-percent", "0",
        ])
        os.replace(os.path.join(dest, "train.tsv"),
                   os.path.join(root, f"{split}.tsv"))
        # transcripts: the synthetic corpus has no LibriSpeech layout, so
        # .ltr files are written directly (the libri-labels tool has its own
        # real-layout test in tests/test_dataprep_cli.py). Sort matches the
        # manifest tool's sorted walk.
        order = np.argsort([name for name, _ in rows[split]], kind="stable")
        with open(os.path.join(root, f"{split}.ltr"), "w") as f:
            f.write("\n".join(texts[split][int(i)] for i in order) + "\n")
        rows[split] = [rows[split][int(i)] for i in order]
    return rows


def make_km_labels(root, rows, n_clusters=24):
    """iteration-1 HuBERT labels via the PUBLIC k-means pipeline CLI
    (`python -m unispeech_tpu.tools`, reference simple_kmeans) with a real
    (nshard=2, rank) split, then 100 Hz -> 50 Hz decimation."""
    from unispeech_tpu.tools.__main__ import main as tools_main

    feat_dir = os.path.join(root, "feat")
    km_path = os.path.join(root, "km.npy")
    lab_dir = os.path.join(root, "lab")
    man = os.path.join(root, "train.tsv")
    for rank in range(2):
        tools_main([
            "dump-features", "--manifest", man, "--nshard", "2",
            "--rank", str(rank), "--feat-dir", feat_dir,
        ])
    tools_main([
        "learn-kmeans", "--feat-dir", feat_dir, "--nshard", "2",
        "--n-clusters", str(n_clusters), "--km-path", km_path,
        "--seed", str(SEED),
    ])
    for rank in range(2):
        tools_main([
            "dump-labels", "--manifest", man, "--nshard", "2",
            "--rank", str(rank), "--km-path", km_path, "--lab-dir", lab_dir,
        ])
    with open(os.path.join(root, "train.km"), "w") as out:
        for rank in range(2):  # concat shards (reference README) + decimate
            with open(os.path.join(lab_dir, f"train_{rank}_2.km")) as f:
                for line in f:
                    out.write(" ".join(line.split()[::2]) + "\n")
    return n_clusters


ENC_SMALL = json.dumps({
    "encoder_layers": 4,
    "encoder_embed_dim": 256,
    "encoder_ffn_embed_dim": 1024,
    "encoder_attention_heads": 4,
    "conv_pos": 64,
    "conv_pos_groups": 8,
})


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_chip"
    record = {"workdir": work, "when": time.strftime("%Y-%m-%d %H:%M:%S")}
    t_all = time.time()

    rows = build_corpus(work)
    n_classes = make_km_labels(work, rows)
    record["corpus"] = {"train": len(rows["train"]), "eval": len(rows["eval"]),
                        "kmeans_classes": n_classes}
    print("corpus + kmeans labels ready", flush=True)

    import jax  # noqa: after corpus prep

    # ---- stage 1: masked-prediction pretrain (CLI) -----------------------
    pre_dir = os.path.join(work, "ckpt_pre")
    pre_npz = os.path.join(work, "pretrained.npz")
    t0 = time.time()
    pre_log = _run_train([
        "pretrain-hubert",
        "--manifest", os.path.join(work, "train.tsv"),
        "--labels", os.path.join(work, "train.km"),
        "--num-classes", str(n_classes),
        "--label-rate", "50",
        "--arch", "base",
        "--encoder-json", ENC_SMALL,
        "--min-sample-size", "8000",
        "--num-buckets", "2",
        "--max-tokens", "400000",
        "--max-updates", "100",
        "--warmup-steps", "30",
        "--lr", "3e-4",
        "--log-interval", "10",
        "--save-interval-updates", "100",
        "--checkpoint-dir", pre_dir,
        "--export-params", pre_npz,
    ])
    record["pretrain_seconds"] = round(time.time() - t0, 1)
    pre_tr = [r for r in pre_log if r.get("tag") == "train"]
    record["pretrain_loss_first"] = pre_tr[0].get("loss_per_sample")
    record["pretrain_loss_last"] = pre_tr[-1].get("loss_per_sample")
    print("pretrain done:", record["pretrain_loss_first"], "->",
          record["pretrain_loss_last"], flush=True)

    # ---- stage 2: CTC fine-tune on the grafted backbone (CLI) ------------
    ft_dir = os.path.join(work, "ckpt_ft")
    ft_npz = os.path.join(work, "finetuned.npz")
    t0 = time.time()
    ft_log = _run_train([
        "finetune-ctc",
        "--manifest", os.path.join(work, "train.tsv"),
        "--transcripts", os.path.join(work, "train.ltr"),
        "--w2v-path", pre_npz,
        "--arch", "base",
        "--encoder-json", ENC_SMALL,
        "--min-sample-size", "8000",
        "--num-buckets", "2",
        "--max-tokens", "400000",
        "--max-updates", "3500",
        "--warmup-steps", "300",
        "--lr", "1e-3",
        "--clip-norm", "10",
        "--mask-prob", "0.1",
        "--inner-steps", "2",
        "--freeze-finetune-updates", "0",
        "--log-interval", "100",
        "--save-interval-updates", "500",
        "--validate-interval-updates", "500",
        "--valid-manifest", os.path.join(work, "eval.tsv"),
        "--valid-transcripts", os.path.join(work, "eval.ltr"),
        "--best-metric", "wer",
        "--checkpoint-dir", ft_dir,
        "--export-params", ft_npz,
    ])
    record["finetune_seconds"] = round(time.time() - t0, 1)
    tr = [r for r in ft_log if r.get("tag") == "train"]
    record["finetune_loss_first"] = tr[0].get("loss_per_sample")
    record["finetune_loss_last"] = tr[-1].get("loss_per_sample")
    valid_wers = [r.get("wer") for r in ft_log
                  if r.get("tag") == "valid" and "wer" in r]
    record["finetune_valid_wers"] = valid_wers
    from unispeech_tpu.train.checkpoint import CheckpointManager
    _m = CheckpointManager(ft_dir, best_metric="wer")
    record["finetune_best_by_wer_step"] = _m.best_step()
    _m.close()
    print("finetune done:", record["finetune_loss_first"], "->",
          record["finetune_loss_last"], flush=True)

    # ---- stage 3: offline decode + WER (CLI) -----------------------------
    from unispeech_tpu.decode.__main__ import main as decode_main

    results = os.path.join(work, "decode")
    t0 = time.time()
    decode_main([
        "--manifest", os.path.join(work, "eval.tsv"),
        "--transcripts", os.path.join(work, "eval.ltr"),
        "--checkpoint", ft_npz,
        "--arch", "base",
        "--encoder-json", ENC_SMALL,
        "--decoder", "viterbi",
        "--results-path", results,
    ])
    record["decode_seconds"] = round(time.time() - t0, 1)
    rep = json.load(open(os.path.join(results, "wer_report.json")))
    record["eval_wer"] = rep.get("wer")
    record["eval_uer"] = rep.get("uer")
    record["total_seconds"] = round(time.time() - t_all, 1)
    record["device"] = str(jax.devices()[0])

    with open(os.path.join(REPO, "E2E_CHIP_r05.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1), flush=True)


if __name__ == "__main__":
    main()
