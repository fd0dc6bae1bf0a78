"""k-means label pipeline: MFCC shapes, k-means convergence on separable
clusters, apply/write roundtrip."""

import numpy as np

from unispeech_tpu.tools.kmeans import (
    KmeansModel,
    apply_kmeans,
    dump_model_features,
    learn_kmeans,
    mfcc_39,
    write_label_file,
)


def test_mfcc_shape_and_rate():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    feats = mfcc_39(wav)
    assert feats.shape[1] == 39
    # 100 Hz frames: ~1s of audio -> ~98-100 frames
    assert 90 <= feats.shape[0] <= 101
    assert np.isfinite(feats).all()


def test_kmeans_recovers_clusters():
    rng = np.random.default_rng(0)
    true_centers = np.asarray([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    batches = []
    for _ in range(20):
        ids = rng.integers(0, 3, 256)
        batches.append(
            (true_centers[ids] + 0.1 * rng.standard_normal((256, 2))).astype(
                np.float32
            )
        )
    model = learn_kmeans(batches, n_clusters=3, seed=1, epochs=3)
    # each learned centroid is close to one true center
    d = np.linalg.norm(
        model.centroids[:, None, :] - true_centers[None, :, :], axis=-1
    )
    assert (d.min(axis=1) < 0.5).all()
    # assignment consistency
    labs = apply_kmeans(model, batches[0])
    same = apply_kmeans(model, batches[0])
    assert np.array_equal(labs, same)
    assert set(labs.tolist()) <= {0, 1, 2}


def test_dump_chunked_concat():
    def fake_model(x):  # (1, n) -> (n // 100, 4)
        n = x.shape[1] // 100
        return np.tile(np.arange(4, dtype=np.float32), (n, 1))

    wav = np.zeros(2_500, np.float32)
    feats = list(dump_model_features(fake_model, [wav], max_chunk=1000))[0]
    assert feats.shape == (25, 4)


def test_write_label_file(tmp_path):
    p = tmp_path / "train.km"
    write_label_file(str(p), [np.asarray([1, 2, 3]), np.asarray([4])])
    assert p.read_text() == "1 2 3\n4\n"


def test_tools_cli_sharded_pipeline(tmp_path):
    """python -m unispeech_tpu.tools: sharded (nshard, rank) feature dump ->
    learn-kmeans -> sharded label dump (reference simple_kmeans pipeline
    incl. the dump_hubert_feature.py:35-82 shard split)."""
    import wave

    def write_wav(path, samples, rate=16000):
        pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())

    rng = np.random.default_rng(0)
    rows = []
    for i in range(5):
        n = 4000 + 400 * i
        write_wav(tmp_path / f"u{i}.wav", rng.standard_normal(n) * 0.1)
        rows.append(f"u{i}.wav\t{n}")
    (tmp_path / "train.tsv").write_text(f"{tmp_path}\n" + "\n".join(rows) + "\n")

    from unispeech_tpu.tools.__main__ import main as tools_main

    feat_dir = tmp_path / "feat"
    for rank in range(2):
        tools_main([
            "dump-features", "--manifest", str(tmp_path / "train.tsv"),
            "--nshard", "2", "--rank", str(rank),
            "--feat-dir", str(feat_dir),
        ])
    # shard split is the reference's ceil split: 3 + 2 rows
    l0 = (feat_dir / "train_0_2.len").read_text().split()
    l1 = (feat_dir / "train_1_2.len").read_text().split()
    assert len(l0) == 3 and len(l1) == 2
    f0 = np.load(feat_dir / "train_0_2.npy")
    assert f0.shape[1] == 39 and f0.shape[0] == sum(int(v) for v in l0)

    km_path = tmp_path / "km.npy"
    tools_main([
        "learn-kmeans", "--feat-dir", str(feat_dir), "--nshard", "2",
        "--n-clusters", "8", "--km-path", str(km_path), "--epochs", "2",
    ])
    assert km_path.exists()

    lab_dir = tmp_path / "lab"
    for rank in range(2):
        tools_main([
            "dump-labels", "--manifest", str(tmp_path / "train.tsv"),
            "--nshard", "2", "--rank", str(rank),
            "--km-path", str(km_path), "--lab-dir", str(lab_dir),
        ])
    labs = []
    for rank in range(2):
        labs += (lab_dir / f"train_{rank}_2.km").read_text().splitlines()
    assert len(labs) == 5
    lens0 = [int(v) for v in l0] + [int(v) for v in l1]
    for line, L in zip(labs, lens0):
        ids = [int(v) for v in line.split()]
        assert len(ids) == L and all(0 <= v < 8 for v in ids)
