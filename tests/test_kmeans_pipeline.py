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
