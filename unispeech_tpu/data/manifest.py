"""TSV audio manifests + audio IO.

Manifest format matches the reference (first line = root dir, then
"relpath\tnum_samples" — /root/reference/src/fairseq/data/audio/
raw_audio_dataset.py:335-355 and examples/unispeech/unispeech_manifest.py).
Audio loading uses soundfile when available (reference dep), with a stdlib
`wave` fallback for 16-bit PCM WAV so the pipeline runs in bare containers.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class Manifest:
    root: str
    paths: List[str]
    sizes: np.ndarray  # (N,) int64 sample counts

    def __len__(self) -> int:
        return len(self.paths)

    def abspath(self, i: int) -> str:
        return os.path.join(self.root, self.paths[i])

    def chunk_ids(self) -> Optional[np.ndarray]:
        """(N,) shard index per row for zip-sharded manifests
        ("archive.zip:offset:length" rows — reference chunk_names tracking,
        utterance_mixing_dataset.py:145-155), or None when the manifest has
        no sharded rows. Consecutive rows of one archive share an id."""
        ids = np.full(len(self.paths), -1, np.int64)
        names: List[str] = []
        for i, p in enumerate(self.paths):
            f, slc = parse_path(p)
            if slc is None:
                continue
            if not names or f != names[-1]:
                names.append(f)
            ids[i] = len(names) - 1
        return ids if names else None

    @classmethod
    def load(cls, tsv_path: str) -> "Manifest":
        paths, sizes = [], []
        with open(tsv_path, "r", encoding="utf-8") as f:
            root = f.readline().strip()
            for line in f:
                line = line.strip()
                if not line:
                    continue
                items = line.split("\t")
                paths.append(items[0])
                sizes.append(int(items[1]))
        return cls(root=root, paths=paths, sizes=np.asarray(sizes, dtype=np.int64))

    def save(self, tsv_path: str) -> None:
        with open(tsv_path, "w", encoding="utf-8") as f:
            f.write(self.root + "\n")
            for p, s in zip(self.paths, self.sizes):
                f.write(f"{p}\t{int(s)}\n")


def create_manifest(
    root: str,
    ext: str = "wav",
    valid_percent: float = 0.0,
    seed: int = 42,
) -> Tuple[Manifest, Optional[Manifest]]:
    """Walk `root` for audio files (reference wav2vec_manifest.py behavior)."""
    rng = random.Random(seed)
    train_p: List[str] = []
    train_s: List[int] = []
    valid_p: List[str] = []
    valid_s: List[int] = []
    for dirpath, _, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if not fname.endswith("." + ext):
                continue
            path = os.path.join(dirpath, fname)
            n = audio_num_samples(path)
            rel = os.path.relpath(path, root)
            if rng.random() < valid_percent:
                valid_p.append(rel)
                valid_s.append(n)
            else:
                train_p.append(rel)
                train_s.append(n)
    train = Manifest(root, train_p, np.asarray(train_s, dtype=np.int64))
    valid = (
        Manifest(root, valid_p, np.asarray(valid_s, dtype=np.int64))
        if valid_p
        else None
    )
    return train, valid


def _soundfile():
    try:
        import soundfile as sf

        return sf
    except Exception:
        return None


def audio_num_samples(path: str) -> int:
    sf = _soundfile()
    if sf is not None:
        return sf.info(path).frames
    import wave

    with wave.open(path, "rb") as w:
        return w.getnframes()


AUDIO_EXTS = (".wav", ".flac", ".ogg")


def parse_path(path: str) -> Tuple[str, Optional[Tuple[int, int]]]:
    """Split a manifest path into (file, byte-slice).

    Two forms (reference audio_utils.parse_path,
    /root/reference/src/fairseq/data/audio/audio_utils.py:171-193):
      1. a plain .wav/.flac/.ogg file -> (path, None)
      2. "archive.zip:offset:length" -> (archive.zip, (offset, length)) —
         a byte slice of a STORED (uncompressed) zip member holding a
         complete audio file.
    """
    if path.endswith(AUDIO_EXTS):
        return path, None
    parts = path.split(":")
    if len(parts) == 3:
        return parts[0], (int(parts[1]), int(parts[2]))
    return path, None


def read_stored_slice(file_path: str, offset: int, length: int) -> bytes:
    """Byte slice of a stored-zip member (audio_utils.py:164-168)."""
    with open(file_path, "rb") as f:
        f.seek(offset)
        return f.read(length)


def load_audio(path: str, expected_rate: Optional[int] = 16000,
               return_rate: bool = False):
    """Load mono fp32 waveform in [-1, 1].

    Accepts plain audio paths and "zip:offset:length" stored-zip slices
    (the reference's sharded-corpus format). With return_rate=True returns
    (wav, sample_rate) and skips the expected-rate check (data-prep
    resampling path)."""
    file_path, slc = parse_path(path)
    sf = _soundfile()
    if slc is not None:
        import io

        data = read_stored_slice(file_path, *slc)
        if sf is None:
            import wave

            with wave.open(io.BytesIO(data), "rb") as w:
                assert w.getsampwidth() == 2
                sr = w.getframerate()
                raw = np.frombuffer(
                    w.readframes(w.getnframes()), dtype=np.int16
                )
                if w.getnchannels() > 1:
                    raw = raw.reshape(-1, w.getnchannels()).mean(axis=-1)
                wav = raw.astype(np.float32) / 32768.0
        else:
            wav, sr = sf.read(io.BytesIO(data), dtype="float32")
            if wav.ndim > 1:
                wav = wav.mean(axis=-1)
        wav = np.ascontiguousarray(wav, dtype=np.float32)
        if return_rate:
            return wav, sr
        if expected_rate is not None and sr != expected_rate:
            raise ValueError(f"{path}: rate {sr} != expected {expected_rate}")
        return wav
    path = file_path
    if sf is not None:
        wav, sr = sf.read(path, dtype="float32")
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
    else:
        import wave

        with wave.open(path, "rb") as w:
            assert w.getsampwidth() == 2, "wave fallback supports 16-bit PCM only"
            sr = w.getframerate()
            raw = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
            if w.getnchannels() > 1:
                raw = raw.reshape(-1, w.getnchannels()).mean(axis=-1)
            wav = raw.astype(np.float32) / 32768.0
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if return_rate:
        return wav, sr
    if expected_rate is not None and sr != expected_rate:
        raise ValueError(f"{path}: sample rate {sr} != expected {expected_rate}")
    return wav
