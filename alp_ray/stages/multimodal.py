"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed codecs.

Media are opaque ``binary`` columns with typed metadata columns. The
decode/resample kernels themselves are STUBS (this container ships no
image/audio libraries): ``DecodeImageStage`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder derives
pixel/sample arrays from the payload bytes — so schema handling, actor
signatures, batch sizing and output layout are real and tested, and a
deployment swaps one method body for Pillow/ffmpeg.

Scale notes baked in: these run as ACTOR pools (codec init once per
actor), small ``batch_size`` because payloads are large, and outputs are
fixed-size list columns (Arrow tensors) so downstream stays zero-copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),        # images/video
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio
        ("n_frames", pa.int32()),     # video
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic fake decode: seeded by payload digest."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=4).digest(), "little"
    )
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


class DecodeImageStage:
    """binary payload → fixed-size RGB array + mean-channel features.

    Real deployment: replace ``_decode`` with PIL.Image.open; everything
    else (actor pool, batch size, output schema) stays identical.
    """

    def __init__(self, out_h: int = 32, out_w: int = 32, fake: bool = False):
        self.out_h = out_h
        self.out_w = out_w
        self.fake = fake
        # ≙ model/codec load — once per actor, never per batch.
        self._codec_ready = True

    def _decode(self, payload: bytes, h: int, w: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "no image codec in this environment — construct with "
                "fake=True for the deterministic stub, or plug in PIL here"
            )
        return _fake_pixels(payload, self.out_h, self.out_w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        n = self.out_h * self.out_w * 3
        # One contiguous uint8 buffer for the whole batch; the Arrow
        # column is a zero-copy FixedSizeListArray view over it (no
        # per-row Python list materialization — the decode loop itself
        # is per-row because codecs are).
        pix = np.empty((len(payloads), n), np.uint8)
        means = np.empty((len(payloads), 3), np.float64)
        for i, (p, h, w) in enumerate(zip(payloads, hs, ws)):
            img = self._decode(p, h, w)
            pix[i] = img.reshape(-1)
            means[i] = img.reshape(-1, 3).mean(axis=0)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(pix.reshape(-1), pa.uint8()), n
                ),
                "channel_means": pa.FixedSizeListArray.from_arrays(
                    pa.array(means.reshape(-1), pa.float64()), 3
                ),
            }
        )


class AudioFeatureStage:
    """binary payload → frame energies (stub DSP over fake samples)."""

    def __init__(self, frame: int = 256, n_frames: int = 16,
                 fake: bool = False):
        self.frame = frame
        self.n_frames = n_frames
        self.fake = fake

    def _samples(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "no audio codec in this environment — fake=True for stub"
            )
        seed = int.from_bytes(
            hashlib.blake2b(payload, digest_size=4).digest(), "little"
        )
        rng = np.random.RandomState(seed)
        return rng.randn(self.frame * self.n_frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        # One contiguous buffer; zero-copy FixedSizeListArray view (the
        # per-row loop is the codec's, not the column builder's).
        energies = np.empty((len(payloads), self.n_frames), np.float64)
        for i, p in enumerate(payloads):
            s = self._samples(p).reshape(self.n_frames, self.frame)
            energies[i] = (s * s).mean(axis=1)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "frame_energy": pa.FixedSizeListArray.from_arrays(
                    pa.array(energies.reshape(-1), pa.float64()),
                    self.n_frames,
                ),
            }
        )


class FrameSampleStage:
    """video payload → every k-th frame as fake-decoded thumbnails."""

    def __init__(self, every_k: int = 8, thumb: int = 8, fake: bool = False):
        self.every_k = every_k
        self.thumb = thumb
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "no video codec in this environment — fake=True for stub"
            )
        ids, fidx, thumbs = [], [], []
        n = self.thumb * self.thumb * 3
        for mid, p, nf in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("n_frames").to_pylist(),
        ):
            for f in range(0, int(nf or 0), self.every_k):
                img = _fake_pixels(p + f.to_bytes(4, "little"),
                                   self.thumb, self.thumb)
                ids.append(mid)
                fidx.append(f)
                thumbs.append(img.reshape(-1))
        flat = (
            np.concatenate(thumbs)
            if thumbs else np.empty(0, np.uint8)
        )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "thumb": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.uint8()), n
                ),
            }
        )


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/bench)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[
        rng.randint(0, 3, n)
    ]
    payloads = [
        hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        * (1 + int(rng.randint(1, 8)))
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.randint(16, 512, n), pa.int32()),
            "height": pa.array(rng.randint(16, 512, n), pa.int32()),
            "sample_rate": pa.array(
                np.full(n, 16000, np.int32), pa.int32()
            ),
            "n_frames": pa.array(rng.randint(1, 64, n), pa.int32()),
        }
    )
