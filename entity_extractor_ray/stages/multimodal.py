"""Multimodal column stages: opaque binary payloads + typed metadata.

The reference's heaviest per-row stages are binary decodes (PDF page render
at 200 dpi -> PNG bytes, file_analysis_service.py:566-583; DOC->PDF
subprocess conversion :309-354). A training-data pipeline generalizes this to
image/audio/video columns: `binary` payload + metadata struct, decoded and
feature-extracted by actor pools with SMALL batches (payloads are large).

The actual codecs (PIL/ffmpeg) are not in this container, so the decode
kernel is stubbed: `ImageDecodeStub` raises NotImplementedError when
`strict=True` and otherwise produces deterministic fake features derived
from the payload bytes. The Ray-side plumbing — schema, actor signature,
batch sizing, output layout — is real and tested; swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("mime", pa.string()),
        ("n_bytes", pa.int64()),
        ("sha16", pa.string()),
        ("features", pa.list_(pa.float32())),
    ]
)


def synth_media_table(n_items: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests (payload = seeded
    pseudo-random bytes; sizes vary to exercise batch-size memory limits)."""
    rng = np.random.RandomState(seed)
    ids, payloads, mimes, ws, hs = [], [], [], [], []
    for i in range(n_items):
        w = int(rng.randint(16, 256))
        h = int(rng.randint(16, 256))
        payloads.append(rng.bytes(w * h))
        ids.append(i)
        mimes.append(("image/png", "image/jpeg", "audio/wav")[i % 3])
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecodeStub:
    """Actor-pool decode/feature stage. __init__ loads the 'codec' once per
    actor; __call__ decodes a small batch. strict=True raises
    NotImplementedError exactly where a real decoder (PIL.Image.open /
    torchvision) would plug in."""

    FEATURE_DIM = 8

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # the real path, absent in this container
            import PIL.Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        if self.strict and not self.pil:
            raise NotImplementedError(
                "image decode requires PIL/ffmpeg; not available in this container"
            )
        # deterministic fake: moments of the byte distribution
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        if arr.size == 0:
            return np.zeros(self.FEATURE_DIM, dtype=np.float32)
        return np.array(
            [
                arr.mean(), arr.std(), arr.min(), arr.max(),
                np.percentile(arr, 25), np.percentile(arr, 50),
                np.percentile(arr, 75), float(arr.size),
            ],
            dtype=np.float32,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        feats, shas, sizes = [], [], []
        for payload, mime in zip(payloads, mimes):
            feats.append(self._decode(payload, mime))
            shas.append(hashlib.blake2b(payload, digest_size=8).hexdigest())
            sizes.append(len(payload))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "sha16": pa.array(shas, pa.string()),
                "features": pa.array([list(map(float, f)) for f in feats],
                                     pa.list_(pa.float32())),
            },
            schema=FEATURES_SCHEMA,
        )


def decode_media(media_ds, concurrency: int = 2, batch_size: int = 16,
                 strict: bool = False):
    """Binary payloads need SMALL batches (batch_size * payload * concurrency
    must fit worker heaps) — the knob is exposed and defaulted low."""
    return media_ds.map_batches(
        ImageDecodeStub,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(media_ds, every_n: int = 4):
    """Frame-sampling pattern for video-ish payload streams: keep every n-th
    item per mime group (a flat_map-shaped filter, vectorized)."""
    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("item_id").to_pylist())
        return batch.filter(pa.array(ids % every_n == 0))

    return media_ds.map_batches(sample, batch_format="pyarrow")
