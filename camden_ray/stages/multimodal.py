"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool ``map_batches`` stages.

No media codecs exist in this sandbox (no PIL/ffmpeg/torchaudio), so the
DECODE KERNEL is stubbed: :class:`MediaDecoderActor` ships with a
deterministic fake decoder (``decoder="fake"``, byte-derived features) and a
clearly-marked ``NotImplementedError`` path for real codecs
(``decoder="pil"`` etc.). Everything AROUND the kernel — schema contract,
actor-pool signature, small batch sizes for wide binary payloads, output
layout — is real and tested, so swapping in a real decoder on a real cluster
is a one-method change.

Schema contract::

    input : media_id: int64|string, payload: binary,
            media_type: string ("image"|"audio"|"video")
    output: media_id, media_type, n_bytes: int64, digest: int64,
            feature: fixed-width list<float> (FEATURE_DIM),
            feature_hist: fixed-width list<int32> (the raw integer
            accumulator when the decoder provides one; zeros otherwise)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from camden_ray.functions.hashing import digest_column_u64

FEATURE_DIM = 16

#: Real decoders would be registered here; none are installable in-sandbox.
_REAL_DECODERS = ("pil", "opencv", "ffmpeg", "torchaudio")


class MediaDecoderActor:
    """Actor-pool callable: binary payload rows → feature rows.

    Usage (payloads are wide — keep batches small so batch × concurrency
    fits the worker heap, SURVEY.md 'Memory-aware')::

        ds.map_batches(MediaDecoderActor, fn_constructor_kwargs={"decoder": "fake"},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=(1, N), num_cpus=1)

    ``decoder="fake"``: deterministic byte-statistics features (histogram of
    16 byte-value buckets over the payload, L1-normalized) — stable across
    runs/processes, good enough to exercise grouping/ANN downstream.
    Any real decoder name raises ``NotImplementedError`` here; on a cluster
    with codecs installed, implement ``_decode_real`` and the rest of the
    pipeline is unchanged.
    """

    def __init__(self, decoder: str = "fake", payload_col: str = "payload") -> None:
        if decoder not in ("fake",) + _REAL_DECODERS:
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.payload_col = payload_col

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            f"decoder {self.decoder!r} needs media codecs not present in this "
            "environment; install the codec and implement _decode_real — the "
            "Ray-side plumbing (schema, batching, actor pool) is complete"
        )

    def _hist_fake(self, payload: bytes) -> np.ndarray:
        """Raw integer feature accumulator (16 byte-value buckets) — the
        pre-normalization counts, kept exact so downstream retrieval can
        run integer arithmetic (cosine is invariant to the L1 normalize)."""
        buf = np.frombuffer(payload, dtype=np.uint8)
        if len(buf) == 0:
            return np.zeros(FEATURE_DIM, dtype=np.int64)
        return np.bincount(buf >> 4, minlength=FEATURE_DIM).astype(np.int64)

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        hist = self._hist_fake(payload).astype(np.float32)
        s = hist.sum()
        return hist / s if s else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        mtypes = (
            batch.column("media_type").to_pylist()
            if "media_type" in batch.column_names
            else ["image"] * len(payloads)
        )
        feats = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
        hists = np.zeros((len(payloads), FEATURE_DIM), dtype=np.int32)
        for i, (p, mt) in enumerate(zip(payloads, mtypes)):
            p = p or b""
            if self.decoder == "fake":
                hists[i] = self._hist_fake(p)
                feats[i] = self._decode_fake(p)
            else:
                # real decoders have no integer accumulator; hist stays 0
                feats[i] = self._decode_real(p, mt)
        digests = digest_column_u64(payloads)
        # pass through every non-payload input column (metadata sidecars
        # survive the decode stage), then append the decoder outputs
        out = batch.drop_columns([self.payload_col])
        if "media_type" not in out.column_names:
            out = out.append_column("media_type", pa.array(mtypes, type=pa.string()))
        out = out.append_column(
            "n_bytes",
            pa.array([len(p) if p else 0 for p in payloads], type=pa.int64()),
        )
        out = out.append_column(
            "digest", pa.array(digests.view(np.int64), type=pa.int64())
        )
        out = out.append_column(
            "feature", pa.array(list(feats), type=pa.list_(pa.float32(), FEATURE_DIM))
        )
        return out.append_column(
            "feature_hist",
            pa.array(list(hists), type=pa.list_(pa.int32(), FEATURE_DIM)),
        )


def media_features(
    ds: "object",
    decoder: str = "fake",
    payload_col: str = "payload",
    batch_size: int = 64,
    concurrency=(1, 8),
):
    """Wire the decoder actor pool onto a Dataset of binary payload rows."""
    return ds.map_batches(
        MediaDecoderActor,
        fn_constructor_kwargs={"decoder": decoder, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
