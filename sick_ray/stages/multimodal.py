"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries exist
in this container): ``FakeImageDecoder`` derives a deterministic small
"pixel" tensor from the payload bytes so the Ray-side plumbing — schema,
batch sizing for wide binary rows, actor signature, output layout — is
real and tested end to end. Swap ``_decode`` for a real codec (PIL/ffmpeg)
on a cluster that has one; everything else stands.

Batch-size guidance (SURVEY.md §4.2 / ray_guide "Memory-aware"): with
multi-MB payloads use small ``batch_size`` (e.g. 32–128) so
batch × concurrency fits worker heaps; blocks of wide binary rows should
ride a larger ``target_max_block_size`` rather than being split absurdly
small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.xxh import xxh64

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),      # "image/png", "audio/wav", ...
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class FakeImageDecoder:
    """Actor-pool stage: binary payload → decoded feature row.

    Real pipelines put codec/model initialization here (once per actor).
    The stub derives an 8×8 deterministic grayscale "thumbnail" + stats
    from the payload bytes via xxh64 seeding — stable across runs/nodes.
    """

    THUMB = 8

    def __init__(self, strict: bool = False):
        # strict=True models the real-library path: refuse to fake-decode
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "environment; FakeImageDecoder(strict=False) provides the "
                "deterministic stand-in"
            )
        seed = xxh64(payload or b"")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(self.THUMB, self.THUMB), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        thumbs = np.stack([self._decode(p) for p in payloads]) if payloads else (
            np.empty((0, self.THUMB, self.THUMB), dtype=np.uint8)
        )
        flat = thumbs.reshape(len(payloads), -1)
        mean = flat.mean(axis=1) if len(payloads) else np.empty(0)
        std = flat.std(axis=1) if len(payloads) else np.empty(0)
        out = batch.drop_columns(["payload"])          # wide column dropped ASAP
        out = out.append_column(
            "thumb",
            pa.FixedSizeListArray.from_arrays(
                pa.array(flat.reshape(-1), type=pa.uint8()), self.THUMB * self.THUMB
            ),
        )
        out = out.append_column("pix_mean", pa.array(np.round(mean, 4), type=pa.float64()))
        out = out.append_column("pix_std", pa.array(np.round(std, 4), type=pa.float64()))
        return out


class FrameSampler:
    """Actor-pool stage stub for video: emits ``n_frames`` evenly spaced
    deterministic frame records per payload (flat_map-shaped output)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame, out_fp = [], [], []
        for mid, p in zip(ids, payloads):
            base = xxh64(p or b"")
            for f in range(self.n_frames):
                out_id.append(int(mid))
                out_frame.append(f)
                out_fp.append((base ^ (f * 0x9E3779B185EBCA87)) & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame": pa.array(out_frame, type=pa.int32()),
                "frame_fp": pa.array(out_fp, type=pa.int64()),
            }
        )


def synth_media(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake media table matching IMAGE_SCHEMA (tests/bench)."""
    rng = np.random.default_rng(seed)
    payloads = [
        bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8))
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/fake"] * n),
            "width": pa.array(rng.integers(100, 2000, n).astype(np.int32)),
            "height": pa.array(rng.integers(100, 2000, n).astype(np.int32)),
        }
    )


def decode_images(media_ds, concurrency: int = 4, batch_size: int = 64):
    """The canonical wiring: actor pool, small batches for wide rows."""
    return media_ds.map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
