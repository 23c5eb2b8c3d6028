"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Two decode tiers:

- **Real decoders, dependency-free formats**: uncompressed 24-bit BMP
  (numpy parser/encoder in this module — full pixel roundtrip) and PCM
  WAV (stdlib ``wave``). ``ImageDecoder``/``WavDecoder`` are actual
  decode → feature-extract stages: pixels/samples come from the payload
  BYTES, with downsampled thumbnails and signal stats.
- **Stub for compressed codecs** (JPEG/PNG/H.264 — no codec libraries in
  this container): ``FakeImageDecoder`` derives a deterministic tensor
  from the payload so the Ray plumbing for those types is still exercised;
  swap ``_decode`` for PIL/ffmpeg on a cluster that has them.

Batch-size guidance (SURVEY.md §4.2 / ray_guide "Memory-aware"): with
multi-MB payloads use small ``batch_size`` (e.g. 32–128) so
batch × concurrency fits worker heaps; blocks of wide binary rows should
ride a larger ``target_max_block_size`` rather than being split absurdly
small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sick_ray.xxh import xxh64, xxh64_strings

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
        n = batch.num_rows
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        base = xxh64_strings(batch.column("payload"))      # one batch pass
        f = np.arange(self.n_frames, dtype=np.uint64)
        fp = (base[:, None] ^ (f * np.uint64(0x9E3779B185EBCA87))[None, :]) \
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "media_id": pa.array(np.repeat(ids, self.n_frames), type=pa.int64()),
                "frame": pa.array(np.tile(f.astype(np.int32), n), type=pa.int32()),
                "frame_fp": pa.array(fp.reshape(-1).view(np.int64), type=pa.int64()),
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


# ---------------------------------------------------- real codecs (no deps)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + img_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    header[34:38] = img_size.to_bytes(4, "little")
    body = np.zeros((h, stride), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]                    # bottom-up rows, BGR
    body[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return bytes(header) + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB."""
    if len(payload) < 54 or payload[0:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """PCM WAV bytes → (rate, int16 samples ndarray)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
        width = wf.getsampwidth()
        ch = wf.getnchannels()
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    samples = np.frombuffer(raw, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return rate, samples


def _thumbnail(rgb: np.ndarray, t: int = 8) -> np.ndarray:
    """Box-downsample (h, w, 3) → (t, t) uint8 grayscale (vectorized).

    INTEGER-EXACT by design: grayscale uses milli-weights (299/587/114)
    in int64 and each cell is an integer block-sum floor-divided by
    area·1000, so any independent implementation — including the scalar
    golden-table generator (scripts/make_media_golden.py) — reproduces
    the thumbnail byte-for-byte. A float integral image would differ in
    ulps by summation order and break conformance at cast boundaries."""
    h, w, _ = rgb.shape
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b_ = rgb[..., 2].astype(np.int64)
    gray = 299 * r + 587 * g + 114 * b_
    ys = (np.arange(t + 1) * h) // t
    xs = (np.arange(t + 1) * w) // t
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=integ[1:, 1:])
    a = integ[ys[:-1][:, None], xs[:-1][None, :]]
    b = integ[ys[1:][:, None], xs[1:][None, :]]
    c = integ[ys[:-1][:, None], xs[1:][None, :]]
    d = integ[ys[1:][:, None], xs[:-1][None, :]]
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return ((a + b - c - d) // (np.maximum(area, 1) * 1000)).astype(np.uint8)


class ImageDecoder:
    """Actor-pool stage: REAL BMP decode → thumbnail + pixel stats.

    Payload bytes are parsed (decode_bmp), grayscale box-downsampled to an
    8×8 thumbnail, and summarized; decode failures land in ``decode_err``
    instead of killing the batch (per-row error isolation — the behavior a
    100 TB run needs when 0.01% of a crawl is corrupt)."""

    THUMB = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        thumbs = np.zeros((n, self.THUMB * self.THUMB), dtype=np.uint8)
        mean = np.full(n, np.nan)
        std = np.full(n, np.nan)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        errs: list = [None] * n
        for i, p in enumerate(payloads):
            try:
                rgb = decode_bmp(p)
                height[i], width[i] = rgb.shape[0], rgb.shape[1]
                th = _thumbnail(rgb, self.THUMB)
                thumbs[i] = th.reshape(-1)
                # exact-integer sums → one float op each: deterministic
                # across implementations (a float pairwise reduction is
                # summation-order-dependent), so the golden table matches
                # bit-for-bit
                s = int(th.sum(dtype=np.int64))
                sq = int((th.astype(np.int64) ** 2).sum())
                k = th.size
                mean[i] = s / k
                std[i] = float(np.sqrt(sq / k - (s / k) ** 2))
            except (ValueError, IndexError) as ex:
                errs[i] = str(ex)
        out = batch.drop_columns(["payload"])
        if "width" in out.column_names:
            out = out.drop_columns([c for c in ("width", "height") if c in out.column_names])
        out = out.append_column(
            "thumb",
            pa.FixedSizeListArray.from_arrays(
                pa.array(thumbs.reshape(-1), type=pa.uint8()),
                self.THUMB * self.THUMB,
            ),
        )
        out = out.append_column("width", pa.array(width, type=pa.int32()))
        out = out.append_column("height", pa.array(height, type=pa.int32()))
        out = out.append_column("pix_mean", pa.array(np.round(mean, 4), from_pandas=True))
        out = out.append_column("pix_std", pa.array(np.round(std, 4), from_pandas=True))
        out = out.append_column("decode_err", pa.array(errs, type=pa.string()))
        return out


class WavDecoder:
    """Actor-pool stage: REAL PCM WAV decode → duration + signal stats."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        rate = np.zeros(n, dtype=np.int32)
        nsamp = np.zeros(n, dtype=np.int64)
        rms = np.full(n, np.nan)
        errs: list = [None] * n
        for i, p in enumerate(payloads):
            try:
                r, samples = decode_wav(p)
                rate[i] = r
                nsamp[i] = len(samples)
                if len(samples):
                    # exact int64 sum-of-squares → one division + sqrt:
                    # bit-identical to the scalar golden implementation
                    ss = int((samples.astype(np.int64) ** 2).sum())
                    rms[i] = float(np.sqrt(ss / len(samples)))
            except Exception as ex:  # wave raises bare Error/EOFError
                errs[i] = str(ex) or type(ex).__name__
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(rate, type=pa.int32()))
        out = out.append_column("n_samples", pa.array(nsamp, type=pa.int64()))
        out = out.append_column(
            "duration_s",
            pa.array(np.round(np.where(rate > 0, nsamp / np.maximum(rate, 1), np.nan), 4),
                     from_pandas=True),
        )
        out = out.append_column("rms", pa.array(np.round(rms, 4), from_pandas=True))
        out = out.append_column("decode_err", pa.array(errs, type=pa.string()))
        return out


def synth_media_real(n: int, seed: int = 7) -> pa.Table:
    """Deterministic REAL media: gradient/noise BMPs + sine-mix WAVs,
    with a few corrupt payloads mixed in (error-isolation coverage)."""
    rng = np.random.default_rng(seed)
    rows_payload, rows_type = [], []
    for i in range(n):
        kind = i % 2
        if kind == 0:
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
            px = np.stack([base, base[::-1], np.full_like(base, i % 256)], axis=2)
            noise = rng.integers(0, 32, size=px.shape, dtype=np.uint8)
            rows_payload.append(encode_bmp((px // 2 + noise)))
            rows_type.append("image/bmp")
        else:
            t = np.arange(int(rng.integers(800, 4000)))
            f = float(rng.uniform(100, 2000))
            s = (6000 * np.sin(2 * np.pi * f * t / 16000)
                 + rng.normal(0, 300, len(t))).astype(np.int16)
            rows_payload.append(encode_wav(s))
            rows_type.append("audio/wav")
    # corrupt ~2%: truncate the payload
    for i in rng.choice(n, size=max(1, n // 50), replace=False):
        rows_payload[i] = rows_payload[i][: 10]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(rows_payload, type=pa.binary()),
            "media_type": pa.array(rows_type),
        }
    )


def decode_media(media_ds, concurrency: int = 4, batch_size: int = 64):
    """Route by media_type: BMPs through ImageDecoder, WAVs through
    WavDecoder (two filtered actor-pool branches over one source)."""
    imgs = media_ds.filter(expr="media_type == 'image/bmp'").map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    wavs = media_ds.filter(expr="media_type == 'audio/wav'").map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    return imgs, wavs
