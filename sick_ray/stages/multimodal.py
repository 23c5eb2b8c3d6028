"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

All decoders here are REAL and dependency-free: uncompressed 24-bit BMP
(numpy parser/encoder in this module — full pixel roundtrip), PCM WAV
(stdlib ``wave``), and a VIDB frame container for video (length-prefixed
BMP frame sequence). ``ImageDecoder``/``WavDecoder``/``FrameSampler``
are actual decode → feature-extract stages: pixels/samples come from the
payload BYTES, with downsampled thumbnails and signal stats. On a
cluster with codec libraries, swap the per-payload parse (decode_bmp /
decode_wav / decode_vidb) for PIL/ffmpeg — the Ray plumbing (actor
pools, small batches, per-row error isolation, wide-column drops) is
format-independent.

Batch-size guidance (SURVEY.md §4.2 / ray_guide "Memory-aware"): with
multi-MB payloads use small ``batch_size`` (e.g. 32–128) so
batch × concurrency fits worker heaps; blocks of wide binary rows should
ride a larger ``target_max_block_size`` rather than being split absurdly
small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# module-level, NOT function-local inside worker callables: sick_ray is
# pickled by value, and a function-local `from sick_ray...` re-resolves by
# name on the worker at call time (ModuleNotFoundError under a foreign-cwd
# driver — see the verify skill)
from sick_ray.shuffle import first_mask, mix64, segment_pairs, sort_index
from sick_ray.xxh import xxh64_strings

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),      # "image/png", "audio/wav", ...
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


# ------------------------------------------- VIDB video frame container
#
# Dependency-free "video": magic + frame count + nominal rate + u32le
# frame lengths + concatenated 24-bit BMP frames. A stand-in for a real
# container (MP4/MKV) with the same pipeline shape: parse the container,
# sample k frames, decode each frame, feature-extract. All integer-exact
# so the independent scalar golden (scripts/make_media_golden.py)
# reproduces every output bit-for-bit.

VIDB_MAGIC = b"VIDB"


def encode_vidb(frames: list[bytes], rate: int = 24) -> bytes:
    """BMP frame payloads → VIDB container bytes."""
    head = (VIDB_MAGIC + len(frames).to_bytes(4, "little")
            + int(rate).to_bytes(4, "little"))
    lens = b"".join(len(f).to_bytes(4, "little") for f in frames)
    return head + lens + b"".join(frames)


def decode_vidb(payload: bytes) -> tuple[int, list[bytes]]:
    """VIDB container bytes → (rate, frame payload list)."""
    if len(payload) < 12 or payload[:4] != VIDB_MAGIC:
        raise ValueError("not a VIDB payload")
    n = int.from_bytes(payload[4:8], "little")
    rate = int.from_bytes(payload[8:12], "little")
    if n <= 0 or n > 1_000_000:
        raise ValueError(f"bad frame count {n}")
    off = 12 + 4 * n
    if len(payload) < off:
        raise ValueError("truncated VIDB header")
    lens = np.frombuffer(payload, dtype="<u4", count=n, offset=12).astype(np.int64)
    ends = off + np.cumsum(lens)
    if int(ends[-1]) > len(payload):
        raise ValueError("truncated VIDB frames")
    starts = ends - lens
    return rate, [payload[int(s):int(e)] for s, e in zip(starts, ends)]


class FrameSampler:
    """Actor-pool stage: REAL video frame sampling — parse the VIDB
    container, decode ``n_frames`` evenly spaced BMP frames (index
    j·F // k, k = min(n_frames, F)), and emit one feature row per
    sampled frame (flat_map-shaped output: media_id, frame,
    total_frames, thumb_xxh, pix_mean, decode_err).

    Per-row error isolation at BOTH levels — a corrupt container yields
    one (frame = -1) error row; a corrupt individual frame yields an
    error row for that frame only, the video's other frames still
    decode. ``thumb_xxh`` is the batch-path xxh64 of the integer-exact
    8×8 thumbnail bytes, so the scalar golden reproduces it exactly."""

    THUMB = 8

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        o_id, o_fr, o_tot, o_mean, o_err = [], [], [], [], []
        thumb_bytes: list = []
        for mid, p in zip(ids, payloads):
            try:
                _rate, frames = decode_vidb(p)
            except ValueError as ex:
                o_id.append(int(mid)); o_fr.append(-1); o_tot.append(0)
                o_mean.append(None); o_err.append(str(ex))
                thumb_bytes.append(None)
                continue
            total = len(frames)
            k = min(self.n_frames, total)
            for j in range(k):
                idx = (j * total) // k
                o_id.append(int(mid)); o_fr.append(idx); o_tot.append(total)
                try:
                    th = _thumbnail(decode_bmp(frames[idx]), self.THUMB)
                    s = int(th.sum(dtype=np.int64))     # exact-int → 1 float op
                    o_mean.append(round(s / th.size, 4))
                    thumb_bytes.append(th.tobytes())
                    o_err.append(None)
                except (ValueError, IndexError) as ex:
                    o_mean.append(None); thumb_bytes.append(None)
                    o_err.append(str(ex))
            del frames                                  # wide slices dropped ASAP
        ok = np.array([t is not None for t in thumb_bytes], dtype=bool)
        xxh = np.zeros(len(thumb_bytes), dtype=np.uint64)
        if ok.any():                                    # one vectorized batch pass
            xxh[ok] = xxh64_strings(
                pa.array([t for t in thumb_bytes if t is not None],
                         type=pa.binary()))
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame": pa.array(o_fr, type=pa.int32()),
            "total_frames": pa.array(o_tot, type=pa.int32()),
            "thumb_xxh": pa.array(
                [int(np.int64(v)) if k_ else None
                 for v, k_ in zip(xxh.view(np.int64), ok)], type=pa.int64()),
            "pix_mean": pa.array(o_mean, type=pa.float64()),
            "decode_err": pa.array(o_err, type=pa.string()),
        })


def synth_media_video(n: int, seed: int = 13) -> pa.Table:
    """Deterministic VIDB fixture: gradient/block BMP frames, 3–10 frames
    per video, with ~2% corrupt containers AND ~2% videos carrying one
    corrupt frame (both error-isolation levels covered)."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        total = int(rng.integers(3, 11))
        h = int(rng.integers(8, 25))
        w = int(rng.integers(8, 25))
        frames = []
        for f in range(total):
            yy, xx = np.mgrid[0:h, 0:w]
            base = (((yy + f * 3) * 255) // max(h - 1, 1)).astype(np.int64) % 256
            px = np.stack([base, (xx * 9 + f) % 256,
                           np.full_like(base, (i * 7 + f) % 256)], axis=2)
            noise = rng.integers(0, 32, size=px.shape)
            frames.append(encode_bmp(((px + noise) % 256).astype(np.uint8)))
        if i % 53 == 5:
            frames[total // 2] = frames[total // 2][:20]   # corrupt ONE frame
        payloads.append(encode_vidb(frames, rate=24))
    for i in rng.choice(n, size=max(1, n // 50), replace=False):
        payloads[i] = payloads[i][:9]                      # corrupt container
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(["video/vidb"] * n),
    })


def sample_frames(media_ds, n_frames: int = 4, concurrency: int = 4,
                  batch_size: int = 32):
    """The canonical wiring: actor pool, small batches for wide rows."""
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_args=(n_frames,),
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


# ------------------------------------------------ perceptual-hash near-dup

def popcount64(x: np.ndarray) -> np.ndarray:
    """Constant-pass SWAR popcount over uint64 (numpy 1.26 has no
    bitwise_count; a shift-and-mask loop makes up to 64 passes)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
        np.int64)


def dhash56(thumbs: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 8×8 thumbnails → 56-bit dHash packed in int64.

    Difference hash (horizontal gradient sign, row-major bit order):
    bit (r, c) = thumb[r, c+1] > thumb[r, c]. INTEGER-EXACT end to end —
    the thumbnail is already integer-exact (_thumbnail), so any
    independent implementation reproduces the hash bit-for-bit (the
    media-golden conformance discipline)."""
    t = thumbs.reshape(-1, 8, 8)
    bits = (t[:, :, 1:] > t[:, :, :-1]).reshape(-1, 56).astype(np.uint64)
    weights = np.uint64(1) << np.arange(56, dtype=np.uint64)
    return (bits * weights).sum(axis=1).astype(np.uint64).view(np.int64)


PHASH_BANDS = 4
PHASH_BAND_BITS = 14
PHASH_HAMMING = 3


def synth_media_dups(n: int = 240, seed: int = 11) -> pa.Table:
    """Deterministic BMP fixture with PLANTED near-duplicate images:
    random block-pattern bases; every third image is a near-dup of the
    previous base (sparse pixel noise — hamming-close thumbnails), every
    eighth an exact byte dup; ~2% corrupt payloads (decode-error
    exclusion coverage)."""
    rng = np.random.default_rng(seed)
    payloads = []
    prev = None
    for i in range(n):
        if i % 8 == 7 and prev is not None:
            payloads.append(payloads[-1])          # exact dup
            continue
        if i % 3 == 2 and prev is not None:
            px = prev.copy()
            # sparse noise: flip a few random pixels slightly
            m = rng.random(px.shape[:2]) < 0.02
            px[m] = np.clip(
                px[m].astype(np.int16)
                + rng.integers(-12, 13, size=(int(m.sum()), 3)),
                0, 255,
            ).astype(np.uint8)
            payloads.append(encode_bmp(px))
            continue
        h = int(rng.integers(16, 40))
        w = int(rng.integers(16, 40))
        # blocky random pattern: dHash-stable under small noise
        blocks = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        px = np.kron(blocks, np.ones((max(h // 4, 1), max(w // 4, 1), 1),
                                     dtype=np.uint8))[:h, :w]
        if px.shape[0] < h or px.shape[1] < w:   # pad the kron remainder
            px = np.pad(px, ((0, h - px.shape[0]), (0, w - px.shape[1]),
                             (0, 0)), mode="edge")
        prev = px
        payloads.append(encode_bmp(px))
    for i in rng.choice(n, size=max(1, n // 50), replace=False):
        payloads[i] = payloads[i][:10]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/bmp"] * n),
        }
    )


def _phash_band_rows(batch: pa.Table) -> pa.Table:
    """(media_id, phash) → 4 × 14-bit band-bucket rows (bkt, media_id,
    phash). Decode failures are excluded upstream."""
    ph = batch.column("phash").to_numpy(zero_copy_only=False).view(np.uint64)
    ids = batch.column("media_id").to_numpy(zero_copy_only=False)
    n = len(ph)
    mask = np.uint64((1 << PHASH_BAND_BITS) - 1)
    out_b, out_i, out_h = [], [], []
    for band in range(PHASH_BANDS):
        val = (ph >> np.uint64(band * PHASH_BAND_BITS)) & mask
        bkt = mix64(val * np.uint64(0x9E3779B185EBCA87)
                    + np.uint64(band + 1)).view(np.int64)
        out_b.append(bkt)
        out_i.append(ids)
        out_h.append(ph.view(np.int64))
    return pa.table(
        {
            "bkt": pa.array(np.concatenate(out_b), type=pa.int64()),
            "media_id": pa.array(np.concatenate(out_i), type=pa.int64()),
            "phash": pa.array(np.concatenate(out_h), type=pa.int64()),
        }
    )


def _phash_pair_partition(part: pa.Table) -> pa.Table:
    """Per-partition: all within-bucket pairs (segment_pairs, capped +
    counted) verified INLINE by popcount(xor) ≤ PHASH_HAMMING — hashes
    ride the bucket rows, so no second lookup stage. kind 0 = verified
    edge, 2 = truncation counter row."""
    empty = pa.table(
        {
            "u": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64()),
            "dist": pa.array([], type=pa.int64()),
            "kind": pa.array([], type=pa.int8()),
        }
    )
    if part.num_rows == 0:
        return empty
    bkt = part.column("bkt").to_numpy(zero_copy_only=False)
    ids = part.column("media_id").to_numpy(zero_copy_only=False)
    ph = part.column("phash").to_numpy(zero_copy_only=False)
    order = sort_index(bkt, ids)
    bk, di, hh = bkt[order], ids[order], ph[order]
    # drop duplicate (bkt, media_id) rows (several bands of one image can
    # land in one partition only as distinct bkts, but be safe)
    keep = first_mask(bk) | (di != np.concatenate([[~di[0]], di[:-1]]))
    bk, di, hh = bk[keep], di[keep], hh[keep]
    i_idx, j_idx, tp, tb = segment_pairs(bk, cap=4096)
    u, v = di[i_idx], di[j_idx]
    x = (hh[i_idx].view(np.uint64)) ^ (hh[j_idx].view(np.uint64))
    dist = popcount64(x)
    ok = (dist <= PHASH_HAMMING) & (u != v)
    out_u = [u[ok]]
    out_v = [v[ok]]
    out_d = [dist[ok]]
    out_k = [np.zeros(int(ok.sum()), dtype=np.int8)]
    if tp or tb:
        out_u.append(np.array([tp], dtype=np.int64))
        out_v.append(np.array([tb], dtype=np.int64))
        out_d.append(np.zeros(1, dtype=np.int64))
        out_k.append(np.full(1, 2, dtype=np.int8))
    return pa.table(
        {
            "u": pa.array(np.concatenate(out_u), type=pa.int64()),
            "v": pa.array(np.concatenate(out_v), type=pa.int64()),
            "dist": pa.array(np.concatenate(out_d), type=pa.int64()),
            "kind": pa.array(np.concatenate(out_k), type=pa.int8()),
        }
    )


def _phash_distinct_pairs(part: pa.Table) -> pa.Table:
    """Distinct (u, v, dist) — an edge found via several bands collapses."""
    if part.num_rows == 0:
        return part
    u = part.column("u").to_numpy(zero_copy_only=False)
    v = part.column("v").to_numpy(zero_copy_only=False)
    d = part.column("dist").to_numpy(zero_copy_only=False)
    order = sort_index(u, v)
    us, vs, ds = u[order], v[order], d[order]
    keep = first_mask(us) | (vs != np.concatenate([[~vs[0]], vs[:-1]]))
    return pa.table(
        {
            "u": pa.array(us[keep], type=pa.int64()),
            "v": pa.array(vs[keep], type=pa.int64()),
            "dist": pa.array(ds[keep], type=pa.int64()),
        }
    )


def _add_phash(batch: pa.Table) -> pa.Table:
    """thumb fixed_size_list<uint8, 64> → phash int64; failed decodes
    dropped (their thumbnails are zero-filled and would all collide)."""
    ok = pa.compute.is_null(batch.column("decode_err"))
    b = batch.filter(ok)
    th = b.column("thumb")
    if isinstance(th, pa.ChunkedArray):
        th = th.combine_chunks()
    flat = th.flatten().to_numpy(zero_copy_only=False).reshape(-1, 64)
    return pa.table(
        {
            "media_id": b.column("media_id"),
            "phash": pa.array(dhash56(flat), type=pa.int64()),
        }
    )


def hash_near_dup_pairs(hash_ds, num_partitions: int = 16,
                        counters: dict | None = None):
    """Shared back half of every 56-bit perceptual-hash near-dup: a
    (media_id, phash) Dataset → the EXACT hamming-≤PHASH_HAMMING pair
    set via 4 × 14-bit band LSH with inline popcount verify. Lossless at
    this threshold (pigeonhole: ≤3 differing bits across 4 bands leave
    ≥1 band identical) — which is what lets each caller's DuckDB oracle
    be a full O(n²) bit_count(xor) self-join rather than recall-bounded.
    The shuffle moves 24 B/row band buckets."""
    from sick_ray.shuffle import (
        collect_counter_rows,
        grouped_apply,
        kind_filter,
    )

    bands = hash_ds.map_batches(_phash_band_rows, batch_format="pyarrow")
    raw = grouped_apply(bands, ["bkt"], _phash_pair_partition,
                        num_partitions=num_partitions)
    raw = collect_counter_rows(raw, counters, "truncated_pairs",
                               "truncated_buckets")
    pairs = raw.map_batches(kind_filter(0), batch_format="pyarrow") \
        .select_columns(["u", "v", "dist"])
    return grouped_apply(pairs, ["u", "v"], _phash_distinct_pairs,
                         num_partitions=num_partitions)


def phash_near_dup(media_ds, num_partitions: int = 16,
                   concurrency: int = 4, counters: dict | None = None):
    """Image near-dup via 56-bit dHash: decode (actor pool) → thumbnail →
    dHash → hash_near_dup_pairs. Wide payload bytes die at the decode
    stage."""
    imgs = media_ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency),
    )
    hashes = imgs.map_batches(_add_phash, batch_format="pyarrow")
    return hash_near_dup_pairs(hashes, num_partitions, counters)


# ------------------------------------------------ audio envelope hash

AHASH_WINDOWS = 57   # 56 bits: window mean energy vs global mean


def ahash56(samples: np.ndarray) -> int:
    """int16 samples → 56-bit energy-envelope hash (int), INTEGER-EXACT.

    Bit i = (mean energy of window i) > (global mean energy), compared by
    integer cross-multiplication ``E_i * n > total * L_i`` — no float
    ever, so an independent scalar implementation reproduces the hash
    bit-for-bit (the media-golden conformance discipline). Windows are
    ``(i*n)//57`` slices; the last window is the spare (56 bits used).
    Stable under small additive noise when the signal has a blocky
    amplitude envelope (energy margins dominated by level changes)."""
    n = len(samples)
    if n == 0:
        raise ValueError("empty audio")
    sq = samples.astype(np.int64) ** 2
    cs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(sq)])
    bounds = (np.arange(AHASH_WINDOWS + 1, dtype=np.int64) * n) // AHASH_WINDOWS
    e = cs[bounds[1:]] - cs[bounds[:-1]]
    ln = bounds[1:] - bounds[:-1]
    total = int(cs[-1])
    # python ints: e_i * n is exact at any magnitude (int64 would overflow
    # at ~2^63 / n for loud long clips)
    bits = [int(e[i]) * n > total * int(ln[i]) for i in range(56)]
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h


class AudioHasher:
    """Actor-pool stage: WAV payload → (media_id, phash) with per-row
    error isolation (corrupt/empty clips are dropped like failed image
    decodes — a zero hash would collide everything)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_id, out_h = [], []
        for mid, p in zip(ids, payloads):
            try:
                _rate, samples = decode_wav(p)
                out_h.append(ahash56(samples))
                out_id.append(int(mid))
            except Exception:  # wave raises bare Error/EOFError
                continue
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "phash": pa.array(np.array(out_h, dtype=np.uint64)
                                  .view(np.int64), type=pa.int64()),
            }
        )


def synth_audio_dups(n: int = 200, seed: int = 13) -> pa.Table:
    """Deterministic WAV fixture with PLANTED near-duplicate clips:
    blocky 8-segment amplitude envelopes (levels from a geometric spread,
    so window-vs-global-mean energy margins are wide) over a sine
    carrier; every third clip is a near-dup of the previous base (small
    additive noise), every eighth an exact byte dup; ~2% corrupt."""
    rng = np.random.default_rng(seed)
    levels = np.array([1000, 3000, 9000])
    payloads = []
    prev = None
    for i in range(n):
        if i % 8 == 7 and prev is not None:
            payloads.append(payloads[-1])
            continue
        if i % 3 == 2 and prev is not None:
            s = np.clip(
                prev.astype(np.int32)
                + rng.integers(-60, 61, size=len(prev)), -32768, 32767,
            ).astype(np.int16)
            payloads.append(encode_wav(s))
            continue
        n_samp = int(rng.integers(2000, 6000))
        f = float(rng.uniform(200, 1500))
        amp = levels[rng.integers(0, 3, size=8)]
        env = np.repeat(amp, -(-n_samp // 8))[:n_samp]
        t = np.arange(n_samp)
        s = (env * np.sin(2 * np.pi * f * t / 16000)).astype(np.int16)
        prev = s
        payloads.append(encode_wav(s))
    for i in rng.choice(n, size=max(1, n // 50), replace=False):
        payloads[i] = payloads[i][:10]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["audio/wav"] * n),
        }
    )


def ahash_near_dup(media_ds, num_partitions: int = 16,
                   concurrency: int = 4, counters: dict | None = None):
    """Audio near-dup via the 56-bit energy-envelope hash: decode + hash
    (actor pool) → hash_near_dup_pairs (same lossless band LSH as the
    image path)."""
    hashes = media_ds.map_batches(
        AudioHasher, batch_format="pyarrow", batch_size=64,
        concurrency=(1, concurrency),
    )
    return hash_near_dup_pairs(hashes, num_partitions, counters)
