"""Media golden-table generator: an INDEPENDENT scalar second
implementation of the engine's real media decoders, materialized as the
parquet table the ``media_decode_real`` DuckDB oracle reads.

Same conformance discipline as make_golden.py (the reference's
cross-implementation tests, json-sick-csharp SickTests.cs:202-204): the
engine decodes BMP/WAV with vectorized numpy kernels
(sick_ray/stages/multimodal.py); this script re-decodes the SAME
deterministic payload fixture (synth_media_real(200, seed=7) — the input
generator is the shared FIXTURE, the decoders are the checked code) with
deliberately different scalar code:

- BMP: struct-unpacked header, per-row byte slices, a pure-Python
  integer block-sum thumbnail (the engine's integral image is
  integer-exact by design, so floor-divided block sums agree exactly)
- WAV: a hand-rolled RIFF chunk walk (the engine uses stdlib ``wave``),
  samples via array('h'); the fixture is mono-only by construction
- stats from exact integer sums → one float division/sqrt each, matching
  the engine's deterministic formulas bit-for-bit

Corrupt payloads must FAIL on both sides (failed=True, stat NULL); the
error message is implementation detail and not compared.

Run: python scripts/make_media_golden.py
  (rewrites tests/golden/media_golden.parquet)
"""

from __future__ import annotations

import struct
from array import array

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sick_ray.stages.multimodal import synth_media_real  # shared FIXTURE

OUT = "/root/repo/tests/golden/media_golden.parquet"
THUMB = 8


def decode_bmp_scalar(payload: bytes):
    """(h, w, pixel rows as nested python lists of (r, g, b))."""
    if len(payload) < 54 or payload[0:2] != b"BM":
        raise ValueError("bad bmp")
    off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported bmp")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < off + stride * h:
        raise ValueError("truncated bmp")
    rows = []
    for r in range(h):
        base = off + r * stride
        row = []
        for c in range(w):
            b_, g, rr = payload[base + 3 * c: base + 3 * c + 3]  # BGR
            row.append((rr, g, b_))
        rows.append(row)
    if not top_down:
        rows.reverse()
    return h, w, rows


def thumb_stats_scalar(h: int, w: int, rows) -> tuple[float, float]:
    """Pure-Python integer thumbnail → (mean, std), each one float op."""
    gray = [[299 * r + 587 * g + 114 * b for (r, g, b) in row] for row in rows]
    ys = [(i * h) // THUMB for i in range(THUMB + 1)]
    xs = [(i * w) // THUMB for i in range(THUMB + 1)]
    cells = []
    for i in range(THUMB):
        for j in range(THUMB):
            s = 0
            for y in range(ys[i], ys[i + 1]):
                for x in range(xs[j], xs[j + 1]):
                    s += gray[y][x]
            area = max((ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j]), 1)
            cells.append(s // (area * 1000))
    k = len(cells)
    tot = sum(cells)
    sq = sum(c * c for c in cells)
    mean = tot / k
    std = float(np.sqrt(sq / k - (tot / k) ** 2))
    return mean, std


def decode_wav_scalar(payload: bytes):
    """Hand-rolled RIFF walk → (rate, int16 sample list). Mono only (the
    fixture is mono by construction; the engine additionally downmixes)."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("bad riff")
    pos = 12
    rate, width, channels, data = None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            channels = struct.unpack_from("<H", body, 2)[0]
            rate = struct.unpack_from("<I", body, 4)[0]
            width = struct.unpack_from("<H", body, 14)[0] // 8
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None or width != 2 or channels != 1:
        raise ValueError("unsupported wav")
    samples = array("h")
    samples.frombytes(data[: len(data) - (len(data) % 2)])
    import sys

    if sys.byteorder == "big":  # array('h') is native-endian
        samples.byteswap()
    return rate, list(samples)


def main() -> None:
    media = synth_media_real(200, seed=7)
    ids = media.column("media_id").to_pylist()
    payloads = media.column("payload").to_pylist()
    kinds = media.column("media_type").to_pylist()
    out = {"media_id": [], "stat": [], "kind": [], "failed": []}
    n_fail = 0
    for mid, p, mt in zip(ids, payloads, kinds):
        kind = "image" if mt == "image/bmp" else "audio"
        stat, failed = None, False
        try:
            if kind == "image":
                h, w, rows = decode_bmp_scalar(p)
                mean, _std = thumb_stats_scalar(h, w, rows)
                stat = float(np.round(mean, 4))
            else:
                _rate, samples = decode_wav_scalar(p)
                if samples:
                    ss = sum(s * s for s in samples)
                    stat = float(np.round(float(np.sqrt(ss / len(samples))), 4))
        except (ValueError, struct.error):
            failed, n_fail = True, n_fail + 1
        out["media_id"].append(int(mid))
        out["stat"].append(stat)
        out["kind"].append(kind)
        out["failed"].append(failed)
    table = pa.table(
        {
            "media_id": pa.array(out["media_id"], type=pa.int64()),
            "stat": pa.array(out["stat"], type=pa.float64()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "failed": pa.array(out["failed"], type=pa.bool_()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows ({n_fail} failed) -> {OUT}")


# ---------------------------------------------------- phash golden table
#
# Second golden output: scalar dHash of the planted-dup fixture
# (synth_media_dups(240, seed=11)) -> media_phash_golden.parquet, read by
# the media_phash_near_dup oracle (an O(n^2) bit_count(xor()) self-join
# in DuckDB). Pure-Python thumbnail cells + a bit loop — deliberately
# different code from the engine's vectorized integral image + packbits.

PHASH_OUT = "/root/repo/tests/golden/media_phash_golden.parquet"


def thumb_cells_scalar(h: int, w: int, rows) -> list:
    gray = [[299 * r + 587 * g + 114 * b for (r, g, b) in row] for row in rows]
    ys = [(i * h) // THUMB for i in range(THUMB + 1)]
    xs = [(i * w) // THUMB for i in range(THUMB + 1)]
    cells = []
    for i in range(THUMB):
        for j in range(THUMB):
            s = 0
            for y in range(ys[i], ys[i + 1]):
                for x in range(xs[j], xs[j + 1]):
                    s += gray[y][x]
            area = max((ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j]), 1)
            cells.append((s // (area * 1000)) & 0xFF)
    return cells


def dhash_scalar(cells: list) -> int:
    h = 0
    bit = 0
    for r in range(THUMB):
        for c in range(THUMB - 1):
            if cells[r * THUMB + c + 1] > cells[r * THUMB + c]:
                h |= 1 << bit
            bit += 1
    return h


def main_phash() -> None:
    from sick_ray.stages.multimodal import synth_media_dups

    media = synth_media_dups(240, seed=11)
    ids = media.column("media_id").to_pylist()
    payloads = media.column("payload").to_pylist()
    out_id, out_ph = [], []
    n_fail = 0
    for mid, p in zip(ids, payloads):
        try:
            h, w, rows = decode_bmp_scalar(p)
            out_id.append(int(mid))
            out_ph.append(dhash_scalar(thumb_cells_scalar(h, w, rows)))
        except (ValueError, struct.error):
            n_fail += 1   # failed decodes are EXCLUDED (engine drops them)
    table = pa.table(
        {
            "media_id": pa.array(out_id, type=pa.int64()),
            "phash": pa.array(out_ph, type=pa.int64()),
        }
    )
    pq.write_table(table, PHASH_OUT, compression="zstd")
    print(f"wrote {table.num_rows} phash rows ({n_fail} failed) -> {PHASH_OUT}")


# ---------------------------------------------------- ahash golden table

AHASH_OUT = "/root/repo/tests/golden/media_ahash_golden.parquet"


def ahash_scalar(samples: list) -> int:
    """Pure-Python energy-envelope hash (ints only) — independent of the
    engine's cumsum/ndarray formulation."""
    n = len(samples)
    if n == 0:
        raise ValueError("empty audio")
    sq = [s * s for s in samples]
    bounds = [(i * n) // 57 for i in range(58)]
    total = sum(sq)
    h = 0
    for i in range(56):
        e = sum(sq[bounds[i]:bounds[i + 1]])
        ln = bounds[i + 1] - bounds[i]
        if e * n > total * ln:
            h |= 1 << i
    return h


def main_ahash() -> None:
    from sick_ray.stages.multimodal import synth_audio_dups

    media = synth_audio_dups(200, seed=13)
    ids = media.column("media_id").to_pylist()
    payloads = media.column("payload").to_pylist()
    out_id, out_ph = [], []
    n_fail = 0
    for mid, p in zip(ids, payloads):
        try:
            _rate, samples = decode_wav_scalar(p)
            if not samples:
                raise ValueError("empty audio")
            out_id.append(int(mid))
            out_ph.append(ahash_scalar(samples))
        except (ValueError, struct.error):
            n_fail += 1
    table = pa.table(
        {
            "media_id": pa.array(out_id, type=pa.int64()),
            "phash": pa.array(np.array(out_ph, dtype=np.uint64)
                              .view(np.int64), type=pa.int64()),
        }
    )
    pq.write_table(table, AHASH_OUT, compression="zstd")
    print(f"wrote {table.num_rows} ahash rows ({n_fail} failed) -> {AHASH_OUT}")


# ---------------------------------------------- frame-sampling golden
#
# Fourth golden output: scalar frame sampling of the VIDB video fixture
# (synth_media_video(160, seed=13)) -> media_frames_golden.parquet, read
# by the media_frames oracle. Container parsed with struct.unpack in a
# python loop, frames decoded with decode_bmp_scalar, thumbnails via
# thumb_cells_scalar, thumb_xxh via the engine's SCALAR xxh64 path (the
# stage uses the independent batch path xxh64_strings; the two are
# cross-checked against published vectors in tests/test_xxh.py).

FRAMES_OUT = "/root/repo/tests/golden/media_frames_golden.parquet"
N_SAMPLE_FRAMES = 4


def decode_vidb_scalar(payload: bytes):
    if len(payload) < 12 or payload[0:4] != b"VIDB":
        raise ValueError("bad vidb")
    n = struct.unpack_from("<I", payload, 4)[0]
    if n == 0 or n > 1_000_000:
        raise ValueError("bad frame count")
    off = 12 + 4 * n
    if len(payload) < off:
        raise ValueError("truncated header")
    frames, pos = [], off
    for i in range(n):
        ln = struct.unpack_from("<I", payload, 12 + 4 * i)[0]
        if pos + ln > len(payload):
            raise ValueError("truncated frames")
        frames.append(payload[pos:pos + ln])
        pos += ln
    return frames


def main_frames() -> None:
    from sick_ray.stages.multimodal import synth_media_video
    from sick_ray.xxh import xxh64  # scalar path; the stage runs the batch path

    media = synth_media_video(160, seed=13)
    ids = media.column("media_id").to_pylist()
    payloads = media.column("payload").to_pylist()
    out = {"media_id": [], "frame": [], "total_frames": [],
           "thumb_xxh": [], "pix_mean": [], "failed": []}

    def emit(mid, fr, tot, xxh, mean, failed):
        out["media_id"].append(mid); out["frame"].append(fr)
        out["total_frames"].append(tot); out["thumb_xxh"].append(xxh)
        out["pix_mean"].append(mean); out["failed"].append(failed)

    n_fail = 0
    for mid, p in zip(ids, payloads):
        try:
            frames = decode_vidb_scalar(p)
        except (ValueError, struct.error):
            emit(int(mid), -1, 0, None, None, True)
            n_fail += 1
            continue
        total = len(frames)
        k = min(N_SAMPLE_FRAMES, total)
        for j in range(k):
            idx = (j * total) // k
            try:
                h, w, rows = decode_bmp_scalar(frames[idx])
                cells = thumb_cells_scalar(h, w, rows)
                xxh = int(np.uint64(xxh64(bytes(cells))).astype(np.int64))
                mean = float(np.round(sum(cells) / len(cells), 4))
                emit(int(mid), idx, total, xxh, mean, False)
            except (ValueError, struct.error):
                emit(int(mid), idx, total, None, None, True)
                n_fail += 1
    table = pa.table({
        "media_id": pa.array(out["media_id"], type=pa.int64()),
        "frame": pa.array(out["frame"], type=pa.int32()),
        "total_frames": pa.array(out["total_frames"], type=pa.int32()),
        "thumb_xxh": pa.array(out["thumb_xxh"], type=pa.int64()),
        "pix_mean": pa.array(out["pix_mean"], type=pa.float64()),
        "failed": pa.array(out["failed"], type=pa.bool_()),
    })
    pq.write_table(table, FRAMES_OUT, compression="zstd")
    print(f"wrote {table.num_rows} frame rows ({n_fail} failed) -> {FRAMES_OUT}")


if __name__ == "__main__":
    main()
    main_phash()
    main_ahash()
    main_frames()
