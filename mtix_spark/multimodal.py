"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio/video libraries, so decode is implemented
from the specs where that is tractable in pure stdlib+numpy — PNG pixels
(decode_png: inflate + un-filter, all five filter types), GIF frames
(decode_gif: variable-width LZW + interlace), PCM WAV samples (decode_wav:
RIFF chunk walk), uncompressed-AVI video frames (decode_avi: RIFF chunk
walk + DIB rows), and PNG/JPEG/GIF header metadata (parse_image_dims) are
REAL decoders; extract_features(fake=False) and sample_frames(fake=False)
return real pixel/signal/frame-derived output for those payloads. What
genuinely needs PIL/torchaudio/ffmpeg (JPEG pixels, compressed audio,
compressed video codecs) stays an honest NotImplementedError behind
`fake=True`'s deterministic stand-in. Either way the Spark-side plumbing is
real and tested: schemas, Arrow-batched mapInPandas signatures,
partitioning, and batch shapes are exactly what a full decoder stack would
slot into.

Design for 100 TB of media:
- binary payloads ride in their own column; metadata-only queries never read
  them (parquet column pruning — verified by ReadSchema in .explain).
- decode runs in mapInPandas with a capped Arrow batch (maxRecordsPerBatch)
  so a batch of payloads fits executor memory.
- feature outputs are fixed-width arrays → downstream joins/ANN reuse the
  similarity module unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 32
FEATURES_SCHEMA = f"media_id long, kind string, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoder': sha-seeded feature vector. Stands in for
    a real CNN/fbank featurizer; same signature, same output shape."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _png_pixel_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray | None:
    """REAL pixel-derived features for a PNG or GIF payload (decode_png /
    decode_gif below): per-channel 8-bin intensity histogram (24) +
    per-channel mean and std (6) + aspect ratio + mean luminance (2) = 32
    = FEATURE_DIM. Returns None when the payload is not a decodable
    PNG/GIF (caller decides whether that is an error)."""
    try:
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            px = decode_gif(payload)
        else:
            px = decode_png(payload)
    except (ValueError, NotImplementedError):
        return None
    return _pixel_summary(px, dim)


def _pixel_summary(px: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """32-dim summary of one decoded (H, W, C) uint8 frame — shared by the
    PNG/GIF image path and the per-frame AVI video path."""
    h, w, c = px.shape
    if c == 1:  # greyscale → replicate; drop alpha if present
        rgb = np.repeat(px, 3, axis=2)
    elif c == 2:  # grey+alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:
        rgb = px[:, :, :3]
    flat = rgb.reshape(-1, 3).astype(np.float64)
    feats = np.empty(dim, dtype=np.float32)
    n = flat.shape[0]
    for ch in range(3):
        hist = np.bincount(rgb[:, :, ch].reshape(-1) >> 5, minlength=8)[:8]
        feats[ch * 8 : ch * 8 + 8] = hist / n
    feats[24:27] = flat.mean(axis=0) / 255.0
    feats[27:30] = flat.std(axis=0) / 255.0
    feats[30] = w / (w + h)
    # Rec.601 mean luma
    feats[31] = float(flat.mean(axis=0) @ np.array([0.299, 0.587, 0.114])) / 255.0
    return feats


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """payload -> fixed-width feature vector, Arrow-batched mapInPandas.

    fake=True: deterministic sha-seeded vectors (schema/plumbing exercise).
    fake=False: REAL decoded features via the stdlib decoders below — pixel
    histograms/stats for PNG/GIF payloads (decode_png/decode_gif), spectral
    stats for PCM WAV payloads (decode_wav), and frame-averaged pixel stats
    for uncompressed-AVI payloads (decode_avi). Other payloads under
    fake=False raise NotImplementedError: JPEG pixel decode, compressed
    audio, and compressed video genuinely need PIL/torchaudio/ffmpeg, which
    this container lacks — honest stub, same Spark plumbing either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                b = bytes(p)
                if fake:
                    feats.append(_fake_decode_features(b))
                    continue
                got = _png_pixel_features(b)
                if got is None:
                    got = _wav_audio_features(b)
                if got is None:
                    got = _avi_video_features(b)
                if got is None:
                    raise NotImplementedError(
                        "real decode implemented for PNG/GIF, PCM WAV, and "
                        "uncompressed AVI only; JPEG pixels, compressed "
                        "audio, and compressed video require "
                        "PIL/torchaudio/ffmpeg — not in this container"
                    )
                feats.append(got)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: 1→N rows per input (UDTF shape, mirrors the
    reference's subheading fan-out, /root/reference/src/mtix/predictors.py:200-203).

    fake=True emits one deterministic 16-byte 'frame' per sampled
    timestamp. fake=False REALLY decodes the payload (uncompressed AVI,
    decode_avi), picks the frame at each every_ms timestamp, and emits it
    as a standalone PNG (encode_png) — compressed containers raise
    NotImplementedError (ffmpeg-less container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if fake:
                    n = max(1, int(dur or 0) // every_ms)
                    for i in range(n):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_payload"].append(
                            hashlib.blake2b(
                                bytes(payload) + i.to_bytes(4, "little"),
                                digest_size=16,
                            ).digest()
                        )
                    continue
                frames, fps = decode_avi(bytes(payload))
                dur_ms = frames.shape[0] * 1000 // fps
                n = max(1, dur_ms // every_ms)
                for i in range(n):
                    src = min(i * every_ms * fps // 1000, frames.shape[0] - 1)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(encode_png(frames[src]))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, FRAME_SCHEMA)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder (pure stdlib: struct + zlib + crc32) for an
    (H, W, 3) uint8 array — 8-bit truecolor, no filter per scanline. Valid
    per the PNG spec; lets the sandbox exercise real image payloads without
    PIL. (Retires the image half of the round-2 decode stub.)"""
    import struct
    import zlib

    h, w = pixels.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Minimal REAL PNG decoder (pure stdlib zlib + numpy) — the exact
    inverse of encode_png, generalized to any 8-bit-depth non-interlaced
    PNG: greyscale (0), truecolor (2), grey+alpha (4), RGBA (6), with all
    five scanline filter types (None/Sub/Up/Average/Paeth) un-applied per
    the PNG spec. Chunk CRCs are verified. Returns an (H, W, C) uint8
    array. Raises ValueError on malformed bytes, NotImplementedError on
    spec-valid-but-unsupported variants (16-bit, palette, interlaced)."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        ln, tag = struct.unpack(">I4s", payload[pos : pos + 8])
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated chunk")
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"unsupported PNG variant: depth={depth} ctype={ctype} "
            f"interlace={interlace}"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        cur = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:  # None
            pass
        elif ft == 2:  # Up (uint8 addition wraps mod 256 per spec)
            cur += prev
        elif ft == 1:  # Sub — sequential along the row
            for x in range(nch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pr) & 0xFF
        else:
            raise ValueError(f"invalid filter type {ft}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, nch)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal REAL GIF87a encoder for an (H, W) uint8 index array over an
    (N, 3) uint8 palette (N a power of two, 2..256). Emits uncompressed-
    style LZW (literal codes with Clear resets before the table fills) —
    spec-valid output any GIF decoder accepts; exists so decode_gif has a
    library-free round-trip partner."""
    h, w = indices.shape
    n_pal = palette.shape[0]
    depth = max(1, (n_pal - 1).bit_length())
    if n_pal != 1 << depth:
        raise ValueError("palette size must be a power of two")
    min_code = max(2, depth)
    clear, end = 1 << min_code, (1 << min_code) + 1

    # literal-only LZW stream: emit Clear every 2^min_code-2 literals so the
    # code width never grows past min_code+1
    out_bits: list[tuple[int, int]] = [(clear, min_code + 1)]
    run = 0
    for v in indices.reshape(-1):
        out_bits.append((int(v), min_code + 1))
        run += 1
        if run >= (1 << min_code) - 2:
            out_bits.append((clear, min_code + 1))
            run = 0
    out_bits.append((end, min_code + 1))
    acc = bitpos = 0
    data = bytearray()
    for code, width in out_bits:
        acc |= code << bitpos
        bitpos += width
        while bitpos >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            bitpos -= 8
    if bitpos:
        data.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)

    head = b"GIF87a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([0x80 | (depth - 1)]) + b"\x00\x00"  # global palette flag
    pal = palette.astype(np.uint8).tobytes()
    img = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00" + bytes([min_code]) + bytes(blocks)
    )
    return head + pal + img + b"\x3b"


def decode_gif(payload: bytes) -> np.ndarray:
    """Minimal REAL GIF decoder (pure Python + numpy): logical screen
    descriptor, global/local color tables, extension-block skipping, full
    variable-width LZW decompression (Clear/EOI, code widths up to 12
    bits), and Interlace de-interlacing. Returns the FIRST frame as an
    (H, W, 3) uint8 array over its palette. Raises ValueError on
    malformed bytes."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated sub-blocks")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(payload):
                raise ValueError("truncated extension")
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        # image descriptor
        if pos + 10 > len(payload):
            raise ValueError("truncated image descriptor")
        iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        iflags = payload[pos + 9]
        pos += 10
        pal = gpal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated local palette")
            pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("no color table")
        if pos >= len(payload):
            raise ValueError("missing LZW data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(payload):
                raise ValueError("truncated image data")
            data.extend(payload[pos : pos + ln])
            pos += ln

        # LZW decode (GIF variant)
        clear, end = 1 << min_code, (1 << min_code) + 1
        base = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        table = list(base)
        width = min_code + 1
        acc = bits = di = 0
        prev: bytes | None = None
        out = bytearray()
        npix = iw * ih
        while True:
            while bits < width:
                if di >= len(data):
                    raise ValueError("LZW stream ran out before EOI")
                acc |= data[di] << bits
                bits += 8
                di += 1
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                break
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= npix:
                break
        if len(out) < npix:
            raise ValueError(f"LZW produced {len(out)} of {npix} pixels")
        idx = np.frombuffer(bytes(out[:npix]), np.uint8).reshape(ih, iw)
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError("pixel index outside color table")
        if iflags & 0x40:  # interlaced: rows in 4 passes (8/8, 8/8+4, 4/+2, 2/+1)
            de = np.empty_like(idx)
            order = np.concatenate(
                [np.arange(0, ih, 8), np.arange(4, ih, 8),
                 np.arange(2, ih, 4), np.arange(1, ih, 2)]
            )
            de[order] = idx
            idx = de
        return pal[idx]
    raise ValueError("no image block before trailer")


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal REAL WAV encoder (pure struct): 16-bit PCM RIFF/WAVE for an
    (N,) mono or (N, C) multichannel int16 array. Valid per the RIFF spec;
    lets the sandbox exercise real audio payloads without torchaudio."""
    import struct

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.astype("<i2").tobytes()
    block = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Minimal REAL WAV decoder (pure struct + numpy) — the inverse of
    encode_wav, generalized to any RIFF/WAVE with integer PCM samples
    (8-bit unsigned or 16-bit signed, any channel count, chunk walk with
    even padding per the spec). Returns ((N, C) int16 array, sample_rate).
    Raises ValueError on malformed bytes, NotImplementedError on
    spec-valid-but-unsupported encodings (float, ADPCM, 24/32-bit)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE signature")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _byterate, _block, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError("bad fmt fields")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"unsupported WAV encoding: format={audio_format} bits={bits}"
        )
    if bits == 16:
        n = len(data) // (2 * n_ch)
        s = np.frombuffer(data, "<i2", count=n * n_ch).reshape(n, n_ch)
        return s.astype(np.int16), int(rate)
    n = len(data) // n_ch
    u = np.frombuffer(data, np.uint8, count=n * n_ch).reshape(n, n_ch)
    return ((u.astype(np.int16) - 128) << 8), int(rate)


_FFT_CAP = 1 << 16  # bound the feature FFT (cost + determinism at any length)


def _wav_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray | None:
    """REAL signal-derived features for a PCM WAV payload: 24 log-energy
    bands of the power spectrum (geometrically split rFFT bins over the
    first ≤65536 mono samples) + 8 scalars (rms, zero-crossing rate,
    spectral centroid, 85% rolloff, log duration, rate/48k, channels,
    crest factor) = 32 = FEATURE_DIM. Returns None when the payload is not
    a decodable PCM WAV."""
    try:
        s, rate = decode_wav(payload)
    except (ValueError, NotImplementedError):
        return None
    if s.shape[0] == 0:
        return None
    n_ch = s.shape[1]
    mono = s.astype(np.float64).mean(axis=1) / 32768.0
    duration = s.shape[0] / rate
    clip = mono[:_FFT_CAP]
    P = np.abs(np.fft.rfft(clip)) ** 2
    if P.size > 1:
        P = P[1:]  # drop DC
    nb = 24
    # geometric band edges over the bin range
    edges = np.unique(
        np.round(np.geomspace(1, P.size, nb + 1)).astype(int)
    )
    bands = np.zeros(nb)
    for i in range(min(nb, edges.size - 1)):
        bands[i] = P[edges[i] - 1 : edges[i + 1]].sum()
    feats = np.empty(dim, dtype=np.float32)
    feats[:nb] = np.log10(bands + 1e-12)
    rms = float(np.sqrt(np.mean(clip**2)))
    zcr = float(np.mean(np.signbit(clip[1:]) != np.signbit(clip[:-1])))
    tot = P.sum()
    freqs = np.arange(1, P.size + 1) / max(P.size, 1)
    centroid = float((P * freqs).sum() / tot) if tot > 0 else 0.0
    if tot > 0:
        rolloff = float(freqs[np.searchsorted(np.cumsum(P), 0.85 * tot)])
    else:
        rolloff = 0.0
    peak = float(np.abs(clip).max())
    feats[24:] = [
        rms,
        zcr,
        centroid,
        rolloff,
        float(np.log10(duration + 1e-6)),
        rate / 48_000.0,
        float(n_ch),
        peak / rms if rms > 0 else 0.0,
    ]
    return feats


def encode_avi(frames: np.ndarray, fps: int = 4) -> bytes:
    """Minimal REAL AVI writer (pure struct + numpy): RIFF 'AVI ' container
    with one uncompressed BI_RGB 'DIB ' video stream. Takes (N, H, W, 3)
    uint8 RGB frames; stores them per spec as bottom-up BGR rows padded to
    4 bytes in '00db' movi chunks, with avih/strh/strf headers. Spec-valid
    output any AVI player accepts; lets the sandbox exercise real video
    payloads without ffmpeg."""
    import struct

    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3 or f.shape[0] < 1:
        raise ValueError("frames must be (N, H, W, 3) uint8")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    n, h, w, _ = f.shape
    row_bytes = (w * 3 + 3) & ~3
    size_image = h * row_bytes

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    buf = np.zeros((h, row_bytes), np.uint8)
    movi = bytearray(b"movi")
    for fr in f:
        buf[:, : w * 3] = fr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        movi += chunk(b"00db", buf.tobytes())

    avih = struct.pack(
        "<14I", 1_000_000 // fps, size_image * fps, 0, 0x10, n, 0, 1,
        size_image, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, size_image, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    body = b"AVI " + hdrl + chunk(b"LIST", bytes(movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Minimal REAL AVI decoder (pure struct + numpy) — the inverse of
    encode_avi, generalized to any RIFF 'AVI ' with an uncompressed BI_RGB
    24-bit video stream (bottom-up or top-down, padded rows, chunk walk
    with even padding per the RIFF spec). Returns ((N, H, W, 3) uint8 RGB
    frames, fps). Raises ValueError on malformed bytes,
    NotImplementedError on spec-valid-but-compressed streams (cinepak,
    mjpeg, h264, ... genuinely need ffmpeg)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI signature")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_end = pos + 8 + ln
            if body_end > end:
                raise ValueError("truncated chunk")
            yield tag, pos + 8, body_end
            pos = body_end + (ln & 1)

    width = height = None
    scale, rate = 1, 0
    bitcount = compression = None
    frames_raw: list[bytes] = []
    top_down = False

    def scan(pos: int, end: int) -> None:
        nonlocal width, height, scale, rate, bitcount, compression, top_down
        for tag, b0, b1 in walk(payload, pos, end):
            if tag == b"LIST":
                scan(b0 + 4, b1)
            elif tag == b"strh" and b1 - b0 >= 48:
                if payload[b0 : b0 + 4] == b"vids":
                    scale, rate = struct.unpack("<II", payload[b0 + 20 : b0 + 28])
            elif tag == b"strf" and b1 - b0 >= 40 and bitcount is None:
                _, bw, bh, _, bc, comp = struct.unpack(
                    "<IiiHHI", payload[b0 : b0 + 20]
                )
                width, height, bitcount, compression = bw, bh, bc, comp
                if height < 0:  # negative biHeight = top-down rows
                    height, top_down = -height, True
            elif tag[2:4] in (b"db", b"dc") and tag[:2].isdigit():
                frames_raw.append(payload[b0:b1])

    scan(12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0]))
    if width is None or bitcount is None:
        raise ValueError("missing strf header")
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            f"unsupported AVI stream: compression={compression} bits={bitcount}"
            " (only uncompressed BI_RGB 24-bit decodes without ffmpeg)"
        )
    if width < 1 or height < 1:
        raise ValueError("bad frame dimensions")
    if not frames_raw:
        raise ValueError("no video frames in movi list")
    row_bytes = (width * 3 + 3) & ~3
    need = height * row_bytes
    out = np.empty((len(frames_raw), height, width, 3), np.uint8)
    for i, blob in enumerate(frames_raw):
        if len(blob) < need:
            raise ValueError(f"frame {i}: {len(blob)} bytes < {need} expected")
        rows = np.frombuffer(blob, np.uint8, need).reshape(height, row_bytes)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        if not top_down:
            bgr = bgr[::-1]
        out[i] = bgr[:, :, ::-1]
    fps = max(1, round(rate / scale)) if scale and rate else 1
    return out, int(fps)


_VIDEO_FEATURE_FRAMES = 4  # frames sampled per video for the 32-dim summary


def _avi_video_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray | None:
    """REAL frame-derived features for an uncompressed AVI payload: the
    32-dim _pixel_summary averaged over ≤4 evenly spaced frames. Returns
    None when the payload is not a decodable uncompressed AVI."""
    try:
        frames, _fps = decode_avi(payload)
    except (ValueError, NotImplementedError):
        return None
    n = frames.shape[0]
    take = np.unique(
        np.linspace(0, n - 1, min(n, _VIDEO_FEATURE_FRAMES)).round().astype(int)
    )
    acc = np.zeros(dim, dtype=np.float64)
    for i in take:
        acc += _pixel_summary(frames[i], dim)
    return (acc / take.size).astype(np.float32)


def parse_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image header parsing — PNG IHDR, JPEG SOF scan, GIF logical
    screen descriptor. Pure struct reads, no decoder library; returns
    (mime, width, height) or None for unrecognized bytes."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return ("image/png", int(w), int(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            # consume 0xFF fill bytes (legal padding before any marker)
            while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(payload):  # fill bytes ran to the buffer tail
                break
            marker = payload[i + 1]
            if marker == 0x00:  # stuffed data byte, not a marker
                i += 2
                continue
            if marker == 0xD9:  # EOI — no SOF found
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # length-less markers
                continue
            if i + 4 > len(payload):
                break
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            # SOFn carry dimensions; C4/C8/CC are DHT/JPG/DAC, not frames
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(payload):
                    break
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("image/jpeg", int(w), int(h))
            i += 2 + seglen
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("image/gif", int(w), int(h))
    return None


IMAGE_DIMS_SCHEMA = "media_id long, mime string, width int, height int"


def image_dimensions(media: DataFrame) -> DataFrame:
    """payload -> (mime, width, height) via REAL header parsing in the same
    Arrow-batched mapInPandas mount the fake decoders use — no `fake` flag:
    this kernel runs for real in this container. Unparseable payloads yield
    null mime/dims (kept, not dropped — the caller decides)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, ws, hs = [], [], []
            for p in pdf["payload"]:
                got = parse_image_dims(bytes(p)) if p is not None else None
                mimes.append(got[0] if got else None)
                ws.append(got[1] if got else None)
                hs.append(got[2] if got else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, IMAGE_DIMS_SCHEMA
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read `payload` (column pruning)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic media table for tests. Image payloads are REAL PNGs
    (encode_png) whose pixel dims match the metadata columns; audio
    payloads are REAL 16-bit PCM WAVs (encode_wav — seeded sine mixtures
    whose sample count matches duration_ms); video payloads are REAL
    uncompressed AVIs (encode_avi — seeded 16x16 RGB frames, frame count
    matching duration_ms at 4 fps)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        seed = int.from_bytes(
            hashlib.blake2b(f"media:{i}".encode(), digest_size=8).digest(),
            "little",
        )
        rng = np.random.default_rng(seed)
        if kind == "image":
            w = h = 64 + i % 8
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_png(px)
        elif kind == "audio":
            w = h = None
            rate, dur_s = 8000, (1 + i % 5)
            t = np.arange(rate * dur_s) / rate
            f0 = 100.0 + float(rng.integers(50, 800))
            sig = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(
                t.size
            )
            payload = encode_wav(
                np.clip(sig * 20_000, -32_768, 32_767).astype(np.int16), rate
            )
        else:
            w = h = 16
            fps, dur_s = 4, (1 + i % 5)
            frames = rng.integers(
                0, 256, size=(fps * dur_s, h, w, 3), dtype=np.uint8
            )
            payload = encode_avi(frames, fps)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/x-msvideo"}[kind],
                w,
                h,
                (1 + i % 5) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
