"""Pure-Python media HEADER decoders for the multimodal codec seam.

These are real parsers for the container headers of the three formats a
metadata-only pipeline actually needs at scan time — PNG (IHDR), JPEG
(SOF frame header), WAV (RIFF fmt/data chunks) — written against the
public format specifications (PNG: RFC 2083 §4.1.1; JPEG: ITU-T T.81
§B.2.2; WAV: RIFF/WAVE as documented in the Multimedia Programming
Interface and Data Specifications 1.0). No third-party codec library is
required: header fields live in the first few hundred bytes, so decoding
metadata never touches the pixel/sample payload — exactly the property
that makes metadata extraction cheap at 100 TB (the Arrow batch carries
the payload, but the parser reads a bounded prefix of each).

They plug into :func:`dbt_ci_demo_spark.operators.multimodal.
decode_image_metadata` / ``decode_audio_metadata`` via the ``decoder=``
seam and return the same tuples as the deterministic stubs. The stubs
remain the DEFAULT (and the oracle-gate path) because driver fixtures
synthesize payloads from text, not real media; these decoders are the
production drop-in for corpora of actual files (VERDICT r04 task 3).

On malformed/unknown payloads they raise ``ValueError`` with the reason —
callers that want null-tolerant decoding wrap them (a real pipeline
routes failures to a quarantine sink rather than failing the batch).
"""

from __future__ import annotations

import struct

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (ITU-T T.81 B.2.2):
# C0-CF minus C4 (DHT), C8 (JPG extension), CC (DAC).
_JPEG_SOF_MARKERS = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
_JPEG_STANDALONE = {0xD8, 0x01} | set(range(0xD0, 0xD8))  # SOI, TEM, RSTn


def decode_png_header(payload: bytes) -> tuple[int, int, str]:
    """(width, height, 'png') from the IHDR chunk: the 8-byte signature,
    then the first chunk must be IHDR (length 13) whose first 8 data
    bytes are width/height as big-endian uint32."""
    if len(payload) < 24 or not payload.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    length, ctype = struct.unpack_from(">I4s", payload, 8)
    if ctype != b"IHDR" or length < 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    width, height = struct.unpack_from(">II", payload, 16)
    if width == 0 or height == 0:
        raise ValueError("PNG IHDR with zero dimension")
    return width, height, "png"


def decode_jpeg_header(payload: bytes) -> tuple[int, int, str]:
    """(width, height, 'jpeg') from the first SOFn marker segment. Walks
    the marker stream from SOI: each non-standalone marker is
    0xFF <id> <u16 length incl. itself>; SOFn's payload is
    precision(1) height(2) width(2) big-endian."""
    if len(payload) < 4 or payload[0] != 0xFF or payload[1] != 0xD8:
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    n = len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG marker stream desync at byte {i}")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_STANDALONE:
            i += 2
            continue
        if i + 3 >= n:
            break
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        if seglen < 2:
            raise ValueError("JPEG segment with invalid length")
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                break
            height, width = struct.unpack_from(">HH", payload, i + 5)
            if width == 0 or height == 0:
                raise ValueError("JPEG SOF with zero dimension")
            return width, height, "jpeg"
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            break
        i += 2 + seglen
    raise ValueError("JPEG: no SOF marker before SOS/EOI/end of data")


def decode_image_header(payload: bytes) -> tuple[int, int, str]:
    """Dispatch on magic bytes: PNG or JPEG → (width, height, format).
    The drop-in for multimodal.decode_image_metadata's ``decoder=``."""
    if not payload:
        raise ValueError("empty payload")
    if payload.startswith(PNG_SIGNATURE):
        return decode_png_header(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_header(payload)
    raise ValueError("unrecognized image container (not PNG/JPEG)")


def decode_wav_header(payload: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples) from a RIFF/WAVE header: walk the chunk
    list for 'fmt ' (sample_rate u32le at +4, block_align u16le at +12
    within the chunk data) and 'data' (n_samples = size / block_align).
    Chunks are word-aligned: odd sizes are padded by one byte."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    sample_rate = block_align = data_size = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (csize,) = struct.unpack_from("<I", payload, i + 4)
        body = i + 8
        if cid == b"fmt " and csize >= 16 and body + 16 <= n:
            _fmt, _ch, sample_rate, _br, block_align, _bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
        elif cid == b"data":
            data_size = csize
        i = body + csize + (csize & 1)
        if sample_rate is not None and data_size is not None:
            break
    if sample_rate is None or block_align is None:
        raise ValueError("WAV: no fmt chunk")
    if data_size is None:
        raise ValueError("WAV: no data chunk")
    if sample_rate == 0 or block_align == 0:
        raise ValueError("WAV: zero sample_rate/block_align")
    return sample_rate, data_size // block_align


def encode_png_header(width: int, height: int) -> bytes:
    """Minimal REAL PNG container prefix (signature + IHDR, 33 bytes):
    enough of the format for any header parser to read dimensions. The
    IHDR CRC is zeroed and no IDAT follows — this is a header fixture
    for decoder tests/pipelines, not a renderable image."""
    if not (0 < width <= 0xFFFFFFFF and 0 < height <= 0xFFFFFFFF):
        raise ValueError("PNG dimensions must be positive uint32")
    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    return PNG_SIGNATURE + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"


def encode_jpeg_header(width: int, height: int) -> bytes:
    """Minimal REAL JPEG marker stream (SOI + SOF0 + EOI, 17 bytes):
    a valid marker walk for any SOF-seeking header parser (1 grayscale
    component, no entropy data)."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("JPEG dimensions must be positive uint16")
    sof = (
        struct.pack(">H", 11)  # segment length: 2 + 1 + 4 + 1 + 3
        + bytes([8])  # precision
        + struct.pack(">HH", height, width)
        + bytes([1])  # component count
        + bytes([1, 0x11, 0x00])  # component: id, sampling, quant table
    )
    return b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xd9"


def encode_wav_header(
    sample_rate: int, n_samples: int, block_align: int = 2
) -> bytes:
    """Minimal REAL RIFF/WAVE header (44 bytes): fmt + data chunk headers
    declaring ``n_samples * block_align`` data bytes (none appended — a
    header fixture for parsers that read sizes, not samples)."""
    if sample_rate <= 0 or n_samples < 0 or block_align <= 0:
        raise ValueError("WAV parameters must be positive")
    data_size = n_samples * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * block_align, block_align, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
    )


def decode_audio_header(payload: bytes) -> tuple[int, int]:
    """Dispatch for multimodal.decode_audio_metadata's ``decoder=`` seam
    (WAV is the only container parsed without a codec library)."""
    if not payload:
        raise ValueError("empty payload")
    if payload[:4] == b"RIFF":
        return decode_wav_header(payload)
    raise ValueError("unrecognized audio container (not RIFF/WAV)")
