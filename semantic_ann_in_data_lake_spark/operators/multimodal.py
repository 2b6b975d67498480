"""Multimodal (image/audio/video) column plumbing.

Everything Spark-side is real and tested — the binary-column schema,
typed metadata, Arrow batch shapes, partition sizing, and the
``mapInPandas`` operator signatures a production decode/
feature-extract stage uses. The decode step itself is real for PPM
(netpbm P6/P3 — pure-Python :func:`decode_image`, no image library
needed; hash-gated end-to-end by `ppm_decode_stats` over the
synthesized fixture); other formats (JPEG/PNG/...) plug their decoder
into the same ``feature_fn`` / ``transform_fn`` seams.

Design for 100 TB of media:
- payloads are opaque ``BINARY`` columns with a typed ``meta`` struct
  (modality, mime, width/height/duration) so planning never touches
  bytes — predicate pushdown on metadata prunes before any decode;
- decode/feature stages are ``mapInPandas`` (Arrow batches of bytes),
  sized by ``spark.sql.files.maxPartitionBytes`` /
  ``maxRecordsPerBatch`` so a batch of payloads fits executor memory;
- features come back as fixed-dim ``ARRAY<FLOAT>`` ready for the
  kNN/dedup operators — media dedup IS embedding dedup downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: text bytes
    stand in for payloads so plumbing tests have real binary columns."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            (F.pmod(F.col("doc_id"), F.lit(1024)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("doc_id") * 7, F.lit(1024)) + 32).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def synthesize_audio_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic audio-like media table from the documents fixture:
    text bytes stand in for the waveform payload and the duration
    derives from ``n_chars`` (10 ms per character — a TTS-ish rate), so
    the segmentation math downstream is reproducible in any engine."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("audio").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def audio_window_plan(
    media: DataFrame, window_ms: int = 400, hop_ms: int = 200
) -> DataFrame:
    """Audio segmentation PLAN (the audio leg of the multimodal
    plumbing, beside image resize and video frame sampling): fixed
    ``window_ms`` windows every ``hop_ms`` over the metadata duration,
    FULL windows only — a clip shorter than one window yields no rows,
    and a tail shorter than a window is dropped, the usual STFT/ASR
    framing convention.

    Pure integer column math over the typed meta struct
    (posexplode(sequence(0, dur-window, hop))): payload bytes are never
    touched at plan time, so at 100 TB the framing decision costs a
    metadata column scan; the PCM slice stage downstream reuses the
    Arrow-batched byte-window iterator shape of :func:`sample_frames`.
    Output: (media_id, window_idx, start_ms, end_ms).
    """
    if window_ms < 1:
        raise ValueError(f"window_ms must be >= 1, got {window_ms}")
    if hop_ms < 1:
        raise ValueError(f"hop_ms must be >= 1, got {hop_ms}")
    dur = F.col("meta.duration_ms")
    return (
        media.where(dur.isNotNull() & (dur >= window_ms))
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (dur - window_ms).cast("long"),
                    F.lit(int(hop_ms)).cast("long"),
                )
            ).alias("window_idx", "start_ms"),
        )
        .select(
            "media_id",
            F.col("window_idx").cast("int").alias("window_idx"),
            F.col("start_ms").cast("long").alias("start_ms"),
            (F.col("start_ms") + window_ms).cast("long").alias("end_ms"),
        )
    )


def encode_ppm_p6(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) encoder — pure Python, no image
    library. ``pixels`` is the row-major RGB byte plane
    (3·width·height bytes)."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"pixel plane is {len(pixels)} bytes, want {3 * width * height}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_image(payload: bytes) -> dict:
    """Decode a PPM image (netpbm P6 binary / P3 ASCII — the public
    lowest-common-denominator raster format) in pure Python: no image
    library required, so the decode seam is REAL in this environment
    (rounds 1-8 stubbed this step behind an env-policy error).
    Returns ``{"width", "height", "maxval", "pixels"}`` with
    ``pixels`` the row-major RGB byte plane; raises ``ValueError`` on
    anything malformed (magic, comments, truncation, maxval > 255).
    Other formats plug into ``extract_features(feature_fn=...)`` /
    ``resize_images(transform_fn=...)`` exactly as before — the seam
    is unchanged, it just has a working default format now.
    """
    if not payload or len(payload) < 2:
        raise ValueError("not a PPM payload (too short)")
    magic = bytes(payload[:2])
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"not a PPM payload (magic {magic!r})")

    # netpbm header tokens: whitespace-separated, '#' comments run to
    # end of line; exactly one whitespace byte follows the maxval
    # token before the P6 raster
    pos = 2
    tokens: list[int] = []

    def _skip_ws(p: int) -> int:
        while p < len(payload):
            b = payload[p]
            if b == 0x23:  # '#'
                while p < len(payload) and payload[p] not in (0x0A, 0x0D):
                    p += 1
            elif b in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
                p += 1
            else:
                break
        return p

    while len(tokens) < 3:
        pos = _skip_ws(pos)
        start = pos
        while pos < len(payload) and chr(payload[pos]).isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval}")
    n = 3 * width * height
    if magic == b"P6":
        pos += 1  # the single whitespace byte after maxval
        pixels = bytes(payload[pos : pos + n])
        if len(pixels) != n:
            raise ValueError("truncated P6 raster")
    else:  # P3: ASCII sample values
        vals = []
        while len(vals) < n:
            pos = _skip_ws(pos)
            start = pos
            while pos < len(payload) and chr(payload[pos]).isdigit():
                pos += 1
            if pos == start:
                raise ValueError("truncated P3 raster")
            v = int(payload[start:pos])
            if v > maxval:
                raise ValueError(f"sample {v} exceeds maxval {maxval}")
            vals.append(v)
        pixels = bytes(vals)
    return {
        "width": width, "height": height, "maxval": maxval,
        "pixels": pixels,
    }


#: synthesized-PPM geometry/pixel rule — integer arithmetic shared by
#: the Python encoder and the DuckDB oracle (plans/q_text.py
#: ppm_decode_stats): w = id%13+4, h = (7·id)%11+4,
#: sample(c,x,y) = (id + 31y + 7x + 97c) mod 256
def _ppm_dims(media_id: int) -> tuple[int, int]:
    return media_id % 13 + 4, (media_id * 7) % 11 + 4


def _ppm_pixels(media_id: int, width: int, height: int) -> bytes:
    return bytes(
        (media_id + 31 * y + 7 * x + 97 * c) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format media fixture: one P6 PPM payload per
    document, dimensions and pixel values pure integer functions of
    ``doc_id`` (see ``_ppm_dims`` / ``_ppm_pixels``) so an oracle can
    recompute any decode-derived statistic analytically without
    parsing bytes. Built in an Arrow-batched mapInPandas — the same
    boundary a production ingest's encode stage crosses."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for mid in ids:
                w, h = _ppm_dims(int(mid))
                payloads.append(
                    encode_ppm_p6(w, h, _ppm_pixels(int(mid), w, h))
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def image_decode_stats(
    media: DataFrame, batch_size: int = 64, decode_fn=None
) -> DataFrame:
    """Decode every payload with ``decode_fn`` (default
    :func:`decode_image`, the netpbm parser; pass :func:`decode_png`
    for PNG payloads) and emit exact integer per-channel statistics —
    the hash-gateable face of the decode stage: ``(media_id, width,
    height, sum_r, sum_g, sum_b)``. Decode failures surface as errors
    (a curation pipeline quarantines them upstream via try/filter
    variants); sums are exact integers so the gate is bit-stable."""
    import pandas as pd

    decode = decode_fn or decode_image
    schema = (
        "media_id long, width int, height int,"
        " sum_r long, sum_g long, sum_b long"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                rows = []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    img = decode(payload)
                    px = img["pixels"]
                    rows.append(
                        (
                            int(mid), img["width"], img["height"],
                            sum(px[0::3]), sum(px[1::3]), sum(px[2::3]),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "width", "height",
                        "sum_r", "sum_g", "sum_b",
                    ],
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb8(width: int, height: int, pixels: bytes) -> bytes:
    """Real PNG encoder (8-bit RGB, non-interlaced) — stdlib zlib +
    struct only. Scanline filters CYCLE through all five spec types
    (None/Sub/Up/Average/Paeth, row i uses i mod 5), so any decoder of
    these payloads must implement the full filter set, not just the
    filter-0 fast path. Every chunk carries its real CRC-32."""
    import struct
    import zlib

    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != 3*{width}*{height}"
        )
    stride = 3 * width
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for x in range(stride):
            left = row[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                raw.append(row[x])
            elif ftype == 1:
                raw.append((row[x] - left) & 0xFF)
            elif ftype == 2:
                raw.append((row[x] - up) & 0xFF)
            elif ftype == 3:
                raw.append((row[x] - (left + up) // 2) & 0xFF)
            else:
                raw.append((row[x] - _paeth(left, up, ul)) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Real PNG parser (8-bit RGB, non-interlaced) — stdlib only:
    verifies the magic and every chunk's CRC-32, walks chunks, inflates
    the IDAT stream, and UNDOES all five scanline filters. Returns
    ``{"width", "height", "pixels"}`` (RGB interleaved bytes). Raises
    ``ValueError`` on anything malformed or unsupported (non-8-bit,
    non-RGB, interlaced) — the same quarantine contract as
    :func:`decode_image` / :func:`decode_audio`."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"chunk {tag!r} overruns the payload")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR, IDAT, or IEND chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"only 8-bit non-interlaced RGB supported, got depth={depth}"
            f" color={color} interlace={interlace}"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # truncated/corrupt deflate stream
        raise ValueError(f"IDAT inflate failed: {e}") from e
    stride = 3 * width
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"raster size {len(raw)} != {height}*(1+{stride})"
        )
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (1 + stride)]
        row = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        rec = bytearray()
        for x in range(stride):
            left = rec[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = (row[x] + left) & 0xFF
            elif ftype == 2:
                v = (row[x] + up) & 0xFF
            elif ftype == 3:
                v = (row[x] + (left + up) // 2) & 0xFF
            elif ftype == 4:
                v = (row[x] + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ftype} on row {y}")
            rec.append(v)
        out += rec
        prev = bytes(rec)
    return {"width": width, "height": height, "pixels": bytes(out)}


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """PNG twin of :func:`synthesize_ppm_media`: SAME deterministic
    dimension/pixel rules (``_ppm_dims`` / ``_ppm_pixels``) wrapped in
    the real PNG container — so the analytic oracle of
    `ppm_decode_stats` certifies this decode path too, while the bytes
    exercise zlib inflate, CRC verification, and all five scanline
    filters instead of a netpbm header."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            payloads = []
            for mid in ids:
                w, h = _ppm_dims(int(mid))
                payloads.append(
                    encode_png_rgb8(w, h, _ppm_pixels(int(mid), w, h))
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Canonical RIFF/WAVE encoder (PCM 16-bit mono, little-endian) —
    pure Python ``struct``, no audio library. Deliberately emits an
    odd-length LIST/INFO chunk between fmt and data so any consumer
    must implement the real chunk walk INCLUDING the even-byte pad
    rule (RIFF pads odd chunks with one byte that is NOT counted in
    the chunk size) — a fixed-offset-44 "parser" fails on these
    payloads by construction."""
    import struct

    if sample_rate < 1:
        raise ValueError(f"sample_rate must be >= 1, got {sample_rate}")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block-align, bits
    info = b"INFOengine-wav"  # 14 bytes: even LIST, exercised below
    if len(info) % 2 == 0:
        info += b"x"  # force the odd case so the pad rule is always hit
    chunks = b""
    for tag, payload in ((b"fmt ", fmt), (b"LIST", info), (b"data", data)):
        chunks += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            chunks += b"\x00"  # pad byte, excluded from the size field
    body = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> dict:
    """Real RIFF/WAVE parser (PCM 16-bit integer, any channel count):
    validates the RIFF magic and declared size, walks the chunk list
    honoring the even-byte pad rule, reads fmt, and unpacks the data
    chunk into Python ints. Returns ``{"sample_rate", "n_channels",
    "bits", "samples"}`` (samples interleaved when multi-channel).
    Raises ``ValueError`` on anything malformed — a curation pipeline
    quarantines failures upstream, same contract as
    :func:`decode_image`."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size != len(payload) - 8:
        raise ValueError(
            f"RIFF size {riff_size} != payload size {len(payload) - 8}"
        )
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        start = pos + 8
        if start + size > len(payload):
            raise ValueError(f"chunk {tag!r} overruns the payload")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
        elif tag == b"data":
            data = payload[start : start + size]
        pos = start + size + (size % 2)  # pad to even, pad not in size
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 supported, got format={audio_format} bits={bits}"
        )
    if len(data) % 2:
        raise ValueError("data chunk is not a whole number of samples")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "samples": samples,
    }


def _wav_rate(media_id: int) -> int:
    return 8000 + (media_id % 3) * 4000


def _wav_samples(media_id: int) -> list[int]:
    n = media_id % 96 + 16
    return [((media_id * 17 + 3 * i * i) % 4001) - 2000 for i in range(n)]


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format audio fixture: one PCM16 WAV payload
    per document, sample rate and waveform pure integer functions of
    ``doc_id`` (see ``_wav_rate`` / ``_wav_samples``) so an oracle can
    recompute any decode-derived statistic analytically. Same
    Arrow-batched encode boundary as :func:`synthesize_ppm_media`."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["media_id"].astype("int64")
            payloads = [
                encode_wav_pcm16(_wav_rate(int(m)), _wav_samples(int(m)))
                for m in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        run, schema="media_id long, payload binary"
    )


def native_audio_decoder():
    """Native-codec seam for the WAV path: a drop-in replacement for
    :func:`decode_audio` (same dict contract, same ValueError-on-
    malformed quarantine policy) backed by the stdlib ``wave`` module —
    an INDEPENDENT decoder implementation, so the contract test is a
    genuine cross-implementation check, and it ships in every CPython
    (unlike soundfile). Swap in a soundfile/librosa-backed callable
    with the same shape on clusters that have one; the pure-Python
    parser stays the oracle/gate default."""
    import io
    import struct
    import wave

    def decode(payload: bytes) -> dict:
        try:
            with wave.open(io.BytesIO(payload)) as w:
                if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                    raise ValueError("only PCM16 supported")
                n = w.getnframes()
                data = w.readframes(n)
                return {
                    "sample_rate": w.getframerate(),
                    "n_channels": w.getnchannels(),
                    "bits": 16,
                    "samples": list(
                        struct.unpack(f"<{len(data) // 2}h", data)
                    ),
                }
        except ValueError:
            raise
        except Exception as e:  # wave.Error, EOFError, struct.error
            raise ValueError(f"wave decode failed: {e}") from e

    return decode


def native_png_decoder():
    """Native-codec seam for the PNG path: a drop-in replacement for
    :func:`decode_png` (same ``{"width","height","pixels"}`` contract)
    backed by PIL when the environment ships it — raises ImportError
    otherwise (this container does not; the pure-Python codec remains
    the default and the gate tier, and the seam itself is exercised by
    the instrumented-injection contract test)."""
    import io

    from PIL import Image  # ImportError surfaces to the caller

    def decode(payload: bytes) -> dict:
        try:
            img = Image.open(io.BytesIO(payload))
            img.load()
        except Exception as e:
            raise ValueError(f"PIL decode failed: {e}") from e
        if img.mode != "RGB":
            raise ValueError(f"only RGB supported, got {img.mode}")
        return {
            "width": img.width,
            "height": img.height,
            "pixels": img.tobytes(),
        }

    return decode


def audio_decode_stats(
    media: DataFrame, batch_size: int = 64, decode_fn=None
) -> DataFrame:
    """Decode every payload with ``decode_fn`` (default
    :func:`decode_audio`; pass :func:`native_audio_decoder`'s callable
    for the stdlib-wave tier) and emit exact integer waveform
    statistics — the hash-gateable face of the audio decode stage:
    ``(media_id, sample_rate, n_samples, sum_samples, sum_abs, peak)``.
    All integers, so the gate is bit-stable across decoders."""
    import pandas as pd

    decode = decode_fn or decode_audio
    schema = (
        "media_id long, sample_rate int, n_samples long,"
        " sum_samples long, sum_abs long, peak long"
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                rows = []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    wav = decode(payload)
                    xs = wav["samples"]
                    rows.append(
                        (
                            int(mid), wav["sample_rate"], len(xs),
                            sum(xs), sum(abs(x) for x in xs),
                            max((abs(x) for x in xs), default=0),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "sample_rate", "n_samples",
                        "sum_samples", "sum_abs", "peak",
                    ],
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


def corrupt_every_nth(media: DataFrame, every_n: int = 7) -> DataFrame:
    """Deterministic corruption fixture: XOR one mid-payload byte on
    every row whose ``media_id % every_n == 0`` — the membership is
    pure id arithmetic, so an oracle knows exactly which rows a
    correct quarantine must reject without parsing bytes. Row-local
    Arrow-batched edit."""
    import pandas as pd

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if int(mid) % every_n == 0 and len(b) > 2:
                    k = len(b) // 2
                    b = b[:k] + bytes([b[k] ^ 0xFF]) + b[k + 1 :]
                out.append(b)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": out}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id long, payload binary"
    )


def decode_quarantine_stats(
    media: DataFrame, decode_fn=None, batch_size: int = 64
) -> DataFrame:
    """The QUARANTINE form of :func:`image_decode_stats` — the shape a
    100-TB ingest actually runs, because corrupt payloads are a
    certainty at that scale and one bad byte must not fail the job:
    every payload decodes under try, failures come back as rows with
    ``ok = false`` and the error text instead of propagating, and the
    caller filters/quarantines. ``(media_id, ok, err, width, height,
    sum_r, sum_g, sum_b)`` — stats columns NULL on failure, err NULL
    on success."""
    import pandas as pd

    decode = decode_fn or decode_image
    schema = (
        "media_id long, ok boolean, err string, width int, height int,"
        " sum_r long, sum_g long, sum_b long"
    )
    cols = [
        "media_id", "ok", "err", "width", "height",
        "sum_r", "sum_g", "sum_b",
    ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                rows = []
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    try:
                        img = decode(payload)
                        px = img["pixels"]
                        rows.append(
                            (
                                int(mid), True, None,
                                img["width"], img["height"],
                                sum(px[0::3]), sum(px[1::3]), sum(px[2::3]),
                            )
                        )
                    except ValueError as e:
                        rows.append(
                            (
                                int(mid), False,
                                str(e).splitlines()[0][:120],
                                None, None, None, None, None,
                            )
                        )
                yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=schema
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature extractor: md5-chunk projections
    of the raw bytes (same shape/contract as a real CNN embedding)."""
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{i}:".encode() + (payload or b"")).hexdigest()[:15], 16)
        out.append((h % 200001) / 100000.0 - 1.0)
    return out


def extract_features(
    media: DataFrame, dim: int = 16, feature_fn=None, batch_size: int = 64
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``feature_fn(payload: bytes) -> list[float]`` defaults to the
    deterministic fake; a real decoder drops in without touching the
    Spark side. Output: (media_id, modality, feature array<float>).
    """
    import pandas as pd

    fn = feature_fn or (lambda p: _fake_features(p, dim))
    schema = "media_id long, modality string, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "modality": [m["modality"] for m in chunk["meta"]],
                        "feature": [fn(p) for p in chunk["payload"]],
                    }
                )

    return media.select("media_id", "payload", "meta").mapInPandas(run, schema=schema)


def _resize_cols(max_side: int):
    """(new_width, new_height, resized) column expressions from the
    meta struct — aspect-preserving clamp of the longer side to
    ``max_side``, integer arithmetic end to end (``div``), so the math
    is engine-portable and oracle-gateable."""
    if max_side < 1:
        raise ValueError(f"max_side must be >= 1, got {max_side}")
    longer = F.greatest(F.col("meta.width"), F.col("meta.height"))
    needs = longer > max_side

    def scaled(side: str):
        return F.greatest(
            F.expr(
                f"(meta.{side} * {int(max_side)}L)"
                " div greatest(meta.width, meta.height)"
            ),
            F.lit(1).cast("long"),
        ).cast("int")

    new_w = F.when(needs, scaled("width")).otherwise(F.col("meta.width"))
    new_h = F.when(needs, scaled("height")).otherwise(F.col("meta.height"))
    return new_w, new_h, needs


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize PLAN: pure column math over the typed
    metadata — no payload bytes are touched at plan time (the 100-TB
    rule this module's schema exists for: decide geometry from
    metadata columns, decode each payload at most once downstream).

    Output: (media_id, width, height, new_width, new_height, resized).
    """
    new_w, new_h, needs = _resize_cols(max_side)
    return media.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        new_w.alias("new_width"),
        new_h.alias("new_height"),
        needs.alias("resized"),
    )


def resize_images(
    media: DataFrame,
    max_side: int = 256,
    transform_fn=None,
    batch_size: int = 64,
) -> DataFrame:
    """mapInPandas resize STAGE: geometry comes from :func:`resize_plan`
    (JVM columns, joined in before the Python boundary); the
    bytes→pixels→bytes resample is the stubbed step —
    ``transform_fn(payload, new_w, new_h) -> bytes`` defaults to a
    payload passthrough (no image library in this environment, same
    policy as :func:`decode_image`); a real resampler drops in without
    touching the Spark side. Output: (media_id, new_width, new_height,
    payload). The geometry columns compute INLINE in the same
    projection as the payload (one scan — a join back against
    resize_plan would scan the media twice; Catalyst has no
    cross-branch CSE).
    """
    import pandas as pd

    fn = transform_fn or (lambda p, w, h: p)
    schema = "media_id long, new_width int, new_height int, payload binary"
    new_w, new_h, _ = _resize_cols(max_side)
    src = media.select(
        "media_id",
        "payload",
        new_w.alias("new_width"),
        new_h.alias("new_height"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "new_width": chunk["new_width"],
                        "new_height": chunk["new_height"],
                        "payload": [
                            fn(p, w, h)
                            for p, w, h in zip(
                                chunk["payload"],
                                chunk["new_width"],
                                chunk["new_height"],
                            )
                        ],
                    }
                )

    return src.mapInPandas(run, schema=schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling PLAN: explode timestamps from metadata
    duration — the real decode of each frame is the stubbed step; the
    partitioning/explode shape is the production one."""
    return (
        media.where(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def sample_frames(media: DataFrame, k: int = 4, frame_len: int = 32) -> DataFrame:
    """Uniform frame sampling from video-like binary payloads: ``k``
    windows of ``frame_len`` bytes at evenly spaced offsets, per media
    row — the Spark shape of a video frame-sampler (decode stubbed by
    policy: the 'frame' is the raw byte window and its digest; a real
    decoder replaces ONLY the bytes→pixels step inside the same
    Arrow-batched iterator, schema and partitioning unchanged).

    Payloads shorter than one frame are skipped (no partial frames).
    Output: (media_id, frame_idx, frame_off, frame_md5).
    """
    schema = "media_id long, frame_idx int, frame_off long, frame_md5 string"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_off": [], "frame_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) < frame_len:
                    continue
                L = len(payload)
                for j in range(k):
                    off = (j * (L - frame_len)) // (k - 1) if k > 1 else 0
                    chunk = bytes(payload[off : off + frame_len])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(j)
                    out["frame_off"].append(off)
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=schema)
