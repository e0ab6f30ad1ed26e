"""Multimodal column plumbing (SURVEY §2.4 E6).

Images / audio / video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested. Image decode is REAL for uncompressed
netpbm (pure numpy, no media libs needed) and uses PIL for compressed formats
when installed; only the no-decoder-for-format case raises
``DecodeUnavailable``. Poison blobs tag an error column instead of failing
the stage.

100 TB rule: blobs stay OUT of row storage in production — the blob column
carries an object-store path + byte-range for ``mapInPandas`` workers to
fetch lazily per batch. The fetch itself is a DEPLOYMENT STUB (no object
store exists in this container): this module implements the in-row binary
path (small assets, < ~1 MB), and a ``data is NULL`` uri-only row is tagged
``decode_error='empty payload'`` by the poison rule rather than fetched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: out-of-row pointer + optional inline bytes
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("uri", StringType(), True),  # object-store path (prod path)
        StructField("data", BinaryType(), True),  # inline bytes (small assets)
        StructField("media_type", StringType(), True),  # e.g. image/png
        StructField("meta", StructType([
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised when no decoder can handle the payload's format."""


def _make_image_decoder(exc_type: type = ValueError):
    """THE canonical image decode chain (native netpbm + PIL if installed),
    returned as a SELF-CONTAINED closure.

    Why a factory: the decode logic used to be copied into every
    ``mapInPandas`` closure (executors of an unrelated driver cannot import
    this package, so closures must not reference module-level helpers), and
    the copies drifted — different validation, different exception types.
    Calling this factory ON THE DRIVER and capturing its product keeps one
    source of truth: cloudpickle serializes the returned nested function by
    value, closure cells included.

    ``exc_type`` parameterizes the error contract: the module-level
    ``decode_image`` wraps with ``DecodeUnavailable``; executor-side
    closures keep the default ``ValueError`` because a package-defined
    exception class pickles by REFERENCE and would force the import the
    closure exists to avoid.

    Every malformed-payload path raises ``exc_type`` with a diagnostic
    message — truncated header/raster, non-numeric header tokens, bad
    maxval — never a raw numpy/int() error. maxval < 255 rasters are
    scaled to full 0-255 intensity (conformant netpbm stores 0..maxval;
    unscaled stats/re-encodes silently darken low-maxval images).
    """

    def decode(data):
        import io

        import numpy as np

        if not data:
            raise exc_type("empty payload")

        if bytes(data[:2]) in (b"P5", b"P6"):
            channels = 3 if bytes(data[:2]) == b"P6" else 1
            # header = magic, width, height, maxval as whitespace-separated
            # tokens (comment lines starting with '#' allowed between tokens)
            tokens, pos = [], 2
            while len(tokens) < 3:
                while pos < len(data) and data[pos : pos + 1].isspace():
                    pos += 1
                if pos >= len(data):
                    raise exc_type("truncated netpbm header")
                if data[pos : pos + 1] == b"#":
                    while pos < len(data) and data[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(data) and not data[pos : pos + 1].isspace():
                    pos += 1
                tok = bytes(data[start:pos])
                if not tok.isdigit():
                    raise exc_type(f"malformed netpbm header token {tok[:8]!r}")
                tokens.append(int(tok))
            pos += 1  # single whitespace after maxval, then raster
            width, height, maxval = tokens
            if maxval > 255:
                raise exc_type("16-bit netpbm not supported")
            if maxval < 1:
                raise exc_type(f"invalid netpbm maxval {maxval}")
            need = width * height * channels
            if pos + need > len(data):
                raise exc_type(
                    f"truncated netpbm raster: needs {need} bytes, "
                    f"{len(data) - pos} remain"
                )
            arr = np.frombuffer(data, np.uint8, need, pos).reshape(
                height, width, channels
            )
            if maxval != 255:
                arr = (arr.astype(np.uint16) * 255 // maxval).astype(np.uint8)
            return arr

        try:
            from PIL import Image  # type: ignore[import-not-found]
        except ImportError:
            raise exc_type(
                f"no decoder for format (magic={bytes(data[:4])!r}); "
                "PIL not installed"
            ) from None
        # PIL raises its own hierarchy (UnidentifiedImageError/OSError,
        # ValueError on broken rasters); the decode contract is that callers
        # catch ONE type, so fold every PIL failure into exc_type here.
        try:
            with Image.open(io.BytesIO(data)) as im:
                return np.asarray(im.convert("RGB"))
        except Exception as e:
            raise exc_type(f"PIL decode failed: {e}") from e

    return decode


_decode_image_canonical = _make_image_decoder(DecodeUnavailable)


def decode_image(data: bytes):
    """Decode image bytes to an (H, W, C) uint8 numpy array.

    Decode chain: native netpbm (always available — pure numpy), then PIL
    for compressed formats if installed, else ``DecodeUnavailable`` (also
    raised for malformed/truncated payloads — callers catch ONE type). The
    chain makes the operator REAL in a no-media-libs container (netpbm)
    while using the full decoder when the environment has one.
    """
    return _decode_image_canonical(data)


def decoded_image_features(assets: DataFrame) -> DataFrame:
    """REAL decoded-pixel featurization over image assets via ``mapInPandas``:
    width, height, channels, per-image pixel mean/std. Undecodable payloads
    yield NULL dims and an error tag instead of failing the batch (at 100 TB
    a poison blob must not kill the stage).

    The decoder closure is built on the DRIVER by ``_make_image_decoder``
    and captured by value — executors of an unrelated driver process cannot
    import this package (cloudpickle serializes nested functions by value),
    and the one canonical implementation cannot drift per-operator.
    """
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("pixel_mean", FloatType(), True),
            StructField("pixel_std", FloatType(), True),
            StructField("decode_error", StringType(), True),
        ]
    )
    decode = _make_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                try:
                    arr = decode(data)
                    rows.append(
                        (
                            aid,
                            int(arr.shape[1]),
                            int(arr.shape[0]),
                            int(arr.shape[2]),
                            float(arr.mean()),
                            float(arr.std()),
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((aid, None, None, None, None, None, str(e)[:80]))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "pixel_mean", "pixel_std", "decode_error",
                ],
            )

    return (
        assets.filter(F.col("modality") == "image")
        # only the id and the bytes cross the Arrow boundary — the uri /
        # media_type / meta struct would ride every batch unused otherwise
        .select("asset_id", "data")
        .mapInPandas(run, schema=out_schema)
    )


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the asset table.

    ``mapInPandas`` so each worker streams record batches — constant memory
    regardless of table size; partitioning of the input is preserved.
    """

    # self-contained closure: executors must not need this package importable
    # (cloudpickle serializes nested functions by value, module refs by name)
    def fake_feature(data, d=dim):
        if not data:
            return [0.0] * d
        acc = [0] * d
        for i, byte in enumerate(data):
            acc[i % d] += byte
        total = max(sum(acc), 1)
        return [round(a / total, 6) for a in acc]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "feature": pdf["data"].map(fake_feature),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled frame
    timestamp (decode stubbed; timestamps computed from metadata)."""
    v = assets.filter(F.col("modality") == "video")
    return v.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic in-test asset table (binary payloads derived from ids)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + (i % 5) * 16)])
        rows.append(
            (
                i,
                modality,
                f"s3://bucket/assets/{modality}/{i}",
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                (64, 48, 5000 if modality == "video" else None),
            )
        )
    # coalesce: 64 in-memory rows otherwise scatter across defaultParallelism
    # partitions, each spinning up its own Python worker in mapInPandas
    return spark.createDataFrame(rows, ASSET_SCHEMA).coalesce(4)


#: output schema for ``resize_images``
RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("data", BinaryType(), True),  # re-encoded netpbm raster
        StructField("resize_error", StringType(), True),
    ]
)


def resize_images(assets: DataFrame, out_w: int = 16, out_h: int = 12) -> DataFrame:
    """REAL image resize over the asset table via ``mapInPandas``:
    decode (netpbm native, PIL if present) -> nearest-neighbor index
    resample with numpy -> re-encode as netpbm (P5/P6) bytes.

    Nearest-neighbor is pixel-exact and dependency-free (pure index math:
    ``src = floor((dst + 0.5) * in/out)``), so the operator is REAL in a
    no-media-libs container and its output is deterministically testable
    byte-for-byte. Undecodable payloads yield NULL data and an error tag —
    a poison blob never kills the stage (same contract as
    ``decoded_image_features``).

    100 TB shape: streaming Arrow batches, constant memory per worker, no
    shuffle (partitioning preserved); blobs stay out-of-row until this map
    touches them.
    """

    decode = _make_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        def encode(arr):
            h, w, c = arr.shape
            magic = b"P6" if c == 3 else b"P5"
            return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()

        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                try:
                    arr = decode(data)
                    h, w, _c = arr.shape
                    # center-aligned nearest-neighbor source indices
                    ys = np.minimum(
                        ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1
                    )
                    xs = np.minimum(
                        ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1
                    )
                    small = arr[ys][:, xs]
                    rows.append(
                        (aid, out_w, out_h, int(small.shape[2]), encode(small), None)
                    )
                except Exception as e:
                    rows.append((aid, None, None, None, None, str(e)[:80]))
            yield _pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "channels", "data", "resize_error"],
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "data")  # narrow the Arrow transfer (see features)
        .mapInPandas(run, schema=RESIZE_SCHEMA)
    )


# --------------------------------------------------------------------------
# audio: REAL WAV/PCM16 decode (pure numpy — RIFF is uncompressed, so the
# no-media-libs container decodes it natively, same story as netpbm images)
# --------------------------------------------------------------------------
def _make_wav_decoder(exc_type: type = ValueError):
    """THE canonical RIFF/WAVE PCM16 chunk walker, returned as a
    self-contained closure (same factory rationale as
    ``_make_image_decoder`` — the executor-side copy had silently dropped
    the truncation and fmt-size guards the module-level decoder is
    test-pinned on). All malformed-payload paths raise ``exc_type`` —
    never struct.error / a raw numpy error."""

    def decode(data):
        import struct

        import numpy as np

        if not data or len(data) < 12 or bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
            raise exc_type(f"not a RIFF/WAVE payload (magic={bytes(data[:4]) if data else b''!r})")
        pos, sr, bits, fmt, n_ch = 12, None, None, None, None
        while pos + 8 <= len(data):
            cid, sz = bytes(data[pos : pos + 4]), struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if body + sz > len(data):
                raise exc_type(
                    f"truncated chunk {cid!r}: declares {sz} bytes, "
                    f"{len(data) - body} remain"
                )
            if cid == b"fmt ":
                if sz < 16:
                    raise exc_type(f"fmt chunk too short ({sz} bytes)")
                fmt, n_ch, sr = struct.unpack_from("<HHI", data, body)
                bits = struct.unpack_from("<H", data, body + 14)[0]
            elif cid == b"data":
                if fmt is None:
                    raise exc_type("data chunk before fmt chunk")
                if fmt != 1 or bits != 16:
                    raise exc_type(
                        f"only PCM16 decodable natively (fmt={fmt}, bits={bits})"
                    )
                samples = np.frombuffer(data, np.int16, sz // 2, body)
                if n_ch and n_ch > 1:  # interleaved -> mono mixdown
                    samples = (
                        samples[: sz // 2 // n_ch * n_ch]
                        .reshape(-1, n_ch)
                        .mean(axis=1)
                        .astype(np.int16)
                    )
                return sr, samples
            pos = body + sz + (sz & 1)  # RIFF chunks are 2-byte aligned
        raise exc_type("no data chunk")

    return decode


_decode_wav_canonical = _make_wav_decoder(DecodeUnavailable)


def decode_wav_pcm16(data: bytes):
    """Decode a RIFF/WAVE PCM16 payload to (sample_rate, int16 numpy array).

    Minimal chunk walker: validates RIFF/WAVE magic, reads the ``fmt ``
    chunk (must be audio_format=1 PCM, 16-bit), locates ``data``. Raises
    ``DecodeUnavailable`` for anything else — including declared chunk
    sizes that overrun the buffer (a truncated fmt/data chunk must not
    leak struct.error/ValueError past the documented contract) —
    (compressed codecs need a media lib this container does not ship —
    the plumbing around the decode is what must be real at 100 TB:
    schema, batching, poison safety)."""
    return _decode_wav_canonical(data)


def decoded_audio_features(assets: DataFrame) -> DataFrame:
    """REAL decoded-sample featurization over audio assets via
    ``mapInPandas``: sample rate, duration, RMS level, zero-crossing rate,
    peak amplitude — the standard cheap audio-quality gates (silence,
    clipping, DC junk) a multimodal curation pass runs before any model.
    Undecodable payloads yield NULL features and an error tag instead of
    failing the batch (poison-blob rule).

    The decoder closure is built on the driver by ``_make_wav_decoder``
    and captured by value — executors of an unrelated driver process
    cannot import this package, and the one canonical walker cannot drift
    per-operator. 100 TB: one narrow mapInPandas pass, Arrow-batched;
    blobs stay out-of-row in production (uri + byte-range fetch, same as
    the image path)."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("sample_rate", IntegerType(), True),
            StructField("n_samples", LongType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("rms", FloatType(), True),
            StructField("zero_crossing_rate", FloatType(), True),
            StructField("peak", FloatType(), True),
            StructField("decode_error", StringType(), True),
        ]
    )

    decode = _make_wav_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            # zip over the two needed columns — iterrows would box a pandas
            # Series per row for no benefit
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                rec = {"asset_id": aid}
                try:
                    sr, s = decode(data)
                    x = s.astype(np.float64) / 32768.0
                    rec.update(
                        sample_rate=int(sr),
                        n_samples=int(len(s)),
                        duration_ms=int(len(s) * 1000 // sr) if sr else None,
                        rms=float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        zero_crossing_rate=float(
                            np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
                        )
                        if len(x) > 1
                        else 0.0,
                        peak=float(np.max(np.abs(x))) if len(x) else 0.0,
                        decode_error=None,
                    )
                except Exception as e:  # noqa: BLE001 — poison-blob rule
                    rec.update(
                        sample_rate=None,
                        n_samples=None,
                        duration_ms=None,
                        rms=None,
                        zero_crossing_rate=None,
                        peak=None,
                        decode_error=str(e)[:120],
                    )
                rows.append(rec)
            yield _pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "data")
        .mapInPandas(run, out_schema)
    )


def make_wav_pcm16(sr: int, samples) -> bytes:
    """Encode an int16 sample array as a minimal mono RIFF/WAVE payload —
    the test-fixture/round-trip counterpart of ``decode_wav_pcm16``."""
    import struct

    import numpy as np

    body = np.asarray(samples, np.int16).tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(body))
    )
    return hdr + body
