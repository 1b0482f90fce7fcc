"""Multimodal columns: binary payloads + typed metadata (charter item).

Images/audio/video ride through the engine as opaque ``BINARY`` columns
with a typed metadata struct — the Spark-side contract (schema,
partition sizing, Arrow batch shape, UDF signatures) is real and
tested.

Decode dispatch:
- ``fake=True`` (default): a **deterministic fake decoder** derives
  plausible metadata (dims/duration/sample-rate) from the payload bytes
  — fully testable, stable across runs, used by the test suite.
- ``fake=False``: PNG images decode/resize for real via the stdlib
  codec (``rehiver_spark.functions.png``: zlib inflate, filter
  reconstruction, nearest-neighbor resample, deterministic re-encode),
  JPEG metadata (width/height) parses lib-free from the SOF frame
  header (``rehiver_spark.functions.jpeg``, baseline + progressive)
  and baseline JPEG PIXELS decode/resize/re-encode lib-free too
  (r11: ``jpeg.decode_baseline``/``encode_baseline`` — per-file
  Huffman/quant tables, numpy IDCT, Pillow-cross-validated), and WAV
  audio decodes via the stdlib ``wave`` module — no media library
  needed for any of those; progressive-JPEG pixels and other image
  formats go through Pillow when present; compressed audio and video
  raise ``NotImplementedError`` (no codec library exists in this
  container — documented stub).

Scale notes: payloads never pass through Python row-at-a-time — all
UDFs are ``mapInPandas`` (Arrow batches). For 100 TB media lakes keep
payloads in their own parquet column chunk (they are, by schema order),
size ``spark.sql.files.maxPartitionBytes`` to the payload row size, and
push metadata-only queries to a payload-free projection (column pruning
keeps the binary chunk unread — verified in tests by ReadSchema).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

DECODED_SCHEMA = (
    "media_id bigint, kind string, byte_len bigint, sha16 string, "
    "width int, height int, duration_ms bigint, sample_rate int, error string"
)

FEATURE_DIM = 64


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: synthesize a media table from any text table (payload =
    utf-8 bytes). Lets every multimodal path run on the driver testdata
    without binary fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


def _fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic fake codec: metadata derived from payload digest.
    Stable stand-in for PIL/ffmpeg in a lib-free container."""
    h = hashlib.sha256(payload).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] * 8,
            "height": 64 + h[1] * 8,
            "duration_ms": None,
            "sample_rate": None,
        }
    if kind == "audio":
        return {
            "width": None,
            "height": None,
            "duration_ms": 1000 + int.from_bytes(h[2:4], "big"),
            "sample_rate": 16000,
        }
    return {  # video
        "width": 320 + h[0] * 4,
        "height": 240 + h[1] * 4,
        "duration_ms": 5000 + int.from_bytes(h[2:4], "big"),
        "sample_rate": None,
    }


def _real_decode(kind: str, payload: bytes) -> dict:
    """Real codec: PNG via the stdlib codec, JPEG metadata via the
    lib-free SOF parser (functions/jpeg.py — baseline AND progressive
    frame headers), WAV via the stdlib ``wave`` module (all always
    available); other image formats via Pillow when present;
    compressed audio / video unsupported (no codec library exists in
    this container)."""
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate()
            if rate <= 0:
                raise ValueError("WAV header declares zero frame rate")
            return {
                "width": None,
                "height": None,
                "duration_ms": w.getnframes() * 1000 // rate,
                "sample_rate": rate,
            }
    if kind == "image":
        from rehiver_spark.functions import jpeg as _jpeg
        from rehiver_spark.functions import png as _png

        if _png.is_png(payload):
            w, h, _depth, _ctype = _png.png_info(payload)
            return {"width": w, "height": h, "duration_ms": None, "sample_rate": None}
        if _jpeg.is_jpeg(payload):
            w, h, _prec, _ncomp = _jpeg.jpeg_info(payload)
            return {"width": w, "height": h, "duration_ms": None, "sample_rate": None}
        try:  # pragma: no cover - needs Pillow
            import io

            from PIL import Image  # noqa: PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "real decode for non-PNG/JPEG images requires Pillow (not "
                "in this container); PNG decodes and JPEG metadata are "
                "stdlib-only"
            ) from e
        im = Image.open(io.BytesIO(payload))  # pragma: no cover - needs Pillow
        return {"width": im.width, "height": im.height, "duration_ms": None, "sample_rate": None}
    raise NotImplementedError(f"real decode for kind={kind!r} not available in this container")


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads → typed metadata via mapInPandas (Arrow batches).
    Per-row errors land in ``error`` — a corrupt object never fails the
    scan (same tolerance contract as the pipeline runner)."""
    from rehiver_spark.session import ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        decoder = _fake_decode if fake else _real_decode
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    b = bytes(payload) if payload is not None else b""
                    d = decoder(kind, b)
                    rows.append(
                        (
                            mid,
                            kind,
                            len(b),
                            hashlib.sha256(b).hexdigest()[:16],
                            d["width"],
                            d["height"],
                            d["duration_ms"],
                            d["sample_rate"],
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((mid, kind, None, None, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "byte_len",
                    "sha16",
                    "width",
                    "height",
                    "duration_ms",
                    "sample_rate",
                    "error",
                ],
            )

    from rehiver_spark.session import ensure_parallelism

    return ensure_parallelism(df.select("media_id", "kind", "payload")).mapInPandas(
        run, DECODED_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id bigint, kind string, src_width int, src_height int, "
    "width int, height int, payload binary, sha16 string, error string"
)


def resize_media(df: DataFrame, max_side: int = 256, fake: bool = True) -> DataFrame:
    """Resize images to fit ``max_side`` (aspect-preserving, never
    upscales) via mapInPandas — the standard pre-embedding image
    shaping step.

    Target dims use pure integer math (``max(1, side·max_side //
    longest)``, shared ``png.fit_dims``) so the plan is bit-reproducible
    in any engine — the fake path derives source dims from the payload
    digest (same fake codec as :func:`decode_media`) and emits a
    deterministic content-addressed stub payload (the digest of
    payload+dims); ``fake=False`` resizes PNGs for real via the stdlib
    codec (decode → nearest-neighbor → deterministic re-encode) and
    goes through Pillow for other formats when present. Non-image rows
    pass through with NULL dims. Per-row errors land in ``error``,
    never failing the scan.
    """
    from rehiver_spark.session import ensure_parallelism, ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from rehiver_spark.functions import jpeg as _jpeg
        from rehiver_spark.functions import png as _png

        def pillow_resize(b: bytes):  # pragma: no cover - needs Pillow
            import io

            from PIL import Image  # noqa: PLC0415

            im = Image.open(io.BytesIO(b))
            w, h = im.width, im.height
            tw, th = _png.fit_dims(w, h, max_side)
            buf = io.BytesIO()
            im.resize((tw, th)).save(buf, format=im.format or "PNG")
            return w, h, tw, th, buf.getvalue()

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    b = bytes(payload) if payload is not None else b""
                    if kind != "image":
                        rows.append((mid, kind, None, None, None, None, b, None, None))
                        continue
                    if fake:
                        d = _fake_decode("image", b)
                        w, h = d["width"], d["height"]
                        tw, th = _png.fit_dims(w, h, max_side)
                        out = hashlib.sha256(b + f":{tw}x{th}".encode()).digest()
                        sha16 = out.hex()[:16]
                        rows.append((mid, kind, w, h, tw, th, out, sha16, None))
                        continue
                    if _png.is_png(b):
                        # real pixels, stdlib-only: decode → nearest-
                        # neighbor resample → deterministic re-encode
                        w, h, tw, th, out = _png.png_resize(b, max_side)
                    elif _jpeg.is_jpeg(b):
                        # lib-free JPEG codec (functions/jpeg.py): baseline
                        # since r11, progressive since r12, arithmetic
                        # sequential since r13 (jpeg_arith.py); anything
                        # still outside scope (12-bit/CMYK/arith-
                        # progressive/lossless) raises
                        # ValueError — fall through to Pillow when present,
                        # else surface the codec's reason.
                        try:
                            w, h, tw, th, out = _jpeg.jpeg_resize(b, max_side)
                        except ValueError as codec_err:
                            try:
                                w, h, tw, th, out = pillow_resize(b)
                            except ImportError:
                                raise codec_err from None  # no Pillow: report the codec reason
                    else:
                        try:
                            w, h, tw, th, out = pillow_resize(b)
                        except ImportError as e:  # pragma: no cover
                            raise NotImplementedError(
                                "real resize for non-PNG/JPEG images requires Pillow"
                            ) from e
                    rows.append(
                        (mid, kind, w, h, tw, th, out, hashlib.sha256(out).hexdigest()[:16], None)
                    )
                except Exception as e:
                    rows.append((mid, kind, None, None, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "src_width", "src_height",
                    "width", "height", "payload", "sha16", "error",
                ],
            )

    return ensure_parallelism(df.select("media_id", "kind", "payload")).mapInPandas(
        run, RESIZED_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Byte-histogram feature vector (L1-normalized, folded to ``dim``)
    via mapInPandas — a real, deterministic featurizer exercising the
    exact batch shape a neural embedder plugs into (swap the inner fn)."""
    if dim <= 0 or 256 % dim:
        # fail at plan time, not inside every executor batch's reshape
        raise ValueError(f"dim must divide 256, got {dim}")
    from rehiver_spark.session import ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload) if payload is not None else b"", dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                folded = hist.reshape(dim, 256 // dim).sum(axis=1)
                total = folded.sum()
                feats.append((folded / total if total else folded).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    from rehiver_spark.session import ensure_parallelism

    return ensure_parallelism(df.select("media_id", "payload")).mapInPandas(
        run, "media_id bigint, feature array<double>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_idx, offset_ms) rows
    from decoded duration — pure Column ops (sequence+explode); the
    actual frame grab would consume this plan next to the payload."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("offset_ms")
    )
