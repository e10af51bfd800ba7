"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving mapInPandas over
Arrow batches, per-kind dispatch, bounded batch memory — is real and
tested.  Media decoding is gated on OPTIONAL libraries (PIL for images,
soundfile for audio, av for video): where they are importable the decode /
resize / frame-sample stages do real work; where they are not (this
container ships none of them) the same entry points raise a clearly-marked
``NotImplementedError`` stub.  Byte-level feature extraction (histograms,
entropy) needs no media libs and exercises the full plumbing end-to-end.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# optional media decoders — resolved at module import on driver AND workers
try:  # pragma: no cover - depends on environment
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover
    _PIL_Image = None
try:  # pragma: no cover
    import soundfile as _soundfile
except ImportError:  # pragma: no cover
    _soundfile = None
try:  # pragma: no cover
    import av as _av
except ImportError:  # pragma: no cover
    _av = None


from ds_discovery_opensearch_taxonomy_spark.functions import minimedia as _mm


def media_support() -> dict[str, bool]:
    """Which media kinds can decode in this environment.  ``image`` /
    ``audio`` report FULL-format support (the optional library); the
    ``*_builtin`` keys are always true — PNG and PCM-WAV decode via the
    vendored pure-Python codecs (functions/minimedia.py) everywhere."""
    return {
        "text": True,
        "image": _PIL_Image is not None,
        "audio": _soundfile is not None,
        "video": _av is not None,
        "image_png_builtin": True,
        "audio_wav_builtin": True,
        "video_y4m_builtin": True,
    }

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # text|image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram16", T.ArrayType(T.DoubleType()), False),
    ]
)

_MIME = {"text": "text/plain", "image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def assets_from_documents(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a multimodal asset table from a text table: payload =
    utf-8 bytes, kind cycled deterministically (text rows stay decodable,
    other kinds exercise the opaque-binary path)."""
    kind = F.element_at(
        F.array(F.lit("text"), F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(4)) + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    mime = F.element_at(
        F.create_map(*[F.lit(x) for kv in _MIME.items() for x in kv]), kind
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_payload(kind: str, payload: bytes):
    """Per-kind decode dispatch: the optional library when importable,
    else the vendored pure-Python codec for the formats it covers (PNG,
    PCM WAV — functions/minimedia.py), else a clearly-marked stub."""
    if kind == "text":
        return payload.decode("utf-8", errors="replace")
    if kind == "image":
        if _PIL_Image is not None:
            return np.asarray(_PIL_Image.open(io.BytesIO(payload)))
        if payload[:8] == _mm.PNG_MAGIC:
            return _mm.decode_png(payload)
    if kind == "audio":
        if _soundfile is not None:
            data, rate = _soundfile.read(io.BytesIO(payload))
            return np.asarray(data), int(rate)
        if payload[:4] == _mm.WAV_MAGIC:
            return _mm.decode_wav(payload)
    if kind == "video":
        if _av is not None:
            with _av.open(io.BytesIO(payload)) as container:
                return [
                    f.to_ndarray(format="rgb24")
                    for f in container.decode(video=0)
                ]
        if payload[: len(_mm.Y4M_MAGIC)] == _mm.Y4M_MAGIC:
            return _mm.decode_y4m(payload)
    raise NotImplementedError(
        f"STUB: decoding this {kind} payload requires an optional media "
        f"library (PIL/soundfile/av) not present in this environment — "
        f"only PNG images, PCM-WAV audio and Y4M video decode via the "
        f"vendored pure-Python codecs (plumbing is real; install the lib "
        f"for other formats)"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Byte-level features per asset via mapInPandas (Arrow batches; memory
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch):
    16-bin byte histogram (L1-normalized) + byte entropy.  REAL computation
    over the binary payload — the template for decode-then-featurize."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ent = np.zeros(n)
            hists: list[list[float]] = []
            nbytes = np.zeros(n, dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                nbytes[i] = buf.size
                if buf.size == 0:
                    hists.append([0.0] * 16)
                    continue
                counts = np.bincount(buf >> 4, minlength=16).astype(np.float64)
                p = counts / counts.sum()
                nz = p[p > 0]
                ent[i] = float(-(nz * np.log2(nz)).sum())
                hists.append((counts / counts.sum()).round(6).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "byte_entropy": np.round(ent, 6),
                    "histogram16": hists,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over Arrow batches: PIL when importable (any format,
    filtered resample), else the vendored PNG codec + nearest-neighbour
    resize for PNG payloads (REAL in every environment), else the declared
    stub.  Spark plumbing (filter to images, batch shape, output schema)
    is the same on every path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                payload = bytes(payload)
                if _PIL_Image is not None:
                    img = _PIL_Image.open(io.BytesIO(payload)).resize(
                        (width, height)
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                else:
                    # vendored path: raises the stub marker for non-PNG
                    arr = decode_payload("image", payload)
                    out.append(
                        _mm.encode_png(_mm.resize_nearest(arr, width, height))
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                }
            )

    return assets.where(F.col("kind") == "image").select(
        "asset_id", "kind", "payload"
    ).mapInPandas(run, T.StructType(ASSET_SCHEMA.fields[:3]))


def sample_frames(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling (every ``every_n``-th frame re-encoded as PNG
    rows): REAL via av+PIL when importable, and via the vendored Y4M
    decoder + PNG encoder (functions/minimedia.py) for YUV4MPEG2 payloads
    everywhere else; other containers raise the declared stub through
    decode_payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"asset_id": [], "kind": [], "payload": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, frame in enumerate(decode_payload("video", payload)):
                    if i % every_n:
                        continue
                    if _PIL_Image is not None:
                        buf = io.BytesIO()
                        _PIL_Image.fromarray(frame).save(buf, format="PNG")
                        png = buf.getvalue()
                    else:
                        png = _mm.encode_png(frame)
                    rows["asset_id"].append(aid)
                    rows["kind"].append("image")
                    rows["payload"].append(png)
            yield pd.DataFrame(rows)

    return assets.where(F.col("kind") == "video").select(
        "asset_id", "kind", "payload"
    ).mapInPandas(run, T.StructType(ASSET_SCHEMA.fields[:3]))
