"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving mapInPandas over
Arrow batches, per-kind dispatch, bounded batch memory — is real and
tested.  The actual media decoding is STUBBED (this container ships no
image/audio libraries): ``decode`` for non-text kinds raises
``NotImplementedError`` with a clear marker, exactly where a PIL/ffmpeg
call would slot in.  Byte-level feature extraction (histograms, entropy)
is real computation and exercises the full plumbing end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Per-kind decode dispatch.  Non-text kinds are STUBS — replace with
    PIL.Image.open / soundfile.read / av.open on a cluster with media libs."""
    if kind == "text":
        return payload.decode("utf-8", errors="replace")
    raise NotImplementedError(
        f"STUB: {kind} decoding requires media libraries not present in this "
        f"environment (plumbing is real; slot a decoder in here)"
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
    """STUB pipeline stage: real Spark plumbing (filter to images, batch
    shape, output schema), decoder intentionally unimplemented here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for kind in pdf["kind"]:
                decode_payload(str(kind), b"")  # raises for media kinds
            yield pdf[["asset_id", "kind", "payload"]]  # pragma: no cover

    return assets.where(F.col("kind") == "image").select(
        "asset_id", "kind", "payload"
    ).mapInPandas(run, T.StructType(ASSET_SCHEMA.fields[:3]))


def sample_frames(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling — same contract as resize_images."""
    return resize_images(assets.where(F.col("kind") == "video"), 0, 0)
