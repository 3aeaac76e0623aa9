"""Multimodal column plumbing (extension surface).

Images/audio/video ride through the engine as opaque `binary` columns with a
typed metadata struct. The Spark-side plumbing — schema, Arrow-batched
Pandas UDF signatures, partition-sized batches — is real and tested; the
actual media decode is STUBBED (the codec libraries are not in this
container): `decode_image`/`decode_audio` raise NotImplementedError, and
`extract_meta` computes deterministic byte-level features instead, standing
in for a real feature extractor with the identical dataflow shape.

Scale notes: binary payloads dominate partition size, so media tables
should be written with small `spark.sql.files.maxPartitionBytes` and the
metadata struct kept in a separate (or at least early) column so metadata-
only queries never deserialize payload bytes (parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .core import spread

META_SCHEMA = (
    "n_bytes bigint, first_byte int, byte_md5 string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Fake media payload: utf-8 bytes of a text column (deterministic stand-
    in for image/audio bytes so the binary plumbing is exercised end-to-end).
    """
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def extract_meta(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-payload metadata via an Arrow-batched mapInPandas pass.

    Output: (id, n_bytes, first_byte, byte_md5). This is the exact dataflow
    of a real decode/feature-extract stage: binary in, small typed struct
    out, one pass, no shuffle.
    """
    import hashlib

    out_schema = f"{id_col} bigint, {META_SCHEMA}"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (failed upstream fetch) → empty bytes, not a
            # TypeError that fails the whole stage
            payload = pdf[payload_col].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "first_byte": payload.map(lambda b: b[0] if len(b) else -1),
                    "byte_md5": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return spread(df.select(id_col, payload_col)).mapInPandas(_extract, out_schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — real implementation requires an image codec (PIL/opencv), not
    present in this environment. The production shape would be mapInPandas:
    binary → decoded HxWxC array features (resize/crop/normalize) → struct.
    """
    raise NotImplementedError(
        "image decode requires a codec library; use extract_meta for the "
        "plumbing-equivalent deterministic feature pass"
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — see decode_image; audio frame-sampling has the same dataflow."""
    raise NotImplementedError(
        "audio decode requires a codec library; use extract_meta for the "
        "plumbing-equivalent deterministic feature pass"
    )


def frame_sample(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    width: int = 128, stride: int = 96,
) -> DataFrame:
    """Frame sampling over a (fake) media payload: one row per fixed-stride
    window — the one-to-many dataflow of video frame extraction (binary in,
    N frame rows out) via Arrow-batched mapInPandas.

    Frames start at offsets 0, stride, 2*stride, … while offset < length
    (empty payloads yield one empty frame). Deterministic features per
    frame: length + md5 — a stand-in with the identical batch shape a real
    decoder would have.
    """
    import hashlib

    out_schema = f"{id_col} bigint, frame_idx int, frame_len bigint, frame_md5 string"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                for i, off in enumerate(range(0, max(len(t), 1), stride)):
                    frame = t[off:off + width]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_len": lens, "frame_md5": md5s}
            )

    return spread(df.select(id_col, text_col)).mapInPandas(_frames, out_schema)
