"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested; the actual codec work is
STUBBED (the decode libs aren't in this container): `decode_stub`
raises NotImplementedError unless `fake=True`, in which case it emits a
deterministic fake feature row (byte length + md5 checksum + fake
dimensions derived from the checksum) so the batch plumbing can be
oracle-checked end-to-end.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int"
)


def to_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Make an opaque-binary media table out of a text table (test rig:
    payload = utf-8 bytes; in production this column comes from the
    lakehouse as real image/audio bytes)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_one(payload: bytes, fake: bool):
    if not fake:
        # real decode would use PIL / torchaudio / pyav here
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    checksum = hashlib.md5(payload).hexdigest()
    # deterministic fake dimensions from the checksum
    width = int(checksum[:4], 16) % 1024 + 1
    height = int(checksum[4:8], 16) % 1024 + 1
    return len(payload), checksum, width, height


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: one Arrow batch of (doc_id, payload, media_type) in,
    one pandas DataFrame of MEDIA_SCHEMA out. This is the exact
    signature a real decoder plugs into.
    """

    def run(batches):
        for pdf in batches:
            rows = [
                _decode_one(p, fake) for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                rows, columns=["n_bytes", "checksum", "width", "height"]
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
