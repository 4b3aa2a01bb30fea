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


RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "resized_width int, resized_height int"
)


def resize(media: DataFrame, max_side: int = 256, fake: bool = True) -> DataFrame:
    """mapInPandas image resize plumbing (1 row in → 1 row out).

    Real mode would decode + PIL-resize + re-encode; the stub derives
    the source dimensions exactly like decode_features and applies the
    standard longest-side cap with integer arithmetic (new = max(1,
    side·max_side // longest)) so the DuckDB oracle reproduces it.
    """

    def run(batches):
        for pdf in batches:
            recs = []
            for p in pdf["payload"]:
                _, _, w, h = _decode_one(p, fake)
                longest = max(w, h)
                if longest <= max_side:
                    rw, rh = w, h
                else:
                    rw = max(1, w * max_side // longest)
                    rh = max(1, h * max_side // longest)
                recs.append((w, h, rw, rh))
            out = pd.DataFrame(
                recs,
                columns=["width", "height", "resized_width", "resized_height"],
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms long, frame_checksum string"
)


def frame_sample(media: DataFrame, n_frames: int = 4, fake: bool = True) -> DataFrame:
    """mapInPandas video frame sampling plumbing (1 row in → n rows
    out — the fan-out batch shape a real pyav sampler needs).

    Stub semantics (oracle-reproducible): fake duration_ms = payload
    length mod 100000; frame i of n lands at ts_ms = i·duration//n with
    checksum md5(payload_md5 || ':' || i).
    """

    def run(batches):
        for pdf in batches:
            ids, idxs, tss, sums = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "frame sampling requires video codec libraries not "
                        "present in this environment; pass fake=True"
                    )
                checksum = hashlib.md5(p).hexdigest()
                duration_ms = len(p) % 100000
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * duration_ms // n_frames)
                    sums.append(
                        hashlib.md5(f"{checksum}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_checksum": sums,
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
