"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` so the
Python cost is per-batch, not per-row. The actual media decoding is
STUBBED (no image/audio libraries in this environment — decode_image
raises NotImplementedError); everything around it — schema, batch
iteration, partitioning, output contract — is real and tested, so
swapping in PIL/librosa later is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of extract_features
FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes INT, byte_mean DOUBLE, byte_entropy_proxy DOUBLE,"
    " format STRING"
)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to an array. STUB: the real
    implementation needs an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires an imaging library; this environment "
        "ships none — wire PIL/pillow here in production"
    )


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a deterministic fake binary column + metadata struct
    from existing data (for plumbing tests): payload = repeated md5
    digest bytes, metadata = (format, n_bytes)."""
    digest = F.unhex(F.md5(F.col(text_col)))
    # concat (not repeat) keeps the column BINARY — repeat would coerce
    # to string and produce invalid UTF-8 that Arrow refuses to ship
    payload = F.concat(digest, digest, digest, digest)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/md5x4").alias("format"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-payload features here are deterministic byte statistics
    standing in for real embeddings; the mapInPandas shape (batch
    iterator in, batch iterator out, explicit schema) is exactly what a
    real extractor uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_mean = payloads.map(
                lambda b: (sum(b) / len(b)) if len(b) else 0.0
            )
            entropy_proxy = payloads.map(
                lambda b: len(set(b)) / 256.0 if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "byte_mean": byte_mean,
                    "byte_entropy_proxy": entropy_proxy,
                    "format": pdf["meta"].map(lambda m: m["format"]),
                }
            )

    return binary_df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(binary_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (doc_id, frame_idx) rows for
    frames a decoder would extract — pure plan-side arithmetic standing
    in for the decode step (which is stubbed). Demonstrates the 1->N
    expansion shape (explode) used for frame pipelines."""
    n_frames = (F.col("meta.n_bytes") / F.lit(4)).cast("int")
    return binary_df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def payload_checksum(binary_df: DataFrame) -> DataFrame:
    """Driver-verifiable checksum of payload bytes (md5 hex) — lets an
    oracle validate the binary plumbing end-to-end in pure SQL."""
    return binary_df.select(
        "doc_id", F.hex(F.md5(F.col("payload").cast("binary"))).alias("checksum")
    )


WINDOW_STATS_SCHEMA = "doc_id BIGINT, win_idx INT, win_mean DOUBLE, win_max BIGINT"


def attach_multiwindow_payload(
    df: DataFrame, id_col: str, text_col: str, windows: int = 4
) -> DataFrame:
    """Deterministic fake audio-ish payload with *distinct* 16-byte
    windows (window w = md5 digest of text + suffix), so windowed
    processing produces non-constant, oracle-reproducible output."""
    suffixes = ["", "a", "b", "c", "d", "e", "f", "g"][:windows]
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.col(text_col), F.lit(s)))) for s in suffixes]
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/pcm16x4").alias("format"),
            F.length(payload).alias("n_bytes"),
            F.lit(16).alias("win_bytes"),
        ).alias("meta"),
    )


def window_byte_stats(binary_df: DataFrame) -> DataFrame:
    """Audio-style windowed stats: split each payload into fixed-size
    byte windows and emit per-window mean/max — the mapInPandas 1->N
    expansion a real frame/sample feature extractor uses (decode
    stubbed; batch iteration, fan-out, and schema are the real thing).

    Arrow ships whole payload batches to Python once; each batch fans
    out to n_windows rows. At 100 TB this is the right boundary: the
    heavy bytes cross to Python exactly once, stats come back tiny.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "win_idx": [],
                "win_mean": [],
                "win_max": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                wb = int(meta["win_bytes"])
                for w in range(0, max(len(payload) // wb, 0)):
                    chunk = payload[w * wb : (w + 1) * wb]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(w)
                    out["win_mean"].append(sum(chunk) / len(chunk))
                    out["win_max"].append(max(chunk))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(batches, WINDOW_STATS_SCHEMA)
