"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode/feature-extract as Arrow-batched UDFs.

The container ships no image/audio libraries, so the decode kernels are
STUBBED behind ``_decode_image_stub`` (deterministic fake) — the Spark-side
plumbing (schemas, mapInPandas batching, partition sizing) is real and
tested.  Swapping the stub for PIL/torchaudio is a one-function change on a
real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, n_bytes int, magic string, media_type string"
)
FEATURE_SCHEMA = "id long, width int, height int, feature array<float>"

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ffe0": "image/jpeg",
    "ffd8ffe1": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",
    "664c6143": "audio/flac",
}


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata from the binary column — native expressions only
    (magic-byte sniff via hex prefix)."""
    magic = F.lower(F.hex(F.substring(F.col(bin_col), 1, 4)))
    mt = F.lit("application/octet-stream")
    for sig, typ in _MAGIC.items():
        mt = F.when(magic == sig, F.lit(typ)).otherwise(mt)
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(bin_col)).alias("n_bytes"),
        magic.alias("magic"),
        mt.alias("media_type"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: no image codecs in this container.  Returns a
    deterministic fake (width, height, 8-dim feature) derived from the
    payload bytes so the pipeline shape is fully exercisable.  Replace with
    a real decoder (PIL.Image.open → resize → model) in production."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(h[:4].sum()) % 1024 + 1
    height = int(h[4:8].sum()) % 1024 + 1
    feature = h.reshape(8, 8).mean(axis=1) / 255.0
    return width, height, feature


def extract_features(df: DataFrame, bin_col: str, id_col: str,
                     batch_limit: int = 256) -> DataFrame:
    """Decode + featurise via mapInPandas (iterator form: per-batch work,
    per-executor amortised setup — the N2 chunked-inference shape,
    tools/matcher_funcs.py:1384-1412)."""
    fields = [id_col, bin_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, f = _decode_image_stub(bytes(payload))
                ids.append(rid)
                widths.append(w)
                heights.append(h)
                feats.append(f.tolist())
            yield pd.DataFrame(
                {"id": ids, "width": widths, "height": heights, "feature": feats}
            )

    return df.select(*fields).mapInPandas(run, FEATURE_SCHEMA)
