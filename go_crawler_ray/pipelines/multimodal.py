"""Multimodal (binary-payload) pipeline plumbing.

Treats media as opaque ``large_binary`` columns with typed metadata, the
way an image/audio corpus rides beside text at 100 TB scale. The real
decode libraries (Pillow/ffmpeg/...) are NOT in this container, so the
decode kernel is a clearly-marked deterministic FAKE behind the same
actor-pool interface a real decoder would use — the Ray-side plumbing
(schema, small batch size for wide rows, actor signature, output layout)
is real and tested.

Payload format (deterministic given doc_id, so a SQL oracle can recompute
the expected metadata from the ``documents`` table alone):

  bytes  0-6   magic   b"FAKEIMG"
  bytes  7-8   width   uint16 LE  = 16 + doc_id % 64
  bytes  9-10  height  uint16 LE  = 16 + (doc_id * 7) % 64
  byte   11    channels uint8     = 1 + doc_id % 3
  bytes 12..   body: the doc's utf-8 text (stand-in pixel data)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MAGIC = b"FAKEIMG"


def encode_payload(doc_id: int, text: str) -> bytes:
    w = 16 + doc_id % 64
    h = 16 + (doc_id * 7) % 64
    c = 1 + doc_id % 3
    return (MAGIC + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
            + int(c).to_bytes(1, "little") + text.encode("utf-8"))


def build_media_table(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload) binary table (the synthetic "media
    sidecar"; real pipelines would read_binary_files/read_parquet)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = [encode_payload(int(d), t) for d, t in
                    zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())]
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.large_binary()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode stub: parses the payload header into typed
    metadata. A real decoder would do `PIL.Image.open` here; this class
    is where that swap happens (``real_decoder=True`` raises
    NotImplementedError to mark the boundary)."""

    def __init__(self, real_decoder: bool = False):
        if real_decoder:
            raise NotImplementedError(
                "image decode libraries are not available in this container;"
                " the fake header-parse below stands in for them")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, channels, ok = [], [], [], []
        n_bytes = []
        for p in batch["payload"].to_pylist():
            n_bytes.append(len(p))
            if p[:7] == MAGIC and len(p) >= 12:
                widths.append(int.from_bytes(p[7:9], "little"))
                heights.append(int.from_bytes(p[9:11], "little"))
                channels.append(p[11])
                ok.append(True)
            else:
                widths.append(0); heights.append(0); channels.append(0)
                ok.append(False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "channels": pa.array(channels, pa.int64()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def media_metadata(sf_dir: str) -> pd.DataFrame:
    """(doc_id, width, height, channels, n_bytes, decode_ok) — the decode
    stage over the binary sidecar; small batch_size because rows are wide
    (the binary column dominates block size)."""
    ds = build_media_table(sf_dir)
    out = ds.map_batches(DecodeStage, batch_format="pyarrow",
                         concurrency=2, batch_size=256).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
