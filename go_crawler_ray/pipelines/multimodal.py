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

from ..functions.pool import auto_pool

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
                         concurrency=auto_pool(), batch_size=256).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class ResizeStage:
    """Actor-pool resize stub: halves each dimension (floor, min 1) and
    emits a 'thumbnail' payload (header rewritten + body truncated
    proportionally). A real implementation swaps the body transform for
    PIL/cv2; header/schema plumbing is identical."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        widths, heights, thumbs = [], [], []
        for p in batch["payload"].to_pylist():
            w = int.from_bytes(p[7:9], "little")
            h = int.from_bytes(p[9:11], "little")
            nw, nh = max(1, w // f), max(1, h // f)
            body = p[12:]
            thumb = (MAGIC + nw.to_bytes(2, "little") + nh.to_bytes(2, "little")
                     + p[11:12] + body[: max(1, len(body) // (f * f))])
            widths.append(nw); heights.append(nh); thumbs.append(thumb)
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "thumb": pa.array(thumbs, pa.large_binary()),
        })


def media_resize(sf_dir: str, factor: int = 2) -> pd.DataFrame:
    """(doc_id, width, height, thumb_bytes) after the resize stage."""
    ds = build_media_table(sf_dir)
    out = ds.map_batches(ResizeStage, batch_format="pyarrow",
                         concurrency=auto_pool(), batch_size=256,
                         fn_constructor_kwargs={"factor": factor})

    def meta(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": batch["doc_id"],
            "width": batch["width"],
            "height": batch["height"],
            "thumb_bytes": pc.binary_length(batch["thumb"]).cast(pa.int64()),
        })

    got = out.map_batches(meta, batch_format="pyarrow").to_pandas()
    return got.sort_values("doc_id").reset_index(drop=True)


class FeatureStage:
    """Actor-pool feature-extract stub: a deterministic 8-bin byte
    histogram over the body, L1-normalized — the embedding-shaped output a
    real audio/image featurizer would produce (list<float> column)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.compat import round_half_away

        feats = []
        for p in batch["payload"].to_pylist():
            body = np.frombuffer(p[12:], dtype=np.uint8)
            hist = np.bincount(body >> 5, minlength=8).astype(np.float64)
            total = hist.sum() or 1.0
            # half-away rounding so the SQL oracle's ROUND matches
            feats.append(round_half_away(hist / total, 6).tolist())
        return pa.table({
            "doc_id": batch["doc_id"],
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def media_features(sf_dir: str) -> pd.DataFrame:
    """(doc_id, bin, value): the 8-bin features EXPLODED to scalar rows —
    list<float> columns don't compare portably across the SQL oracle
    boundary, so the operator keeps its embedding-shaped list output
    (FeatureStage) and the query surface flattens it (a driver reshape of
    the N x 8 result, not a distributed step)."""
    import numpy as np

    ds = build_media_table(sf_dir)
    out = ds.map_batches(FeatureStage, batch_format="pyarrow",
                         concurrency=auto_pool(), batch_size=256).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    feats = np.stack(out["features"].to_numpy())
    n, b = feats.shape
    return pd.DataFrame({
        "doc_id": np.repeat(out["doc_id"].to_numpy().astype("int64"), b),
        "bin": np.tile(np.arange(b, dtype="int64"), n),
        "value": feats.ravel(),
    })


class FrameSampleStage:
    """Actor-pool frame-sample stub for 'video' payloads: splits the body
    into n_frames equal chunks and emits one row per sampled frame
    (doc_id, frame_idx, frame_bytes) — the flat-map layout a real
    ffmpeg-based sampler would produce."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sizes = [], [], []
        for d, p in zip(batch["doc_id"].to_pylist(),
                        batch["payload"].to_pylist()):
            body = p[12:]
            k = min(self.n_frames, max(1, len(body)))
            step = len(body) // k or 1
            for i in range(k):
                chunk = body[i * step: (i + 1) * step]
                ids.append(d); idxs.append(i); sizes.append(len(chunk))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_bytes": pa.array(sizes, pa.int64()),
        })


def media_frames(sf_dir: str, n_frames: int = 4) -> pd.DataFrame:
    ds = build_media_table(sf_dir)
    out = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                         concurrency=auto_pool(), batch_size=256,
                         fn_constructor_kwargs={"n_frames": n_frames}) \
        .to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
