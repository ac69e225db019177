"""Multimodal columns: opaque binary payloads + typed metadata through
Arrow-batched Python stages.

The brief's pipeline shape for image/audio/video at 100 TB: media
lives as a ``binary`` column beside a typed metadata struct; every
media transform (decode, resize, frame-sample, feature-extract) is a
``mapInPandas`` stage so payload bytes cross the JVM<->Python boundary
once per batch as Arrow buffers — never per row, never through the
driver.

No media libraries exist in this container, so most codec work is a
clearly-marked deterministic stand-in (see ``decode``): the bytes are
treated as the decoded raster/waveform directly. ONE format is decoded
for real — uncompressed 24-bit BMP, via the pure-numpy ``decode_bmp``
(header parse, row de-pad, bottom-up flip, BGR->RGB) — proving the
stage shape carries an actual codec. Everything the Spark layer owns —
schemas, Arrow batch iteration, multi-row yield (frame explode),
partition routing by kind, column pruning — is real and is what the
tests pin. Swapping the remaining stand-ins for Pillow/ffmpeg changes
only the inner numpy lines of each stage.

Scale notes baked into each stage:
- payload transforms select ONLY the columns they need first, so the
  parquet scan prunes to (id, payload, meta) — at 100 TB dragging an
  unused text column through Arrow doubles the job.
- stages yield one output frame per INPUT Arrow batch (bounded memory:
  spark.sql.execution.arrow.maxRecordsPerBatch rows at a time), and
  frame sampling yields MULTIPLE output rows per input row without
  materializing whole videos.
- media kinds route by ``repartition("kind")`` only when a stage is
  kind-specific (resize on images, frames on video) — a filter first,
  so the shuffle carries only the relevant payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = ("width int, height int, sample_rate int, n_frames int, "
               "codec string")

MEDIA_SCHEMA = f"doc_id long, kind string, payload binary, meta struct<{META_SCHEMA}>"


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture — the
    sandbox stand-in for a real ingest (no external data, per the
    brief). Each doc becomes one media row; the payload is the doc's
    UTF-8 bytes (deterministic, size-varied), the kind cycles
    image/audio/video by doc_id, and the metadata struct is derived
    from the payload size the way a real probe (ffprobe/PIL.open)
    would fill it."""
    blob = F.encode("text", "UTF-8")
    n = F.length(blob)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    width = (n % 64 + 8).cast("int")
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        blob.alias("payload"),
        F.struct(
            width.alias("width"),
            F.greatest(F.floor(n / (n % 64 + 8)), F.lit(1))
            .cast("int").alias("height"),
            F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(kind == "video", (n % 7 + 2).cast("int")).alias("n_frames"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_bmp(buf: bytes) -> "np.ndarray | None":
    """REAL pure-numpy decoder for one public format: uncompressed
    24-bit BI_RGB Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    the layout in the public file-format spec). Returns the pixel
    raster as an (h, w, 3) RGB uint8 array — rows un-padded (BMP rows
    are 4-byte aligned), vertically un-flipped (positive-height BMPs
    are stored bottom-up), channels BGR->RGB — or None when the bytes
    are not such a BMP (wrong magic/bpp/compression, truncated), in
    which case ``decode`` falls back to the documented stand-in."""
    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    off = int.from_bytes(buf[10:14], "little")
    dib = int.from_bytes(buf[14:18], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    planes = int.from_bytes(buf[26:28], "little")
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if (dib < 40 or planes != 1 or bpp != 24 or comp != 0
            or w <= 0 or h == 0 or off < 54):
        return None
    h_abs = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if len(buf) < off + stride * h_abs:
        return None
    a = np.frombuffer(buf, dtype=np.uint8, count=stride * h_abs,
                      offset=off)
    rows = a.reshape(h_abs, stride)[:, : w * 3]
    if h > 0:  # positive height = bottom-up storage
        rows = rows[::-1]
    return rows.reshape(h_abs, w, 3)[:, :, ::-1]


def decode(media: DataFrame) -> DataFrame:
    """Decode stage: payload bytes -> pixel/sample buffer + checksum.

    Image payloads that parse as uncompressed 24-bit BMP get a REAL
    decode (``decode_bmp`` — header parse, row de-pad, vertical
    un-flip, BGR->RGB; n_samples/checksum then describe the decoded
    PIXELS, not the container bytes). Everything else is the
    documented STAND-IN: a real deployment calls the codec here
    (PIL.Image.open / soundfile.read / av.open on ``payload``); this
    container has none beyond BMP, so the "decoded buffer" IS the
    payload bytes reinterpreted as uint8 — deterministic,
    size-preserving, and exercising the identical Arrow path."""
    cols = media.select("doc_id", "kind", "payload")

    def run(batches):
        for pdf in batches:
            bufs = []
            for b in pdf["payload"]:
                px = decode_bmp(b) if b else None
                bufs.append(px.ravel() if px is not None
                            else np.frombuffer(b or b"", dtype=np.uint8))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_samples": [len(a) for a in bufs],
                "checksum": [int(a.sum()) for a in bufs],
            })

    return cols.mapInPandas(
        run, "doc_id long, kind string, n_samples long, checksum long")


def resize_images(media: DataFrame, width: int = 8) -> DataFrame:
    """Resize stage (images only): nearest-neighbor downsample of the
    byte raster to ``width`` columns per row — real byte-grid math on
    the stand-in decode (a real build swaps the inner two lines for
    PIL.Image.resize). Filter-then-shuffle: only image payloads are
    selected, so nothing else crosses the exchange."""
    imgs = media.filter(F.col("kind") == "image").select(
        "doc_id", "payload", "meta.width", "meta.height")

    def run(batches):
        for pdf in batches:
            out_payload, out_h = [], []
            for b, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                a = np.frombuffer(b or b"", dtype=np.uint8)
                h = max(int(h), 1)
                grid = a[: (len(a) // max(int(w), 1)) * max(int(w), 1)]
                grid = grid.reshape(-1, max(int(w), 1)) if len(grid) else \
                    np.zeros((0, max(int(w), 1)), dtype=np.uint8)
                idx = np.linspace(
                    0, grid.shape[1] - 1, num=min(width, grid.shape[1]),
                    dtype=np.int64,
                ) if grid.shape[1] else np.array([], dtype=np.int64)
                small = grid[:, idx]
                out_payload.append(small.tobytes())
                out_h.append(small.shape[0])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": out_payload,
                "width": np.minimum(pdf["width"].to_numpy(), width),
                "height": out_h,
            })

    return imgs.mapInPandas(
        run, "doc_id long, payload binary, width int, height int")


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stage (video only): split the payload into
    ``meta.n_frames`` equal chunks and keep every ``every_n``-th — one
    OUTPUT ROW PER KEPT FRAME, yielded incrementally so a long video
    never materializes whole (the flatMap/UDTF shape of mapInPandas).
    A real build swaps the chunk split for av/ffmpeg keyframe seeks."""
    vids = media.filter(F.col("kind") == "video").select(
        "doc_id", "payload", F.col("meta.n_frames").alias("n_frames"))

    def run(batches):
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for d, b, nf in zip(pdf["doc_id"], pdf["payload"],
                                pdf["n_frames"]):
                a = np.frombuffer(b or b"", dtype=np.uint8)
                nf = max(int(nf), 1)
                for i, chunk in enumerate(np.array_split(a, nf)):
                    if i % every_n == 0:
                        ids.append(d)
                        fidx.append(i)
                        frames.append(chunk.tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "frame": frames})

    return vids.mapInPandas(
        run, "doc_id long, frame_idx int, frame binary")


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage (all kinds): byte-histogram moments per
    payload — mean, std, and entropy over the uint8 distribution,
    vectorized numpy per Arrow batch. The embedding-model stand-in: on
    a real build this is where the encoder forward pass goes (batched,
    GPU-side), with the identical frame shape."""
    cols = media.select("doc_id", "kind", "payload")

    def run(batches):
        for pdf in batches:
            mean, std, ent = [], [], []
            for b in pdf["payload"]:
                a = np.frombuffer(b or b"", dtype=np.uint8)
                if not len(a):
                    mean.append(0.0); std.append(0.0); ent.append(0.0)
                    continue
                hist = np.bincount(a, minlength=256).astype(np.float64)
                p = hist[hist > 0] / len(a)
                mean.append(float(a.mean()))
                std.append(float(a.std()))
                ent.append(float(-(p * np.log2(p)).sum()))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": pdf["kind"],
                "byte_mean": mean, "byte_std": std, "byte_entropy": ent,
            })

    return cols.mapInPandas(
        run,
        "doc_id long, kind string, byte_mean double, byte_std double, "
        "byte_entropy double",
    )
