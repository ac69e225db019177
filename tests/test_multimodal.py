"""Multimodal plumbing (logparse_spark/multimodal.py): binary payload +
typed metadata through Arrow-batched mapInPandas stages. The codec is
a documented deterministic stand-in; what these tests pin is the part
Spark owns — schemas, batch iteration, multi-row frame yield,
kind-filtered inputs, determinism, and payload-byte conservation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from logparse_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    from logparse_spark.packaging import ensure_shipped

    ensure_shipped(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = mm.synth_media(docs.select("doc_id", "text"))
    df.persist()
    df.count()
    yield df
    df.unpersist()


def test_synth_media_schema_and_kinds(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint", "kind": "string", "payload": "binary",
        "meta": "struct<width:int,height:int,sample_rate:int,"
                "n_frames:int,codec:string>",
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # metadata typed per kind: sample_rate only on audio, n_frames only
    # on video
    bad = media.filter(
        (F.col("meta.sample_rate").isNotNull() & (F.col("kind") != "audio"))
        | (F.col("meta.n_frames").isNotNull() & (F.col("kind") != "video"))
    ).count()
    assert bad == 0


def test_decode_conserves_bytes(media):
    dec = mm.decode(media)
    rows = {r["doc_id"]: r for r in dec.collect()}
    src = media.select("doc_id", F.length("payload").alias("n")).collect()
    assert len(rows) == len(src)
    for r in src:
        assert rows[r["doc_id"]]["n_samples"] == r["n"]
    # deterministic across runs
    again = {r["doc_id"]: r["checksum"] for r in mm.decode(media).collect()}
    assert again == {d: r["checksum"] for d, r in rows.items()}


def test_resize_images_shape(media):
    target = 8
    out = mm.resize_images(media, width=target).collect()
    n_imgs = media.filter("kind = 'image'").count()
    assert len(out) == n_imgs > 0
    for r in out:
        assert r["width"] <= target
        # payload is exactly the resized raster: width*height bytes
        assert len(r["payload"]) == r["width"] * r["height"]
    # resized payload is a column subset of the original byte grid:
    # every resized byte must exist in the source payload
    src = {r["doc_id"]: r["payload"]
           for r in media.filter("kind = 'image'").collect()}
    some = out[0]
    assert set(some["payload"]) <= set(src[some["doc_id"]])


def test_sample_frames_multiplicity(media):
    every = 2
    frames = mm.sample_frames(media, every_n=every)
    got = frames.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum(F.length("frame")).alias("bytes")
    ).collect()
    vids = {r["doc_id"]: r for r in media.filter("kind = 'video'").select(
        "doc_id", F.col("meta.n_frames").alias("nf"),
        F.length("payload").alias("nb")).collect()}
    assert len(got) == len(vids) > 0
    for r in got:
        v = vids[r["doc_id"]]
        # ceil(n_frames / every) kept frames per video
        assert r["n"] == -(-v["nf"] // every), (r, v)
    # frame indices are the sampled ones only
    idx = {r["frame_idx"] for r in frames.select("frame_idx")
           .distinct().collect()}
    assert all(i % every == 0 for i in idx)
    # kept-frame bytes never exceed the source, and a full sample
    # (every_n=1) conserves ALL bytes exactly
    full = mm.sample_frames(media, every_n=1).groupBy("doc_id").agg(
        F.sum(F.length("frame")).alias("bytes")).collect()
    for r in full:
        assert r["bytes"] == vids[r["doc_id"]]["nb"]


def test_extract_features_values(media):
    feats = {r["doc_id"]: r for r in mm.extract_features(media).collect()}
    assert len(feats) == media.count()
    # independently recompute one row driver-side
    probe = media.select("doc_id", "payload").first()
    a = np.frombuffer(probe["payload"], dtype=np.uint8)
    got = feats[probe["doc_id"]]
    assert got["byte_mean"] == pytest.approx(float(a.mean()))
    assert got["byte_std"] == pytest.approx(float(a.std()))
    hist = np.bincount(a, minlength=256).astype(float)
    p = hist[hist > 0] / len(a)
    assert got["byte_entropy"] == pytest.approx(float(-(p * np.log2(p)).sum()))
    # entropy of text bytes is sane (0 < H <= 8 bits)
    assert all(0 < r["byte_entropy"] <= 8 for r in feats.values())


def test_stages_are_arrow_batched_python(spark, media):
    """Each stage compiles to exactly one Python boundary crossing
    (MapInPandas/ArrowEval), with the scan pruned to the columns the
    stage needs — no text column, no per-row Python."""
    for df, needs in [
        (mm.decode(media), {"payload"}),
        (mm.extract_features(media), {"payload"}),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1, plan
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def _make_bmp(px: np.ndarray, top_down: bool = False) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as an uncompressed 24-bit
    BMP per the public spec: BITMAPFILEHEADER + BITMAPINFOHEADER,
    4-byte-aligned BGR rows, bottom-up unless top_down (negative
    height). An independent encoder, so decode_bmp is a round-trip
    check, not its own inverse."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        data += px[r][:, ::-1].tobytes()       # RGB -> BGR
        data += b"\x00" * (stride - w * 3)     # row padding
    off = 14 + 40
    size = off + len(data)
    fh = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
          + off.to_bytes(4, "little"))
    ih = ((40).to_bytes(4, "little")
          + w.to_bytes(4, "little", signed=True)
          + (-h if top_down else h).to_bytes(4, "little", signed=True)
          + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
          + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
          + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2)
    return bytes(fh + ih + data)


def test_decode_bmp_roundtrip():
    """Pixel-exact round trip of the REAL decoder against an
    independent encoder: padded odd widths, bottom-up AND top-down
    storage, plus rejection of near-BMPs (wrong bpp, truncated) that
    must fall back to the stand-in path."""
    rng = np.random.default_rng(11)
    for w, h in [(3, 2), (5, 4), (1, 1), (7, 3)]:   # odd widths pad
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for td in (False, True):
            got = mm.decode_bmp(_make_bmp(px, top_down=td))
            assert got is not None and got.shape == (h, w, 3)
            assert np.array_equal(got, px), (w, h, td)
    # rejections -> None (decode() then uses the byte stand-in)
    px = rng.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    good = _make_bmp(px)
    assert mm.decode_bmp(b"BMshort") is None
    assert mm.decode_bmp(good[:40]) is None          # truncated header
    assert mm.decode_bmp(good[:-3]) is None          # truncated pixels
    bad_bpp = bytearray(good); bad_bpp[28] = 8
    assert mm.decode_bmp(bytes(bad_bpp)) is None     # 8-bit: not ours
    bad_comp = bytearray(good); bad_comp[30] = 1
    assert mm.decode_bmp(bytes(bad_comp)) is None    # BI_RLE8


def test_decode_stage_decodes_real_bmp(spark):
    """The decode STAGE applies the real codec inside the same single
    mapInPandas: a BMP payload's n_samples/checksum describe the
    decoded pixels (w*h*3, sum of pixel values — header, padding and
    channel order stripped), while a non-BMP payload keeps the
    stand-in byte semantics; the plan still carries exactly one
    MapInPandas and no extra exchange."""
    from logparse_spark.packaging import ensure_shipped

    ensure_shipped(spark)
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    bmp = _make_bmp(px)
    raw = b"\x01\x02\x03\x04"
    media = spark.createDataFrame(
        [(1, "image", bytearray(bmp), None),
         (2, "audio", bytearray(raw), None)],
        mm.MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in mm.decode(media).collect()}
    assert out[1]["n_samples"] == 4 * 5 * 3
    assert out[1]["checksum"] == int(px.sum())
    assert out[1]["n_samples"] < len(bmp)  # container bytes stripped
    assert out[2]["n_samples"] == 4 and out[2]["checksum"] == 1 + 2 + 3 + 4
    plan = mm.decode(media)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
