"""Image pipeline operators (SURVEY D7, S8, K5, F15-F17, X3, X7-X8).

The reference streams each image to disk, posts it to a re-host
service, and classifies by byte size (weixin_public.py:310-373).
Here the pipeline is columnar: explode <img> tags -> signature
blacklist anti-join -> dedupe URLs (the reference's download cache,
weixin_public.py:314) -> fetch bytes (sandbox: deterministic synth
from the URL) -> decode/phash -> deterministic re-host id.

bytes/decode cross the Arrow boundary in batches (mapInPandas); pixel
work is numpy. Real HTTP fetch and real PNG/JPEG decode are the only
stubbed seams (see functions/images.decode_standard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import images as IMG
from ..functions.hashing import xxhash64

TFS_BASE = "http://tfs.example.invalid/"


def synth_image_pixels(src_url: str) -> tuple[np.ndarray, str]:
    """Deterministic pixels for a synthetic image URL: dimensions and
    content derive from xxhash64(url) only — same pixels at any scale
    or parallelism. Returns (pixels, fmt) where fmt comes from the
    URL's wx_fmt param (X3 default 'jpg')."""
    h = xxhash64(src_url) & 0x7FFFFFFFFFFFFFFF
    w = 8 + h % 48
    ht = 8 + (h // 48) % 48
    rng = np.random.RandomState(h % (2**31))
    px = rng.randint(0, 256, size=(ht, w, 3)).astype(np.uint8)
    return px, ("jpeg" if h % 3 == 0 else "png")


def fetch_and_decode_images(imgs: DataFrame, src_col: str = "src") -> DataFrame:
    """bytes + (w, h, fmt, phash, small) for each image URL.

    In production the fetch half is an HTTP client inside the same
    mapInPandas (per-executor session, iterator pattern — SURVEY §4
    connection amortization); in-sandbox bytes are synthesized
    deterministically from the URL."""
    out_schema = T.StructType(
        imgs.schema.fields
        + [
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("dec_fmt", T.StringType()),
            T.StructField("phash", T.LongType()),
            T.StructField("small", T.BooleanType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            blobs, ws, hs, fmts, phashes, smalls = [], [], [], [], [], []
            for src in pdf[src_col]:
                px, enc_fmt = synth_image_pixels(src)
                blob = IMG.encode_image(px, enc_fmt)
                w, h, fmt, dec = IMG.decode_image(blob)
                blobs.append(blob)
                ws.append(w)
                hs.append(h)
                fmts.append(fmt)
                phashes.append(IMG.phash64(dec))
                smalls.append(IMG.is_small(blob))
            yield pdf.assign(
                bytes=blobs, w=ws, h=hs, dec_fmt=fmts, phash=phashes, small=smalls
            )

    return imgs.mapInPandas(run, out_schema)


def with_rehost_id(imgs: DataFrame, src_col: str = "src") -> DataFrame:
    """X7/X8/K5: deterministic re-host identity — replaces the
    reference's abs(hash(url)) filename + TFS retry-until-legal loop
    with abs(xxhash64(url)) and a computed name; '_L' suffix unless
    small (weixin_public.py:339-343)."""
    iid = F.abs(F.xxhash64(F.col(src_col))).cast("string")
    name = F.concat(
        iid, F.when(F.col("small"), F.lit(".")).otherwise(F.lit("_L.")), F.col("fmt")
    )
    return imgs.withColumn("image_id", iid).withColumn(
        "rehost_url", F.concat(F.lit(TFS_BASE), name)
    )
