"""Multimodal payload-axis throughput bench (round 5).

BENCH_r* times the frontier scheduler and BENCH/bench_crawl.py times
the crawl engine; this bench times the PAYLOAD path — the Arrow-batched
binary-column operators a 100-TB image+caption corpus runs per row:

  images: synth fetch -> real PNG/JPEG (incl. progressive/interlaced)
          decode -> phash -> visual features (mean/std luminance, edge
          fraction, colorfulness) -> EXIF parse
  resize: fetch -> decode -> bilinear thumbnail -> PNG re-encode
  scrub:  geotagged JPEG fetch -> EXIF parse -> GPS strip -> rebuild
          -> re-splice (the privacy stage)
  video:  synth mux (AVI/MP4/MKV/PCSV by hash) -> lazy demux ->
          3-frame sample -> MJPEG/PNG frame decode
  audio:  synth WAV/FLAC/PCSA -> lossless decode -> PCM features

Every stage is mapInPandas with zero Exchange (plan-asserted in
tests/test_image_curation.py), so throughput scales with partitions —
the per-core rows/s here multiplies by executor count on a cluster.

Numbers are CONSERVATIVE: the sandbox substitutes a deterministic
synth for the HTTP fetch, and the synth ENCODES each blob (PNG/JPEG/
container mux) inside the measured stage — production replaces that
encode with a network read. image_full_extract additionally decodes
twice (features + EXIF read the bytes column independently).

Usage:
    python BENCH/bench_multimodal.py [n_images] [reps]

Writes BENCH/multimodal.json and prints one JSON line. Median of
`reps` (default 3) per stage; per-rep wall times retained so a
contended rep is attributable (shared-host discipline from
bench_crawl).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_crawler_spark.operators.multimodal import (  # noqa: E402
    extract_audio_features,
    extract_image_exif,
    extract_image_features,
    fetch_and_decode_images,
    fetch_and_decode_videos,
    fetch_audio,
    resize_images,
    sample_video_frames,
    scrub_exif_gps,
    synth_geotagged_blob,
)
from python_crawler_spark.session import get_spark  # noqa: E402


def _urls(spark, n: int, prefix: str):
    return spark.range(n).selectExpr(
        f"concat('http://{prefix}.example.invalid/bench/', CAST(id AS STRING), '.bin') AS src"
    )


def _timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _geotagged(spark, n: int):
    from pyspark.sql import types as T

    urls = _urls(spark, n, "gps")
    schema = T.StructType(
        urls.schema.fields + [T.StructField("bytes", T.BinaryType())]
    )

    def fetch(batches):
        for pdf in batches:
            yield pdf.assign(bytes=[synth_geotagged_blob(s) for s in pdf["src"]])

    return urls.mapInPandas(fetch, schema)


def run(spark, n_images: int, reps: int) -> dict:
    n_videos = max(8, n_images // 10)
    n_audio = max(8, n_images // 10)
    stages = {
        "image_decode_phash": lambda: fetch_and_decode_images(
            _urls(spark, n_images, "img"), "src"
        ).drop("bytes"),
        "image_full_extract": lambda: extract_image_exif(
            extract_image_features(
                fetch_and_decode_images(_urls(spark, n_images, "img"), "src")
            )
        ).drop("bytes"),
        "image_resize": lambda: resize_images(
            fetch_and_decode_images(_urls(spark, n_images, "img"), "src")
        ).drop("bytes", "thumb_bytes"),
        "exif_gps_scrub": lambda: scrub_exif_gps(
            _geotagged(spark, n_images), "bytes"
        ).drop("bytes", "scrubbed_bytes"),
        "video_frame_sample": lambda: sample_video_frames(
            fetch_and_decode_videos(_urls(spark, n_videos, "vid"), "src"), n_samples=3
        ).drop("frame_bytes"),
        "audio_features": lambda: extract_audio_features(
            fetch_audio(_urls(spark, n_audio, "aud"), "src"), "audio_bytes"
        ).drop("audio_bytes"),
    }
    rows_per_stage = {
        "image_decode_phash": n_images,
        "image_full_extract": n_images,
        "image_resize": n_images,
        "exif_gps_scrub": n_images,
        "video_frame_sample": n_videos,
        "audio_features": n_audio,
    }
    out: dict = {"n_images": n_images, "n_videos": n_videos, "n_audio": n_audio}
    # total decoded payload bytes once, for the MB/s figure
    out["image_bytes"] = int(
        fetch_and_decode_images(_urls(spark, n_images, "img"), "src")
        .agg(F.sum(F.length("bytes")))
        .first()[0]
    )
    for name, build in stages.items():
        walls = [_timed(build()) for _ in range(reps)]
        med = statistics.median(walls)
        out[name] = {
            "reps_s": [round(w, 3) for w in walls],
            "median_s": round(med, 3),
            "rows_per_s": round(rows_per_stage[name] / med, 1),
        }
    out["image_mb_per_s"] = round(
        out["image_bytes"] / 1e6 / out["image_decode_phash"]["median_s"], 2
    )
    return out


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    res = run(spark, n_images, reps)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multimodal.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
