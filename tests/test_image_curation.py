"""Image+caption curation queries (round 5, the graft's payload axis):
LAION-style filter gate, SDXL aspect bucketing, and EXIF extraction
through the real binary path. Value parity vs DuckDB is the driver
gate; here we pin rule semantics, boundary behavior, and the
scale-critical plan shapes (zero-shuffle projection, map-side partial
aggregation, no NULL leakage past the format filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_crawler_spark.queries import (
    _ASPECT_NAMES,
    _aspect_bucket_case,
    _image_pairs,
    QUERIES,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ------------------------------------------------------------- semantics


def test_image_caption_filter_keep_is_conjunction_and_selective(spark):
    rows = QUERIES["image_caption_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["size_ok"] and r["ratio_ok"] and r["density_ok"]
            and r["fmt_ok"] and r["caption_ok"]
        )
    # the synthetic corpus must exercise both sides of every rule —
    # a gate that never fires (or always fires) tests nothing
    for flag in ("size_ok", "ratio_ok", "density_ok", "fmt_ok", "caption_ok"):
        vals = {r[flag] for r in rows}
        assert vals == {True, False}, f"{flag} is degenerate: {vals}"


def test_image_caption_filter_caption_stats_match_python(spark):
    """caption_words / alnum_ratio recomputed in plain Python from the
    parquet text for every doc — pins the split/regexp semantics the
    two engines must share."""
    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").collect()}
    out = QUERIES["image_caption_filter"](spark, SF_DIR).collect()
    for r in out:
        text = docs[r["image_id"]]
        words = [w for w in text.split(" ") if w != ""]
        assert r["caption_words"] == len(words)
        if len(text) == 0:
            assert r["alnum_ratio"] == 0.0
        else:
            alnum = sum(1 for c in text if c.isascii() and c.isalnum())
            assert abs(r["alnum_ratio"] - alnum / len(text)) < 5e-5


def test_image_pairs_derivation_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, _image_pairs(docs).drop("caption").collect()))
    b = sorted(map(tuple, _image_pairs(docs).drop("caption").collect()))
    assert a == b
    ws = [r[2] for r in a]
    assert min(ws) >= 16 and max(ws) <= 2048


def test_aspect_bucket_case_boundaries(spark):
    """Known dims land in the right log-space-nearest bucket, including
    exactly-square and the extreme tails."""
    cases = [
        (100, 300, "1:3"),  # 0.333
        (100, 200, "1:2"),  # 0.5
        (3, 4, "3:4"),      # 0.75
        (128, 128, "1:1"),  # 1.0
        (160, 120, "4:3"),  # 1.333
        (200, 100, "2:1"),  # 2.0
        (900, 100, "3:1"),  # 9.0 -> clamps to widest bucket
        (10, 400, "1:3"),   # 0.025 -> clamps to tallest bucket
    ]
    df = spark.createDataFrame(cases, "w int, h int, want string").selectExpr(
        "want", _aspect_bucket_case("CAST(w AS DOUBLE) / h") + " AS got"
    )
    for r in df.collect():
        assert r["got"] == r["want"], r
    # exhaustive: bucket names are exactly the canonical seven
    got = {r["bucket"] for r in QUERIES["aspect_bucket_stats"](spark, SF_DIR).collect()}
    assert got <= set(_ASPECT_NAMES)


def test_aspect_bucket_stats_totals_conserve(spark):
    out = QUERIES["aspect_bucket_stats"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n"] for r in out) == n_docs  # every image bucketed once


def test_image_exif_extract_round_trips_generator_params(spark):
    """66 deterministic JPEGs: every EXIF field non-NULL, orientation
    covers the full 1..8 range (so the upright swap is exercised on
    both branches), and the swap is consistent with the orientation."""
    rows = QUERIES["image_exif_extract"](spark, SF_DIR).collect()
    assert len(rows) == 66
    orients = {r["exif_orientation"] for r in rows}
    assert orients == set(range(1, 9))
    for r in rows:
        assert r["exif_make"] == "SynthCam"
        assert r["exif_model"].startswith("SC-")
        assert r["exif_datetime"].startswith("2020:")
        if r["exif_orientation"] >= 5:
            assert (r["upright_w"], r["upright_h"]) == (r["h"], r["w"])
        else:
            assert (r["upright_w"], r["upright_h"]) == (r["w"], r["h"])


def test_crossmodal_dedup_chains_modalities(spark, tmp_path):
    """A capdup B (identical caption, DIFFERENT sources) and B pixdup C
    (one appended word => simhash Hamming 3, same source) must land in
    ONE cluster even though no single modality links A to C; an
    unrelated doc stays a singleton that keeps itself."""
    base = " ".join(f"tok{i}" for i in range(60))
    rows = [
        (1, base, "en", "s1", len(base)),
        (2, base, "en", "s2", len(base)),          # caption dup of 1, global
        (3, base + " extra", "en", "s2", 0),       # pixel near-dup of 2
        (4, " ".join(f"oth{i}" for i in range(60)), "en", "s1", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in QUERIES["crossmodal_dedup"](spark, str(tmp_path)).collect()
    }
    assert len(got) == 4  # every image gets a verdict
    assert got[1]["cluster"] == got[2]["cluster"] == got[3]["cluster"] == 1
    assert got[1]["keep"] and not got[2]["keep"] and not got[3]["keep"]
    assert got[4]["cluster"] == 4 and got[4]["keep"]


def test_crossmodal_caption_edges_are_star_shaped(spark, tmp_path):
    """k identical captions contribute k-1 edges (to the group min),
    never k^2: all members cluster to the min id directly."""
    text = " ".join(f"boil{i}" for i in range(30))
    rows = [(i, text, "en", f"s{i}", 0) for i in range(10, 20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["cluster"]
        for r in QUERIES["crossmodal_dedup"](spark, str(tmp_path)).collect()
    }
    assert set(got.values()) == {10}


def test_image_features_semantics_on_known_pixels():
    """Hand-built pixels pin each statistic: a flat gray image has
    zero contrast/edges/color; a black-white checkerboard maximizes
    edge fraction; a pure-red image is maximally colorful for a
    constant fill."""
    import numpy as np

    from python_crawler_spark.functions.images import image_features

    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    ml, sl, ef, cf = image_features(flat)
    assert abs(ml - 128.0) < 1e-9 and sl == 0.0 and ef == 0.0 and cf == 0.0

    board = np.zeros((16, 16, 3), dtype=np.uint8)
    board[::2, ::2] = 255
    board[1::2, 1::2] = 255
    _, _, ef_b, _ = image_features(board)
    assert ef_b == 1.0  # every neighbor pair crosses the threshold

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[..., 0] = 200
    _, _, _, cf_r = image_features(red)
    # constant fill: stds are 0, colorfulness = 0.3*sqrt(rg^2+yb^2)
    assert abs(cf_r - 0.3 * (200.0**2 + 100.0**2) ** 0.5) < 1e-9


def test_image_features_png_round_trip_is_exact(spark):
    """The gate's premise: for PNG rows, features computed from bytes
    after encode->Arrow->decode equal features of the generator's raw
    pixels to the last bit (pre-rounding)."""
    from python_crawler_spark.functions.images import image_features
    from python_crawler_spark.operators.multimodal import (
        extract_image_features,
        fetch_and_decode_images,
        synth_image_pixels,
    )

    urls = spark.range(24).selectExpr(
        "concat('http://img.example.invalid/feat/', CAST(id AS STRING), '.bin') AS src"
    )
    out = extract_image_features(fetch_and_decode_images(urls, "src"), "bytes")
    for r in out.filter("dec_fmt = 'png'").collect():
        px, _ = synth_image_pixels(r["src"])
        ml, sl, ef, cf = image_features(px)
        assert (r["mean_lum"], r["std_lum"], r["edge_frac"], r["colorfulness"]) == (
            ml, sl, ef, cf
        )


# ------------------------------------------------------------ plan shapes


def test_image_caption_filter_plan_zero_exchange(spark):
    """The filter gate is a single pass over the corpus: no Exchange,
    no Python stage — pure whole-stage-codegen projection (the shape
    that scans 100 TB once and writes verdicts beside it)."""
    plan = _plan(QUERIES["image_caption_filter"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_aspect_bucket_stats_partial_agg_single_exchange(spark):
    """Rollup on a 7-value key: map-side partial aggregation, exactly
    one hash exchange (7 rows cross the wire per partition), no join."""
    plan = _plan(QUERIES["aspect_bucket_stats"](spark, SF_DIR))
    # formatted mode lists tree nodes as "Name (id)" and repeats them
    # in the details section — count tree entries only
    assert plan.count("Exchange (") == 1
    assert "partial_count" in plan or "Partial" in plan
    assert "Join" not in plan


def test_image_exif_extract_no_shuffle_bytes_stay_put(spark):
    """Metadata extraction never shuffles the binary column: the only
    stages are range -> mapInPandas (fetch/decode) -> mapInPandas
    (EXIF) -> filter/project."""
    plan = _plan(QUERIES["image_exif_extract"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 2  # tree entries only


def test_image_features_extract_no_shuffle(spark):
    plan = _plan(QUERIES["image_features_extract"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 2


def test_thumbnail_dims_never_upscale_and_preserve_aspect():
    """Resize-stage dimension contract: the longer side lands exactly
    on max_side (when downscaling), aspect is preserved to rounding,
    small images pass through untouched, and a degenerate 1-px strip
    never collapses to zero."""
    from python_crawler_spark.functions.images import thumbnail_dims

    assert thumbnail_dims(10, 10, 16) == (10, 10)  # never upscales
    assert thumbnail_dims(32, 16, 16) == (16, 8)
    assert thumbnail_dims(16, 32, 16) == (8, 16)
    th, tw = thumbnail_dims(48, 7, 16)
    assert th == 16 and tw == max(1, round(7 * 16 / 48))
    assert thumbnail_dims(1000, 1, 16) == (16, 1)  # floor at 1


def test_image_resize_png_round_trip_is_exact(spark):
    """The gate's premise: for PNG rows, the thumbnail decoded back
    from the re-encoded bytes equals resize_bilinear of the
    generator's raw pixels bit-for-bit."""
    import numpy as np

    from python_crawler_spark.functions.images import (
        decode_image,
        resize_bilinear,
        thumbnail_dims,
    )
    from python_crawler_spark.operators.multimodal import (
        fetch_and_decode_images,
        resize_images,
        synth_image_pixels,
    )

    urls = spark.range(24).selectExpr(
        "concat('http://img.example.invalid/thumb/', CAST(id AS STRING), '.bin') AS src"
    )
    out = resize_images(
        fetch_and_decode_images(urls, "src").filter("dec_fmt = 'png'"),
        max_side=16,
    )
    rows = out.collect()
    assert rows  # the 24-URL slice must contain PNGs
    for r in rows:
        px, _ = synth_image_pixels(r["src"])
        th, tw = thumbnail_dims(px.shape[0], px.shape[1], 16)
        assert (r["thumb_w"], r["thumb_h"]) == (tw, th)
        _w, _h, fmt, got = decode_image(bytes(r["thumb_bytes"]))
        assert fmt == "png"
        assert np.array_equal(got, resize_bilinear(px, th, tw))


def test_caption_blocklist_word_boundary_and_counts(spark, tmp_path):
    """Whole-word semantics: 'slow fastest' must NOT hit 'slow fast';
    matches are case-insensitive; n_hits counts distinct phrases; the
    testdata-vocabulary phrases give the gate real selectivity."""
    rows = [
        (1, "a SLOW FAST table", "en", "s", 0),        # 1 hit, case-folded
        (2, "the slow fastest row scans", "en", "s", 0),  # boundary: 0 hits
        (3, "slow fast and row scan here", "en", "s", 0),  # 2 distinct hits
        (4, "nothing objectionable", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["image_id"]: (r["n_hits"], r["keep"])
        for r in QUERIES["caption_blocklist_filter"](spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, False)
    assert got[2] == (0, True)
    assert got[3] == (2, False)
    assert got[4] == (0, True)


def test_caption_blocklist_plan_zero_exchange(spark):
    """The phrase list folds into codegen: one projection, no
    Exchange, no Python stage."""
    plan = _plan(QUERIES["caption_blocklist_filter"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exif_gps_scrub_no_shuffle(spark):
    """The privacy scrub is a pure per-blob byte transform: fetch ->
    scrub -> verify-reparse, three Arrow stages, zero Exchange."""
    plan = _plan(QUERIES["exif_gps_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 3


def test_image_resize_extract_no_shuffle(spark):
    """Thumbnailing is the canonical map-only preprocessing stage:
    range -> fetch/decode -> resize -> digest, three Arrow stages,
    zero Exchange."""
    plan = _plan(QUERIES["image_resize_extract"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 3


def test_video_frame_sample_covers_all_containers(spark):
    """The 24-URL corpus must actually hit all four demux paths (a
    hash-cycled corpus that collapsed onto one container would test
    nothing), and every video contributes exactly 3 frames with the
    bytes column dropped."""
    from python_crawler_spark.operators.multimodal import synth_video_blob

    sigs = set()
    for i in range(24):
        b = synth_video_blob(f"http://vid.example.invalid/{i}.bin")
        if b[:4] == b"RIFF":
            sigs.add("avi")
        elif len(b) >= 12 and b[4:8] == b"ftyp":
            sigs.add("mp4")
        elif b[:4] == b"\x1aE\xdf\xa3":
            sigs.add("mkv")
        else:
            sigs.add("pcsv")
    assert sigs == {"avi", "mp4", "mkv", "pcsv"}
    rows = QUERIES["video_frame_sample"](spark, SF_DIR).collect()
    assert len(rows) == 72  # 24 videos x 3 sampled frames
    assert "frame_bytes" not in rows[0].asDict()
    per = {}
    for r in rows:
        per.setdefault(r["src"], []).append(r["frame_idx"])
    assert all(len(v) == 3 and len(set(v)) == 3 for v in per.values())


def test_video_frame_sample_no_shuffle(spark):
    plan = _plan(QUERIES["video_frame_sample"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 2


def test_audio_corpus_covers_all_lossless_containers(spark):
    """The 24-URL audio corpus must hit WAV, FLAC, and PCSA (a
    hash-cycled corpus collapsed onto one container would leave the
    other codecs ungated), and every decode round-trips the
    generator's samples exactly."""
    import numpy as np

    from python_crawler_spark.functions.media import decode_audio
    from python_crawler_spark.operators.multimodal import (
        synth_audio_blob,
        synth_audio_samples,
    )

    sigs = set()
    for i in range(24):
        src = f"http://aud.example.invalid/{i}.bin"
        b = synth_audio_blob(src)
        if b[:4] == b"RIFF":
            sigs.add("wav")
        elif b[:4] == b"fLaC":
            sigs.add("flac")
        else:
            sigs.add("pcsa")
        rate, pcm = decode_audio(b)
        grate, gpcm = synth_audio_samples(src)
        assert rate == grate and np.array_equal(pcm, gpcm)
    assert sigs == {"wav", "flac", "pcsa"}


def test_audio_features_extract_no_shuffle(spark):
    plan = _plan(QUERIES["audio_features_extract"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas (") == 2


# -------------------------------------------------- clip_alignment_filter


def test_clip_alignment_matches_numpy_recompute(spark):
    """Re-derive the codebook keys (md5 mod n) and the cosine in plain
    numpy from the parquet files — pins the key arithmetic and the
    zip_with/aggregate cosine against an independent implementation."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    emb_t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vecs = {
        int(v): np.asarray(e, dtype=np.float64)
        for v, e in zip(emb_t["vec_id"].to_pylist(), emb_t["embedding"].to_pylist())
    }
    nv = len(vecs)

    def key(doc_id: int, salt: str) -> int:
        h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:15]
        return int(h, 16) % nv

    rows = QUERIES["clip_alignment_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        iv, cv = key(r["image_id"], "iemb"), key(r["image_id"], "cemb")
        a, b = vecs[iv], vecs[cv]
        want = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
        assert abs(r["clip_cos"] - want) <= 1e-4, (r["image_id"], r["clip_cos"], want)
        assert r["aligned"] == (r["clip_cos"] >= 0.05)
    # the random-vector corpus must populate both sides of the gate
    assert {r["aligned"] for r in rows} == {True, False}


def test_clip_alignment_plan_no_cartesian_no_forced_codebook_broadcast(spark):
    """The codebook joins are equi-joins with NO forced broadcast hint
    (same cardinality contract as unigram_logprob: AQE broadcasts when
    the table fits, shuffle-joins otherwise); only the 1-row size
    aggregate is deliberately hinted. With auto-broadcast off, any
    remaining BroadcastHashJoin would prove a forced hint."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["clip_alignment_filter"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the hinted 1-row codebook size
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decode_image_malformed_bytes_raise_typed_valueerror():
    """The crawler's decode boundary sees ARBITRARY web bytes: any
    mutation of a valid stream (truncation, byte flips, spliced tails)
    must either still decode or raise decode_image's typed ValueError
    — never leak zlib.error / struct.error / IndexError / KeyError
    from the decoder internals (NotImplementedError stays reserved for
    valid streams hitting a documented library-class seam). Seeded
    fuzz over all three wire formats."""
    import random

    from python_crawler_spark.functions.images import decode_image
    from python_crawler_spark.operators.multimodal import synth_image_blob

    rng = random.Random(7)
    blobs = [synth_image_blob(f"http://x.invalid/{i}.bin") for i in range(12)]
    decoded = failed = 0
    for b in blobs:
        for _ in range(80):
            bb = bytearray(b)
            op = rng.randrange(3)
            if op == 0:
                bb = bb[: rng.randrange(1, len(bb))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    bb[rng.randrange(len(bb))] = rng.randrange(256)
            else:
                bb = bb[: rng.randrange(len(bb))] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(40))
                )
            try:
                decode_image(bytes(bb))
                decoded += 1
            except (ValueError, NotImplementedError):
                failed += 1
    assert failed > 0  # the fuzz actually corrupts
    assert decoded + failed == 12 * 80  # nothing else escaped


def test_extract_image_features_on_error_null_quarantines(spark):
    """on_error='null': a corrupt blob yields NULL feature columns (the
    quarantine predicate is `mean_lum IS NULL`) while valid rows in the
    same batch are unaffected; the default 'raise' mode still fails
    loudly on the same input."""
    import pytest

    from pyspark.sql import types as T

    from python_crawler_spark.functions.images import (
        decode_image,
        image_features,
    )
    from python_crawler_spark.operators.multimodal import (
        extract_image_features,
        synth_image_blob,
    )

    good = synth_image_blob("http://x.invalid/good.bin")
    corrupt = good[:17]  # truncated mid-header
    rows = [("good", bytearray(good)), ("bad", bytearray(corrupt))]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("tag", T.StringType()),
                T.StructField("bytes", T.BinaryType()),
            ]
        ),
    )
    out = {
        r["tag"]: r
        for r in extract_image_features(df, "bytes", on_error="null").collect()
    }
    assert out["bad"]["mean_lum"] is None and out["bad"]["colorfulness"] is None
    _, _, _, px = decode_image(good)
    assert out["good"]["mean_lum"] == image_features(px)[0]
    with pytest.raises(Exception, match="malformed|truncated|signature|stream"):
        extract_image_features(df, "bytes", on_error="raise").collect()


def test_exif_and_resize_on_error_null_quarantine(spark):
    """The other two bytes-column operators share the quarantine
    contract: a JPEG with a corrupt APP1 yields all-NULL EXIF columns
    under on_error='null' (raises by default); a malformed blob yields
    NULL thumb columns from resize_images while the valid row in the
    same batch is untouched."""
    import pytest

    from pyspark.sql import types as T

    from python_crawler_spark.operators.multimodal import (
        extract_image_exif,
        resize_images,
        synth_image_blob,
    )

    jpeg_src = next(
        f"http://x.invalid/{i}.bin"
        for i in range(64)
        if synth_image_blob(f"http://x.invalid/{i}.bin")[:2] == b"\xff\xd8"
    )
    good = synth_image_blob(jpeg_src)
    # corrupt the APP1 payload in place (keep SOI + marker structure)
    app1 = good.find(b"\xff\xe1")
    bad_exif = bytearray(good)
    bad_exif[app1 + 12 : app1 + 20] = b"\x00" * 8  # clobber the TIFF header
    schema = T.StructType(
        [T.StructField("tag", T.StringType()), T.StructField("bytes", T.BinaryType())]
    )
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bad_exif)], schema
    )
    out = {
        r["tag"]: r
        for r in extract_image_exif(df, "bytes", on_error="null").collect()
    }
    assert out["bad"]["exif_make"] is None and out["bad"]["upright_w"] is None
    assert out["good"]["exif_make"] == "SynthCam"
    with pytest.raises(Exception, match="TIFF|EXIF|malformed"):
        extract_image_exif(df, "bytes", on_error="raise").collect()

    df2 = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bytearray(good[:9]))], schema
    )
    out2 = {
        r["tag"]: r for r in resize_images(df2, 16, "bytes", on_error="null").collect()
    }
    assert out2["bad"]["thumb_bytes"] is None and out2["bad"]["thumb_w"] is None
    assert out2["good"]["thumb_w"] is not None
    with pytest.raises(Exception, match="malformed|truncated|signature|stream"):
        resize_images(df2, 16, "bytes", on_error="raise").collect()


def test_fetch_decode_cols_quarantine_helper():
    """The decode half of the fetch stage (split out because the
    in-sandbox synthetic web only produces valid bytes): a valid blob
    yields full decode columns under either mode; a corrupt blob
    raises by default and yields all-NULLs under 'null' (the
    `dec_fmt IS NULL` crawl-round quarantine predicate)."""
    import pytest

    from python_crawler_spark.operators.multimodal import (
        _decode_cols,
        synth_image_blob,
    )

    good = synth_image_blob("http://x.invalid/h.bin")
    w, h, fmt, ph, sm = _decode_cols(good, "raise")
    assert fmt in ("png", "jpeg") and w > 0 and h > 0 and ph is not None
    assert _decode_cols(good, "null") == (w, h, fmt, ph, sm)
    with pytest.raises(ValueError):
        _decode_cols(good[:9], "raise")
    assert _decode_cols(good[:9], "null") == (None,) * 5
