"""EXIF/TIFF codec (functions/exif.py) and the extract_image_exif
operator: build->parse round trips in both byte orders, JPEG APP1
splice/extract, the 8-orientation algebra, fail-loud malformed input,
and the Spark mapInPandas extraction over synthetic-web blobs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from python_crawler_spark.functions import exif as E
from python_crawler_spark.functions import jpeg as J
from python_crawler_spark.functions.hashing import xxhash64
from python_crawler_spark.operators.multimodal import (
    extract_image_exif,
    fetch_and_decode_images,
    synth_image_blob,
)

FIELDS = {
    "Make": "SynthCam",
    "Model": "SC-7",
    "Orientation": 6,
    "DateTime": "2020:01:02 03:04:05",
    "Exif": {
        "DateTimeOriginal": "2020:01:02 03:04:05",
        "PixelXDimension": 640,
        "PixelYDimension": 480,
        "FNumber": (28, 10),
        "ISOSpeedRatings": 200,
    },
}


@pytest.mark.parametrize("bo", ["<", ">"])
def test_build_parse_round_trip(bo):
    got = E.parse_exif(E.build_exif(FIELDS, bo))
    assert got["Make"] == "SynthCam" and got["Model"] == "SC-7"
    assert got["Orientation"] == 6
    assert got["Exif"]["PixelXDimension"] == 640
    assert got["Exif"]["PixelYDimension"] == 480
    assert got["Exif"]["FNumber"] == (28, 10)  # RATIONAL survives
    assert got["Exif"]["ISOSpeedRatings"] == 200


def test_inline_vs_offset_values():
    """Values <= 4 bytes are inline in the IFD entry; longer ones live
    in the heap behind an offset — both must parse identically."""
    short = E.parse_exif(E.build_exif({"Make": "abc"}))  # 4 bytes with NUL: inline
    long = E.parse_exif(E.build_exif({"Make": "a much longer camera make"}))
    assert short["Make"] == "abc"
    assert long["Make"] == "a much longer camera make"


def test_jpeg_splice_and_extract_preserves_decode():
    px = np.random.RandomState(7).randint(0, 256, (16, 24, 3)).astype(np.uint8)
    jb = J.encode_jpeg(px)
    assert E.extract_exif_jpeg(jb) is None
    jb2 = E.insert_exif_jpeg(jb, E.build_exif(FIELDS))
    tiff = E.extract_exif_jpeg(jb2)
    assert E.parse_exif(tiff)["Model"] == "SC-7"
    # the spliced segment must not perturb the image stream
    _, _, _, dec = J.decode_jpeg(jb)
    w, h, _, dec2 = J.decode_jpeg(jb2)
    assert (w, h) == (24, 16) and (dec == dec2).all()


def test_orientation_algebra():
    a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert E.apply_orientation(a, 1) is a
    for o in (2, 3, 4, 5, 7):  # self-inverse transforms
        assert (E.apply_orientation(E.apply_orientation(a, o), o) == a).all()
    # 90 CW and 90 CCW are mutual inverses and swap the axes
    assert (E.apply_orientation(E.apply_orientation(a, 6), 8) == a).all()
    assert E.apply_orientation(a, 6).shape == (3, 2, 3)
    with pytest.raises(ValueError):
        E.apply_orientation(a, 9)


def test_malformed_streams_fail_loud():
    with pytest.raises(ValueError):
        E.parse_exif(b"XX" + b"\x00" * 10)  # bad byte-order mark
    with pytest.raises(ValueError):
        E.parse_exif(b"II\x2b\x00\x08\x00\x00\x00")  # magic != 42
    oob = bytearray(E.build_exif(FIELDS))
    struct.pack_into("<I", oob, 4, 99999)  # IFD0 offset out of bounds
    with pytest.raises(ValueError):
        E.parse_exif(bytes(oob))
    # IFD cycle: IFD0's next-IFD pointer back to itself
    cyc = bytearray(E.build_exif({"Make": "x"}))
    (n,) = struct.unpack_from("<H", cyc, 8)
    struct.pack_into("<I", cyc, 8 + 2 + 12 * n, 8)
    with pytest.raises(ValueError):
        E.parse_exif(bytes(cyc))


def test_synth_blob_exif_is_deterministic_and_jpeg_only():
    jpeg_src = png_src = None
    for i in range(40):
        src = f"http://mmbiz.qpic.cn/mmbiz/SIG{i}/640"
        h = xxhash64(src) & 0x7FFFFFFFFFFFFFFF
        if h % 3 == 0 and jpeg_src is None:
            jpeg_src = src
        if h % 3 != 0 and png_src is None:
            png_src = src
    b1, b2 = synth_image_blob(jpeg_src), synth_image_blob(jpeg_src)
    assert b1 == b2  # pure function of the URL
    meta = E.parse_exif(E.extract_exif_jpeg(b1))
    assert meta["Make"] == "SynthCam" and 1 <= meta["Orientation"] <= 8
    assert synth_image_blob(png_src)[:8] == b"\x89PNG\r\n\x1a\n"


def test_extract_image_exif_operator(spark):
    srcs = [(f"http://mmbiz.qpic.cn/mmbiz/OP{i}/640",) for i in range(30)]
    df = fetch_and_decode_images(spark.createDataFrame(srcs, "src string"))
    out = extract_image_exif(df).collect()
    jpegs = [r for r in out if r["dec_fmt"] == "jpeg"]
    others = [r for r in out if r["dec_fmt"] != "jpeg"]
    assert jpegs and others  # the synthetic web serves a format mix
    for r in jpegs:
        assert r["exif_make"] == "SynthCam"
        assert 1 <= r["exif_orientation"] <= 8
        assert r["exif_datetime"].startswith("2020:")
        # upright dims: EXIF pixel dims with axes swapped for 5-8
        if r["exif_orientation"] >= 5:
            assert (r["upright_w"], r["upright_h"]) == (r["h"], r["w"])
        else:
            assert (r["upright_w"], r["upright_h"]) == (r["w"], r["h"])
    for r in others:
        assert r["exif_make"] is None and r["exif_orientation"] is None


# ------------------------------------------------------------ property fuzz

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ascii = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
    )
    _value = st.one_of(
        _ascii,
        st.integers(min_value=0, max_value=2**32 - 1),
        st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=1, max_value=2**32 - 1),
        ),
        st.binary(max_size=24),
    )
    _tags = st.sampled_from(
        ["Make", "Model", "Software", "ImageDescription", "DateTime"]
    )

    @settings(max_examples=60, deadline=None)
    @given(
        fields=st.dictionaries(_tags, _value, min_size=1, max_size=5),
        sub=st.dictionaries(
            st.sampled_from(["DateTimeOriginal", "PixelXDimension", "FNumber"]),
            _value,
            max_size=3,
        ),
        bo=st.sampled_from(["<", ">"]),
    )
    def test_exif_round_trip_property(fields, sub, bo):
        """Any field dict the builder accepts must parse back to the
        same values under either byte order — ints may widen
        SHORT->LONG but never change value."""
        f = dict(fields)
        if sub:
            f["Exif"] = sub
        got = E.parse_exif(E.build_exif(f, bo))
        for k, v in fields.items():
            assert got[k] == v, (k, v, got.get(k))
        for k, v in sub.items():
            assert got["Exif"][k] == v

    @settings(max_examples=80, deadline=None)
    @given(data=st.binary(min_size=0, max_size=120))
    def test_exif_parser_never_hangs_or_crashes_unguarded(data):
        """Arbitrary bytes either parse or raise ValueError/struct.error
        — never an unbounded loop or an uncontrolled exception type."""
        try:
            E.parse_exif(b"II\x2a\x00" + data)
        except (ValueError, struct.error):
            pass

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
