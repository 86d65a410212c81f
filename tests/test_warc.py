"""WARC ingestion containers (operators/warc.py, r16): spec framing,
multi-member gzip packaging, HTTP-response splitting, WET-style
extraction, and named refusals on every framing violation.

Reference basis: the reference ingests flat CSV (upload_file.py:118);
the container layer is the training-pipeline extension SURVEY §2 Part
C tracks — Common Crawl corpora arrive as .warc.gz.
"""

from __future__ import annotations

import gzip

import pytest

from amazonredshift_blueprints_spark.operators.warc import (
    encode_warc,
    extract_warc_text,
    http_response_body,
    parse_warc,
)

RECS = [
    {"type": "warcinfo", "content": b"software: test"},
    {"type": "conversion", "uri": "http://e/1", "content": b"hello world"},
    {
        "type": "response",
        "uri": "http://e/2",
        "content": b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody text here",
    },
    {"type": "metadata", "content": b"fetch-ms: 7"},
]


def test_roundtrip_plain_and_gzip_members():
    for gz in (False, True):
        out = parse_warc(encode_warc(RECS, gzip_members=gz))
        assert [r["type"] for r in out] == [
            "warcinfo", "conversion", "response", "metadata",
        ]
        assert out[1]["content"] == b"hello world"
        assert out[1]["uri"] == "http://e/1"
        assert out[2]["headers"]["content-length"] == str(
            len(RECS[2]["content"])
        )
    # gzip members concatenate into exactly the plain framing — pinned
    # against CPython's own multi-member gzip reader (independent
    # member handling)
    assert gzip.decompress(encode_warc(RECS, gzip_members=True)) == (
        encode_warc(RECS)
    )


def test_wet_extraction_and_http_split():
    texts = extract_warc_text(encode_warc(RECS))
    # bookkeeping records (warcinfo/metadata) are skipped
    assert texts == [
        ("conversion", "hello world"),
        ("response", "body text here"),
    ]
    with pytest.raises(ValueError, match="does not carry HTTP"):
        http_response_body(b"not http")
    with pytest.raises(ValueError, match="no header terminator"):
        http_response_body(b"HTTP/1.1 200 OK\r\nX: y\r\n")


def test_framing_violations_refuse_by_name():
    plain = encode_warc(RECS)
    with pytest.raises(ValueError, match="not terminated by CRLFCRLF"):
        parse_warc(plain[:-3])
    with pytest.raises(ValueError, match="not a WARC/ version line"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="truncated gzip member"):
        parse_warc(encode_warc(RECS, gzip_members=True)[:-5])
    # a record body whose declared length overruns the terminator
    broken = plain.replace(b"Content-Length: 11", b"Content-Length: 13", 1)
    with pytest.raises(ValueError, match="CRLFCRLF|Content-Length"):
        parse_warc(broken)
    with pytest.raises(ValueError, match="malformed header line"):
        parse_warc(b"WARC/1.0\r\nnocolonhere\r\n\r\n\r\n\r\n")


def test_webdataset_roundtrip_and_contiguity():
    """WebDataset tar shards (r16): first-dot key grouping, all three
    modalities round-trip, and the contiguity contract refuses
    interleaved samples by name."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
    )
    from amazonredshift_blueprints_spark.operators.warc import (
        encode_webdataset,
        parse_webdataset,
    )

    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    samples = [
        {"__key__": "000-0", "cls": b"3", "txt": b"a b c",
         "png": encode_png_gray(px)},
        # a multi-dot extension stays WITH the extension (seg.png)
        {"__key__": "000-1", "cls": b"7", "seg.png": b"fake"},
    ]
    out = parse_webdataset(encode_webdataset(samples))
    assert [s["__key__"] for s in out] == ["000-0", "000-1"]
    assert out[0]["cls"] == b"3" and out[0]["txt"] == b"a b c"
    assert (decode_png(out[0]["png"])[:, :, 0] == px).all()
    assert out[1]["seg.png"] == b"fake"

    # interleaved members of one sample after another key: refused
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [
            ("k1.cls", b"1"), ("k2.cls", b"2"), ("k1.txt", b"late"),
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not contiguous"):
        parse_webdataset(buf.getvalue())
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w") as tf:
        info = tarfile.TarInfo(name="noext")
        info.size = 1
        tf.addfile(info, io.BytesIO(b"y"))
    with _pytest.raises(ValueError, match="no extension"):
        parse_webdataset(buf2.getvalue())
