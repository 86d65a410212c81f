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


def test_zip_roundtrip_interchange_and_refusals():
    """ZIP archives (r16): our spec-written encoder's output reads
    through CPython's independent zipfile (names, contents, comment,
    CRC audit), zipfile-written archives read through our central-
    directory walker, the EOCD tail scan survives a comment carrying
    the EOCD signature bytes, and encrypted/ZIP64/corrupt archives
    refuse by name."""
    import io
    import struct
    import zipfile

    import pytest

    from amazonredshift_blueprints_spark.operators.warc import (
        encode_zip,
        parse_zip,
    )

    members = [
        ("a.txt", b"hello world", 0),
        ("dir/b.bin", bytes(range(256)) * 40, 8),
        ("empty.txt", b"", 0),
    ]
    enc = encode_zip(members, comment=b"release notes")
    zf = zipfile.ZipFile(io.BytesIO(enc))
    assert zf.namelist() == [n for n, _, _ in members]
    for n, data, _ in members:
        assert zf.read(n) == data
    assert zf.comment == b"release notes" and zf.testzip() is None
    # zipfile -> ours
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("s.txt", b"stored", compress_type=zipfile.ZIP_STORED)
        z.writestr("d.txt", b"deflate me " * 50,
                   compress_type=zipfile.ZIP_DEFLATED)
    got = parse_zip(buf.getvalue())
    assert [(m["name"], m["data"]) for m in got] == [
        ("s.txt", b"stored"), ("d.txt", b"deflate me " * 50)]
    assert [m["method"] for m in got] == [0, 8]
    # a comment containing the EOCD signature must not derail the scan
    tricky = encode_zip([("x.txt", b"data", 0)],
                        comment=b"see PK\x05\x06 marker docs")
    assert parse_zip(tricky)[0]["data"] == b"data"
    # refusals
    enc2 = bytearray(encode_zip([("e.txt", b"secret", 0)]))
    cd = enc2.find(b"PK\x01\x02")
    enc2[cd + 8] |= 1  # central-directory general-purpose bit 0
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_zip(bytes(enc2))
    enc3 = bytearray(encode_zip([("f.txt", b"x", 0)]))
    eo = enc3.rfind(b"PK\x05\x06")
    enc3[eo + 16:eo + 20] = b"\xff\xff\xff\xff"  # cd_offset sentinel
    with pytest.raises(NotImplementedError, match="ZIP64"):
        parse_zip(bytes(enc3))
    enc4 = bytearray(encode_zip([("g.txt", b"payload bytes", 0)]))
    data_at = enc4.find(b"payload bytes")
    enc4[data_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_zip(bytes(enc4))
    with pytest.raises(ValueError, match="no end-of-central"):
        parse_zip(b"not a zip at all")
    with pytest.raises(NotImplementedError, match="method 12"):
        enc5 = bytearray(encode_zip([("h.txt", b"q", 0)]))
        cd5 = enc5.find(b"PK\x01\x02")
        enc5[cd5 + 10] = 12  # bzip2 method in the central entry
        parse_zip(bytes(enc5))


def test_parse_cdxj_jvm_side(spark):
    """CDXJ index lines (r16): SURT + timestamp + JSON split with
    limit 3 (JSON may contain spaces), coordinates cast to BIGINT,
    no Python stage in the plan."""
    from amazonredshift_blueprints_spark.operators.warc import parse_cdxj

    line = (
        "com,example)/path/page 20260816120000 "
        '{"url":"https://example.com/path/page","mime":"text/html",'
        '"status":"200","digest":"sha1:ABC","length":"1234",'
        '"offset":"98765","filename":"crawl-0.warc.gz",'
        '"note":"has spaces here"}'
    )
    df = spark.createDataFrame([(line,)], "line string")
    out = parse_cdxj(df)
    r = out.collect()[0]
    assert r["surt"] == "com,example)/path/page"
    assert r["capture_ts"] == "20260816120000"
    assert r["url"] == "https://example.com/path/page"
    assert (r["mime"], r["status"]) == ("text/html", "200")
    assert (r["length"], r["offset"]) == (1234, 98765)
    assert r["filename"] == "crawl-0.warc.gz"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
