"""Charset sniffing + transcoding (functions/charset.py)."""

import pyarrow as pa

from cex_crawler_ray.functions.charset import (
    decode_batch,
    sniff_charset,
)


def test_bom_beats_meta():
    # a UTF-16LE BOM overrides a (stale) meta declaration
    p = b"\xff\xfe" + '<meta charset="utf-8">hi'.encode("utf-16-le")
    assert sniff_charset(p) == "utf-16-le"


def test_meta_forms():
    assert sniff_charset(b'<meta charset="cp1252">x') == "cp1252"
    assert sniff_charset(b"<meta charset=utf-8>x") == "utf-8"
    assert (
        sniff_charset(
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=ISO-8859-1">'
        )
        == "latin-1"
    )
    assert sniff_charset(b"plain bytes") == "utf-8"


def test_meta_outside_prescan_window_ignored():
    p = b" " * 2000 + b'<meta charset="utf-16">'
    assert sniff_charset(p) == "utf-8"


def _decode(payloads):
    tbl = pa.table({"html": pa.array(payloads, pa.binary())})
    out = decode_batch(tbl)
    return out["charset"].to_pylist(), out["text_u8"].to_pylist(), out[
        "bad_bytes"
    ].to_pylist()


def test_roundtrips():
    text = "héllo wörld — 漢字"
    payloads = [
        b"\xef\xbb\xbf" + text.encode("utf-8"),  # BOM'd UTF-8
        b"\xff\xfe" + text.encode("utf-16-le"),
        b"\xfe\xff" + text.encode("utf-16-be"),
        ('<meta charset="utf-8">' + text).encode("utf-8"),
        text.encode("utf-8"),  # bare default
    ]
    cs, txt, bad = _decode(payloads)
    assert cs == ["utf-8-sig", "utf-16-le", "utf-16-be", "utf-8", "utf-8"]
    assert txt[0] == text and txt[1] == text and txt[2] == text
    assert txt[3].endswith(text) and txt[4] == text
    assert bad == [0] * 5


def test_wrong_bytes_flagged():
    # invalid UTF-8 continuation bytes -> replacement chars counted
    cs, txt, bad = _decode([b"ok \xc3\x28 bad"])
    assert cs == ["utf-8"] and bad[0] > 0
