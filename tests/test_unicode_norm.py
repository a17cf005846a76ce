"""NFC normalization kernel: quick-check fast path, combining
sequences, compatibility codepoints, null handling, DuckDB agreement.
All non-ASCII is written as explicit escapes so no editor/tool can
silently renormalize the fixtures."""

import duckdb
import pyarrow as pa

from cex_crawler_ray.functions.unicode_norm import (
    normalize_column,
    normalize_texts,
)

DECOMPOSED_E = "é"  # e + COMBINING ACUTE
PRECOMPOSED_E = "é"  # LATIN SMALL LETTER E WITH ACUTE
ANGSTROM_SIGN = "Å"  # compat codepoint -> U+00C5
A_RING = "Å"


def test_decomposed_combining_sequence():
    out, changed = normalize_texts([DECOMPOSED_E + "clair"])
    assert out == [PRECOMPOSED_E + "clair"]
    assert changed == [True]


def test_angstrom_compat_codepoint():
    out, changed = normalize_texts(["5 " + ANGSTROM_SIGN])
    assert out == ["5 " + A_RING]
    assert changed == [True]


def test_already_nfc_untouched():
    s = "caf" + PRECOMPOSED_E + " normal ascii text"
    out, changed = normalize_texts([s])
    assert out == [s] and changed == [False]
    assert out[0] is s  # fast path returns the SAME object


def test_null_passthrough():
    out, changed = normalize_texts([None, "x"])
    assert out == [None, "x"]
    assert changed == [False, False]


def test_batch_wrapper_replaces_and_flags():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([DECOMPOSED_E, "plain"], pa.string()),
        }
    )
    out = normalize_column(batch)
    assert out["text"].to_pylist() == [PRECOMPOSED_E, "plain"]
    assert out["nfc_changed"].to_pylist() == [True, False]
    assert out.column_names == ["doc_id", "text", "nfc_changed"]


def test_agrees_with_duckdb_nfc():
    cases = [
        DECOMPOSED_E,
        ANGSTROM_SIGN,
        "caf" + PRECOMPOSED_E,
        "à́mix",  # stacked combining marks
        "ḍ̇",  # dot-below + dot-above: canonical reordering
        "ascii only",
    ]
    con = duckdb.connect()
    for s in cases:
        (dd,) = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()
        (py,), _ = normalize_texts([s])
        assert py == dd, f"divergence on {s!r}"
