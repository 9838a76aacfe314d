"""PDF writer/parser tests: the parser is adjudicated against
hand-assembled spec bytes (independent of the writer), and the writer's
xref offsets are byte-verified."""

from __future__ import annotations

import re

import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.pdf import (
    encode_pdf,
    pdf_catalog,
)


def test_roundtrip_census():
    pdf = encode_pdf([b"hello", b"world", b"three"])
    meta = pdf_catalog(pdf)
    assert meta == {
        "version": "1.4",
        "n_objects": 2 + 2 * 3,
        "n_pages": 3,
        "xref_ok": True,
    }


def test_parser_on_hand_assembled_foreign_pdf():
    """A minimal PDF written by hand (different layout conventions:
    no binary comment, 1.7, whitespace variations) must catalog
    correctly — the parser reads the spec, not our writer."""
    body = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type  /Page /Parent 2 0 R >>\nendobj\n"
    )
    xref_at = len(body)
    pdf = body + b"xref\n0 4\n" + b"trailer\n<< /Size 4 /Root 1 0 R >>\n" + (
        b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    meta = pdf_catalog(pdf)
    assert meta["version"] == "1.7"
    assert meta["n_objects"] == 3
    assert meta["n_pages"] == 1  # /Pages must NOT count
    assert meta["xref_ok"] is True


def test_xref_offsets_are_byte_exact():
    pdf = encode_pdf([b"x"])
    # parse the xref table back and check each offset lands on "N 0 obj"
    sx = re.search(rb"startxref\s+(\d+)", pdf)
    table = pdf[int(sx.group(1)) :]
    lines = table.splitlines()[2:]  # skip 'xref' and '0 N'
    offsets = [int(l[:10]) for l in lines[1:] if l[17:18] == b"n"]
    for i, off in enumerate(offsets, start=1):
        assert pdf[off:].startswith(b"%d 0 obj" % i), (i, off)


def test_escaped_parentheses_and_rejects():
    meta = pdf_catalog(encode_pdf([b"a(b)c"]))
    assert meta["n_pages"] == 1
    with pytest.raises(ValueError, match="at least one page"):
        encode_pdf([])
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_catalog(b"GIF89a...")
