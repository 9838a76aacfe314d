"""PDF catalog lane: minimal spec-correct writer + independent parser.

Document-AI pipelines ingest PDFs by the billion; the first stage is
never text extraction — it's CATALOGING (version, page count, object
census, well-formedness) to route payloads to the right downstream
parser. This module implements that lane the way the other container
formats here do (avi.py, mp4.py, archive.py): a canonical writer built
from the spec, and a parser that reads STRUCTURE tokens rather than
replaying the writer, so round-trip tests adjudicate both against
ISO 32000 and a foreign producer's file still catalogs correctly.

* ``encode_pdf`` — minimal PDF 1.4: header (+binary comment line),
  catalog → pages → N page objects, a correct xref table with byte
  offsets, and a trailer pointing at it. Content streams are one
  text-drawing operator per page.
* ``pdf_catalog`` — header version sniff, ``N 0 obj`` census by
  regex over the raw bytes, ``/Type /Page`` census (with a negative
  lookahead so ``/Pages`` doesn't count), startxref offset check
  against the real ``xref`` token position.

Scale: cataloging is O(bytes scanned) per payload with zero cross-row
state — mapInPandas over binary payloads, the same embarrassingly
parallel shape as mp4.py's box walker; payload bytes never shuffle.
"""

from __future__ import annotations

import re

from ..session import pickle_module_by_value

PDF_VERSION = b"1.4"


def encode_pdf(pages_text: list[bytes]) -> bytes:
    """Serialize one minimal PDF with ``len(pages_text)`` pages."""
    n = len(pages_text)
    if n == 0:
        raise ValueError("a PDF needs at least one page")
    objs: list[bytes] = []
    # 1: catalog, 2: pages, 3..2+n: page objects, 3+n..: content streams
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n)
    for i in range(n):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents %d 0 R >>" % (3 + n + i)
        )
    for text in pages_text:
        stream = b"BT /F1 12 Tf 72 720 Td (" + text.replace(b"(", b"\\(").replace(
            b")", b"\\)"
        ) + b") Tj ET"
        objs.append(
            b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
        )

    out = bytearray()
    out += b"%PDF-" + PDF_VERSION + b"\n%\xe2\xe3\xcf\xd3\n"
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def pdf_catalog(payload: bytes) -> dict:
    """Catalog a PDF payload: version, object/page census, xref check."""
    m = re.match(rb"%PDF-(\d+\.\d+)", payload)
    if not m:
        raise ValueError("not a PDF payload (missing %PDF- header)")
    version = m.group(1).decode("ascii")
    n_objects = len(re.findall(rb"(?m)^\d+ 0 obj\b", payload))
    n_pages = len(re.findall(rb"/Type\s*/Page(?![a-zA-Z])", payload))
    sx = re.search(rb"startxref\s+(\d+)", payload)
    xref_ok = bool(sx) and payload[int(sx.group(1)) :].startswith(b"xref")
    return {
        "version": version,
        "n_objects": n_objects,
        "n_pages": n_pages,
        "xref_ok": xref_ok,
    }


pickle_module_by_value(__name__)
