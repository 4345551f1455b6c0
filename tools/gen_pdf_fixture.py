#!/usr/bin/env python3
"""Hand-assembled PDF fixtures for the PdfText extractor tests.

Three documents in src/test/resources/pdf/:
- simple_plain.pdf  — one page, uncompressed content stream, Tj/TJ/'
  operators, literal-string escapes and a hex string;
- simple_flate.pdf  — same text, content stream FlateDecode-compressed;
- encrypted.pdf     — trailer carries /Encrypt: the extractor must
  refuse (that path stays with the Unavailable binding's raise).

Assembled byte-by-byte (no PDF library in this environment) with a
correct xref table so external viewers can open them too.
"""
import pathlib
import zlib

OUT = pathlib.Path(__file__).resolve().parent.parent / 'src/test/resources/pdf'

CONTENT = rb"""BT
/F1 12 Tf 72 720 Td
(Hello, PDF world!) Tj
0 -14 Td
[(Split ) (across ) (TJ \(array\))] TJ
0 -14 Td
(Line with escapes: \\ \( \) and octal \101\102\103) Tj
T*
<48657820737472696E67> Tj
(apostrophe advances)'
ET"""


def build(content: bytes, compress: bool, encrypted: bool) -> bytes:
    if compress:
        data = zlib.compress(content)
        filt = b' /Filter /FlateDecode'
    else:
        data = content
        filt = b''
    objs = [
        b'<< /Type /Catalog /Pages 2 0 R >>',
        b'<< /Type /Pages /Kids [3 0 R] /Count 1 >>',
        b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
        b'/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>',
        b'<< /Length %d%s >>\nstream\n%s\nendstream' % (len(data), filt, data),
        b'<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>',
    ]
    out = bytearray(b'%PDF-1.4\n%\xe2\xe3\xcf\xd3\n')
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b'%d 0 obj\n' % i + body + b'\nendobj\n'
    xref_at = len(out)
    out += b'xref\n0 %d\n' % (len(objs) + 1)
    out += b'0000000000 65535 f \n'
    for off in offsets:
        out += b'%010d 00000 n \n' % off
    trailer = b'<< /Size %d /Root 1 0 R' % (len(objs) + 1)
    if encrypted:
        trailer += b' /Encrypt 9 0 R'
    trailer += b' >>'
    out += b'trailer\n' + trailer + b'\nstartxref\n%d\n%%%%EOF\n' % xref_at
    return bytes(out)


def build_two_page(c1: bytes, c2: bytes) -> bytes:
    """Two pages, two Flate content streams — the reference concatenates
    per-page extracts in page order (reader.py:328-332)."""
    d1 = zlib.compress(c1)
    d2 = zlib.compress(c2)
    objs = [
        b'<< /Type /Catalog /Pages 2 0 R >>',
        b'<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>',
        b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
        b'/Contents 5 0 R /Resources << /Font << /F1 7 0 R >> >> >>',
        b'<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] '
        b'/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>',
        b'<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream' % (len(d1), d1),
        b'<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream' % (len(d2), d2),
        b'<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>',
    ]
    out = bytearray(b'%PDF-1.4\n%\xe2\xe3\xcf\xd3\n')
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b'%d 0 obj\n' % i + body + b'\nendobj\n'
    xref_at = len(out)
    out += b'xref\n0 %d\n' % (len(objs) + 1)
    out += b'0000000000 65535 f \n'
    for off in offsets:
        out += b'%010d 00000 n \n' % off
    out += (b'trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n'
            % (len(objs) + 1, xref_at))
    return bytes(out)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / 'simple_plain.pdf').write_bytes(build(CONTENT, False, False))
    (OUT / 'simple_flate.pdf').write_bytes(build(CONTENT, True, False))
    (OUT / 'encrypted.pdf').write_bytes(build(CONTENT, True, True))
    (OUT / 'two_page.pdf').write_bytes(build_two_page(
        b'BT /F1 12 Tf 72 720 Td (Page one text) Tj ET',
        b'BT /F1 12 Tf 72 720 Td (Page two text) Tj ET'))
    for p in sorted(OUT.glob('*.pdf')):
        print(p, p.stat().st_size, 'bytes')


if __name__ == '__main__':
    main()
