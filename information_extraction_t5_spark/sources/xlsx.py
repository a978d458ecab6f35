"""Dependency-free xlsx writer (stdlib zipfile + XML).

An .xlsx file is a zip of OOXML parts; the minimal readable workbook is
[Content_Types].xml, _rels/.rels, xl/workbook.xml, its rels, and one
worksheet part per sheet.  Strings are written as inline strings
(``t="inlineStr"``), numbers as numeric cells — no sharedStrings or
styles parts needed, and every mainstream reader (Excel, LibreOffice,
pandas/openpyxl, DuckDB's spatial xlsx scanner) accepts the result.

This is the reference-parity Excel sink for environments without
openpyxl (reference: models/qa_model.py:388-436 writes one workbook with
a sheet per document class); sources/report.py routes through it when
openpyxl is absent.  Driver-sized by contract — sheet artifacts are
human reports, not data-path outputs.
"""
from __future__ import annotations

import zipfile
from typing import Dict, Iterable, List, Sequence, Tuple
from xml.sax.saxutils import escape


def col_letter(idx: int) -> str:
    """1-based column index -> A1-style letters (1 -> A, 27 -> AA)."""
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value):  # NaN
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">' \
           f"{text}</t></is></c>"


def _sheet_xml(columns: Sequence[str], rows: Iterable[Sequence]) -> str:
    body: List[str] = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]

    def row_xml(r_idx: int, values: Sequence) -> str:
        cells = "".join(
            _cell_xml(f"{col_letter(c + 1)}{r_idx}", v)
            for c, v in enumerate(values)
        )
        return f'<row r="{r_idx}">{cells}</row>'

    body.append(row_xml(1, list(columns)))
    r = 2
    for row in rows:
        body.append(row_xml(r, row))
        r += 1
    body.append("</sheetData></worksheet>")
    return "".join(body)


def sanitize_sheet_name(name: str, taken: set) -> str:
    """Excel sheet-name rules: <=31 chars, no []:*?/\\ — deduplicated."""
    clean = "".join("_" if c in '[]:*?/\\' else c for c in name)[:31]
    base, n = clean, 1
    while clean in taken:
        suffix = f"~{n}"
        clean = base[: 31 - len(suffix)] + suffix
        n += 1
    taken.add(clean)
    return clean


def write_workbook(
    path: str,
    sheets: Dict[str, Tuple[Sequence[str], Iterable[Sequence]]],
) -> None:
    """Write ``{sheet_name: (columns, rows)}`` as one .xlsx workbook."""
    if not sheets:
        raise ValueError("workbook needs at least one sheet")
    names: List[str] = []
    taken: set = set()
    for raw in sheets:
        names.append(sanitize_sheet_name(str(raw), taken))

    n = len(names)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{escape(nm)}" sheetId="{i + 1}" '
            f'r:id="rId{i + 1}"/>'
            for i, nm in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (raw, (columns, rows)) in enumerate(sheets.items()):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(columns, rows),
            )


def read_workbook(path: str) -> Dict[str, Tuple[List[str], List[list]]]:
    """Stdlib xlsx reader (inline strings + numeric cells + shared
    strings): enough to round-trip ``write_workbook`` output and to
    sanity-read workbooks from other writers in tests."""
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    out: Dict[str, Tuple[List[str], List[list]]] = {}
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{ns}t"))
                      for si in sst.iter(f"{ns}si")]
        sheet_names = [
            s.get("name") for s in wb.iter(f"{ns}sheet")
        ]
        for i, name in enumerate(sheet_names):
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i + 1}.xml"))
            def col_of(ref: str) -> int:
                """A1-style ref -> 0-based column (None cells are SKIPPED
                by the writer, so position must come from the ref)."""
                n = 0
                for ch in ref:
                    if ch.isalpha():
                        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
                    else:
                        break
                return n - 1

            rows: List[list] = []
            for row in root.iter(f"{ns}row"):
                vals: list = []
                for c in row.iter(f"{ns}c"):
                    idx = col_of(c.get("r", ""))
                    if idx < 0:
                        idx = len(vals)
                    while len(vals) <= idx:
                        vals.append(None)
                    t = c.get("t")
                    if t == "inlineStr":
                        vals[idx] = "".join(
                            el.text or "" for el in c.iter(f"{ns}t")
                        )
                    elif t == "s":
                        v = c.find(f"{ns}v")
                        vals[idx] = (shared[int(v.text)]
                                     if v is not None else None)
                    elif t == "b":
                        v = c.find(f"{ns}v")
                        vals[idx] = (bool(int(v.text))
                                     if v is not None else None)
                    else:
                        v = c.find(f"{ns}v")
                        if v is not None:
                            num = float(v.text)
                            vals[idx] = (int(num) if num == int(num)
                                         else num)
                rows.append(vals)
            cols = [str(x) if x is not None else "" for x in rows[0]] \
                if rows else []
            body = [r + [None] * (len(cols) - len(r)) for r in rows[1:]]
            out[name] = (cols, body)
    return out
