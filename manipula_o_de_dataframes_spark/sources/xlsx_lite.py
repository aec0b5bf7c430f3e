"""Minimal xlsx codec — stdlib only (zipfile + ElementTree).

xlsx is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML, a
public format). This implements exactly the subset the reference
exercises — named sheets, header-row selection, string and numeric
cells — so the Excel edge adapter (sources.io.read_excel /
write_excel; reference AP:12, APC:37/150, MAC:149-158, AP:110-114)
works even in a container without openpyxl. pandas+openpyxl remains
the preferred path when installed; this is the fallback.

Scope (deliberate): cell types n (number), s (shared string),
inlineStr, str (formula cache), b (boolean). No styles, no formulas,
no dates-as-serials (the reference's date columns are parsed from
strings downstream). Cells must carry an ``r`` reference attribute —
every mainstream writer (openpyxl, pandas, Excel itself, and this
module) emits one.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'BC23' → 54 (0-based column index from an A1-style reference)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _col_letters(idx: int) -> str:
    """0-based column index → 'A', ..., 'Z', 'AA', ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def sheet_names(path: str) -> list[str]:
    """Workbook sheet names, in workbook order."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def read_rows(path: str, sheet_name: str | int = 0) -> list[list]:
    """Read one sheet as a list of rows (ragged rows padded with None).

    ``sheet_name`` is a name or a 0-based position, matching
    pd.read_excel's sheet_name parameter (APC:150 selects by name).
    """
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = [(s.get("name"), s.get(f"{_REL}id")) for s in wb.iter(f"{_NS}sheet")]
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{_PKG_REL}Relationship")
        }
        if isinstance(sheet_name, int):
            if not -len(sheets) <= sheet_name < len(sheets):
                raise KeyError(f"sheet index {sheet_name} out of range ({len(sheets)} sheets)")
            _, rid = sheets[sheet_name]
        else:
            by_name = {n: rid for n, rid in sheets}
            if sheet_name not in by_name:
                raise KeyError(f"sheet {sheet_name!r} not in {sorted(by_name)}")
            rid = by_name[sheet_name]
        target = targets[rid].lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                for si in sst.iter(f"{_NS}si")
            ]

        ws = ET.fromstring(z.read(target))
        rows: list[list] = []
        for row in ws.iter(f"{_NS}row"):
            vals: dict[int, object] = {}
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                if ref is None:
                    raise ValueError("cell without an r= reference (unsupported writer)")
                ci = _col_index(ref)
                t = c.get("t", "n")
                if t == "inlineStr":
                    vals[ci] = "".join(tt.text or "" for tt in c.iter(f"{_NS}t"))
                    continue
                ve = c.find(f"{_NS}v")
                if ve is None or ve.text is None:
                    continue
                if t == "s":
                    vals[ci] = shared[int(ve.text)]
                elif t == "b":
                    vals[ci] = ve.text == "1"
                elif t == "str":
                    vals[ci] = ve.text
                else:  # "n"
                    vals[ci] = float(ve.text)
            width = max(vals) + 1 if vals else 0
            rows.append([vals.get(i) for i in range(width)])
    return rows


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_sheets(path: str, sheets: dict[str, list[list]]) -> str:
    """Write {sheet_name: rows} as an xlsx. Strings go inline (no
    sharedStrings part), numbers as numeric cells — readable by Excel,
    pandas/openpyxl, and read_rows above."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            # quoteattr: attribute context — escape() leaves '"' alone,
            # which would break names containing quotes
            f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        wb_rels = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{wb_rels}</Relationships>",
        )
        for i, name in enumerate(names):
            body = []
            for ri, row in enumerate(sheets[name]):
                cells = "".join(
                    _cell_xml(f"{_col_letters(ci)}{ri + 1}", v) for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri + 1}">{cells}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(body)}</sheetData></worksheet>",
            )
    return path


def cell_str(v) -> str | None:
    """Render a mixed-type cell for a string column (integral floats
    drop the '.0', matching how the reference's IDs display)."""
    if v is None:
        return None
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def infer_table(rows: list[list], header: int):
    """Shared header/width/type inference for the stdlib xlsx path:
    returns (column names, Spark types, padded data rows). Width is
    the max over header AND data rows — a sheet whose data rows extend
    past the header surfaces the extra cells as 'Unnamed: i' columns
    (what pandas+openpyxl does), not silently dropped.

    Lives HERE (not sources.io) so the distributed reader's executor
    closure can be pickled BY VALUE with this module alone — a
    foreign-cwd driver (the external harness) has no repo on the
    worker sys.path, so any by-reference module pickle fails to
    import there. The pyspark import is function-local: workers ship
    pyspark, this module stays stdlib-importable.
    """
    from pyspark.sql.types import (  # noqa: PLC0415
        BooleanType,
        DoubleType,
        StringType,
    )

    if header >= len(rows):
        raise ValueError(f"header row {header} beyond sheet ({len(rows)} rows)")
    width = max(len(r) for r in rows[header:])
    cols = [
        cell_str(c) if c is not None else f"Unnamed: {i}"
        for i, c in enumerate((rows[header] + [None] * width)[:width])
    ]
    data = [(r + [None] * width)[:width] for r in rows[header + 1 :]]

    def _col_type(ci: int):
        nn = [r[ci] for r in data if r[ci] is not None]
        if nn and all(isinstance(v, bool) for v in nn):
            # keep real booleans — the pandas+openpyxl path yields a
            # bool column, the two engines must agree on schema
            return BooleanType()
        if nn and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in nn):
            return DoubleType()
        return StringType()

    return cols, [_col_type(ci) for ci in range(width)], data


def coerce_cell(v, t):
    from pyspark.sql.types import BooleanType, DoubleType  # noqa: PLC0415

    if v is None:
        return None
    if isinstance(t, BooleanType):
        return bool(v)
    if isinstance(t, DoubleType):
        return float(v)
    return cell_str(v)
