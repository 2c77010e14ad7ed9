"""Minimal XLSX ingestion (S2) — stdlib zip + XML, no Excel library.

The reference loads its template/registry workbooks with pandas.read_excel
(/root/reference/File_Submission_Object.py:81,151); this container has no
Excel engine, so round 3 mapped S2 to driver-built broadcast dims. This
module closes the remaining gap natively: an .xlsx file is a ZIP of
SpreadsheetML XML parts (ECMA-376, public), so `zipfile` + `ElementTree`
read it without any dependency.

Scope and scale: template/registry workbooks are DIMENSION tables (the
reference's are a few hundred rows), so parsing happens driver-side and the
result is a small DataFrame the rule compiler broadcast-joins — the same
shape as every other dictionary dim (plans/compile.py C11 staging). A
multi-GB fact table in xlsx would be the wrong storage for this engine
(single-threaded decompression, no predicate pushdown, no splits); the
loader refuses past a row cap rather than silently serializing a big scan
through the driver.

Supported: shared strings, inline strings, numbers, booleans, formula
cached values, sparse rows (A1 cell references), multiple sheets by name or
index. Out of scope: styles/date *formatting* (date cells surface as their
raw serial numbers — the cast lattice (functions/casts.py) owns typed
views, mirroring the reference's convert_data_type pass), encrypted
workbooks, xlsb.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

MAX_DRIVER_ROWS = 200_000  # dim-table guard: xlsx is not a fact-table format


def _col_index(cell_ref: str) -> int:
    """'C7' -> 2 (0-based column index from an A1 reference)."""
    idx = 0
    for ch in cell_ref:
        if ch.isdigit():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # a shared string may be one <t> or multiple rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip_path)] in workbook order, resolved via the
    workbook relationships part (sheet order in workbook.xml is the user-
    visible order; r:id -> target path)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        rel.attrib["Id"]: rel.attrib["Target"]
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    out = []
    for sheet in wb.iter(f"{_NS}sheet"):
        target = target_by_id[sheet.attrib[f"{_REL_NS}id"]]
        path = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
        out.append((sheet.attrib["name"], path))
    return out


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    """Cell -> string value (the engine's rules see a string view of every
    cell anyway — the reference loads with na_filter=False and coerces
    types afterwards; functions/casts.py is that coercion here)."""
    t = cell.attrib.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # n (number, incl. date serials), str (formula cached string), e (error)
    return v.text


def read_xlsx_rows(path: str, sheet: str | int = 0) -> Iterator[list[str | None]]:
    """Yield rows (lists of string-or-None cells, padded to the widest seen
    column) from one sheet of an .xlsx workbook. Pure stdlib."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheets = _sheet_paths(zf)
        if isinstance(sheet, int):
            name, sheet_path = sheets[sheet]
        else:
            matches = [(n, p) for n, p in sheets if n == sheet]
            if not matches:
                raise ValueError(
                    f"sheet {sheet!r} not in workbook (has {[n for n, _ in sheets]})"
                )
            name, sheet_path = matches[0]
        root = ET.fromstring(zf.read(sheet_path))
        n_rows = 0
        for row in root.iter(f"{_NS}row"):
            cells: list[str | None] = []
            for cell in row.iter(f"{_NS}c"):
                ref = cell.attrib.get("r", "")
                ci = _col_index(ref) if ref else len(cells)
                while len(cells) <= ci:
                    cells.append(None)
                cells[ci] = _cell_value(cell, shared)
            n_rows += 1
            if n_rows > MAX_DRIVER_ROWS:
                raise ValueError(
                    f"sheet {name!r} exceeds {MAX_DRIVER_ROWS} rows — xlsx is a "
                    "dim-table format here; land fact tables as parquet"
                )
            yield cells


def xlsx_dim(
    spark: SparkSession,
    path: str,
    *,
    sheet: str | int = 0,
    header: bool = True,
) -> DataFrame:
    """Read one sheet into a small all-string DataFrame (a dimension /
    template table, reference File_Submission_Object.py:81,151). With
    ``header``, the first non-empty row names the columns (blanks become
    _c{i}); cells surface as strings with '' preserved (na_filter=False
    semantics — tristate.py gives '' vs N/A vs NULL their meaning).

    The result is broadcast-sized by contract (MAX_DRIVER_ROWS guard) and
    feeds the same paths as any other dim: DictionarySpec rules, the codec
    registry join, presence suites."""
    rows = list(read_xlsx_rows(path, sheet))
    if not rows:
        raise ValueError(f"sheet {sheet!r} of {path} is empty")
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    if header:
        head_i = next(
            (i for i, r in enumerate(rows) if any(c not in (None, "") for c in r)),
            0,
        )
        names = [
            (c.strip() if isinstance(c, str) and c.strip() else f"_c{i}")
            for i, c in enumerate(rows[head_i])
        ]
        data = rows[head_i + 1 :]
    else:
        names = [f"_c{i}" for i in range(width)]
        data = rows
    # sanitize FIRST, then dedup: two headers distinct only by characters
    # the sanitizer folds (e.g. 'a b' vs 'a-b' -> 'a_b') must still end up
    # with unique column names
    sanitized = [re.sub(r"[^0-9A-Za-z_]", "_", n) for n in names]
    seen: dict[str, int] = {}
    safe = []
    for n in sanitized:
        k = seen.get(n, 0)
        seen[n] = k + 1
        safe.append(n if k == 0 else f"{n}_{k}")
    schema = ", ".join(f"`{c}` string" for c in safe)
    from seronet_data_validator_spark.sources.local import local_df

    return local_df(spark, [tuple(r) for r in data], schema)


def write_xlsx(path: str, rows: list[list], *, sheet_name: str = "Sheet1") -> None:
    """Minimal .xlsx writer (test fixtures and round-tripping small report
    tables). Strings become inline strings; ints/floats numbers; None blank.
    Same public ECMA-376 parts the reader consumes."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_ref(i: int) -> str:
        ref = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            ref = chr(ord("A") + rem) + ref
        return ref

    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{col_ref(ci)}{ri}"
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            elif isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{esc(str(v))}</t></is></c>"
                )
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
