"""Native XLSX ingestion (sources/xlsx.py): stdlib zip+XML reader for the
reference's Excel template/registry workbooks (File_Submission_Object.py:81,
151) — round-trip via the module's own minimal writer, plus structural and
guard behavior."""

import pytest

from seronet_data_validator_spark.sources.xlsx import (
    read_xlsx_rows,
    write_xlsx,
    xlsx_dim,
)


def test_roundtrip_types_and_sparse_cells(tmp_path):
    path = str(tmp_path / "t.xlsx")
    rows = [
        ["codec", "container", "lossy", "max_sr"],
        ["pcm_s16le", "wav", False, 48000],
        ["opus", "ogg", True, 48000],
        # sparse row: col B missing entirely
        ["flac", None, False, 44100.5],
        ["", "empty-string-preserved", True, 0],
    ]
    write_xlsx(path, rows)
    got = list(read_xlsx_rows(path))
    assert got[0] == ["codec", "container", "lossy", "max_sr"]
    assert got[1] == ["pcm_s16le", "wav", "FALSE", "48000"]
    assert got[3][1] is None and got[3][3] == "44100.5"
    assert got[4][0] == ""  # na_filter=False semantics: '' stays ''


def test_xlsx_dim_dataframe(spark, tmp_path):
    path = str(tmp_path / "dim.xlsx")
    write_xlsx(
        path,
        [
            ["codec", "container", "lossy"],
            ["pcm_s16le", "wav", "F"],
            ["flac", "flac", "F"],
            ["opus", "ogg", "T"],
        ],
    )
    df = xlsx_dim(spark, path)
    assert df.columns == ["codec", "container", "lossy"]
    rows = {r["codec"]: (r["container"], r["lossy"]) for r in df.collect()}
    assert rows["opus"] == ("ogg", "T") and len(rows) == 3


def test_xlsx_dim_feeds_registry_join(spark, tmp_path):
    """The loaded dim drives the same broadcast paths as codec_registry_df:
    validate against a workbook-sourced registry and get identical verdicts."""
    from seronet_data_validator_spark.runner import validate_clips
    from seronet_data_validator_spark.sources.clips import (
        codec_registry_df,
        generate_clips,
    )

    path = str(tmp_path / "reg.xlsx")
    builtin = codec_registry_df(spark)
    write_xlsx(
        path,
        [["codec", "container", "lossy"]]
        + [[r["codec"], r["container"], r["lossy"]] for r in builtin.collect()],
    )
    from_xlsx = xlsx_dim(spark, path)
    clips = generate_clips(spark, 300, seed=43, bad=True)
    v1 = validate_clips(spark, clips, codec_registry=builtin, run_id="a")
    v2 = validate_clips(spark, clips, codec_registry=from_xlsx, run_id="b")
    key = lambda res: sorted(  # noqa: E731
        (r["row_ref"], r["rule_id"], r["message"]) for r in res.violations.collect()
    )
    assert key(v1) == key(v2) and v1.passed == v2.passed


def test_sheet_selection_and_errors(tmp_path):
    path = str(tmp_path / "s.xlsx")
    write_xlsx(path, [["a"], ["1"]], sheet_name="Registry")
    assert list(read_xlsx_rows(path, "Registry"))[0] == ["a"]
    with pytest.raises(ValueError, match="not in workbook"):
        list(read_xlsx_rows(path, "Missing"))


def test_shared_strings_and_rich_text(tmp_path):
    """Excel itself writes shared strings (not inline); hand-build that
    variant plus a rich-text run to cover the reader's sst path."""
    import zipfile

    path = str(tmp_path / "sst.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>codec</t></si>"
        "<si><r><t>pcm_</t></r><r><t>s16le</t></r></si>"  # rich-text runs
        "<si><t xml:space=\"preserve\"> padded </t></si></sst>"
    )
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c>'
        '<c r="C2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<?xml version="1.0"?><workbook {ns} '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    got = list(read_xlsx_rows(path, "S"))
    assert got[0] == ["codec"]
    assert got[1] == ["pcm_s16le", " padded ", "42"]


def test_headers_colliding_after_sanitize(spark, tmp_path):
    """Two headers distinct only by characters the sanitizer folds
    ('a b' vs 'a-b' -> 'a_b') must still produce unique column names."""
    path = str(tmp_path / "collide.xlsx")
    write_xlsx(path, [["a b", "a-b", "a_b"], ["1", "2", "3"]])
    df = xlsx_dim(spark, path)
    assert df.columns == ["a_b", "a_b_1", "a_b_2"]
    row = df.collect()[0]
    assert [row[c] for c in df.columns] == ["1", "2", "3"]
