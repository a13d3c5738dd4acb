"""S4 Excel ingestion at its real format: a genuine .xlsx workbook
(zipped ECMA-376 spreadsheetML, built here without any Excel library)
must round-trip through read_excel_dim — covering shared strings, inline
strings, numeric cells, and the reference's column normalization."""

from __future__ import annotations

import zipfile

from research_data_pipeline_spark.io.sources import read_excel_dim

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="cwts" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

_SST = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>Print ISSN</t></si><si><t>Source Title</t></si><si><t>Nature</t></si></sst>"""

# header via shared strings; data mixes a shared string, an inline
# string, an integer and a float
_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>SNIP</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>0028-0836</t></is></c><c r="B2" t="s"><v>2</v></c><c r="C2"><v>9.5</v></c></row>
<row r="3"><c r="A3" t="inlineStr"><is><t>1476-4687</t></is></c><c r="B3" t="str"><v>Nature (online)</v></c><c r="C3"><v>7</v></c></row>
</sheetData></worksheet>"""


def _write_xlsx(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SST)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)


def test_read_excel_dim_real_xlsx(spark, tmp_path):
    path = str(tmp_path / "cwts.xlsx")
    _write_xlsx(path)
    df = read_excel_dim(spark, path)
    assert df.columns == ["print_issn", "source_title", "snip"]
    rows = {r["print_issn"]: r for r in df.collect()}
    assert rows["0028-0836"]["source_title"] == "Nature"
    assert rows["0028-0836"]["snip"] == 9.5
    assert rows["1476-4687"]["source_title"] == "Nature (online)"
    assert rows["1476-4687"]["snip"] == 7.0


def test_sheet_index_uses_numeric_order_and_big_ints_stay_exact(tmp_path):
    """sheet10.xml sorts lexicographically before sheet2.xml — the index
    must follow the numeric suffix; integer cells above 2^53 must not go
    through float()."""
    from research_data_pipeline_spark.io.sources import _read_xlsx_minimal

    big = 2**53 + 1  # not representable as float64
    path = str(tmp_path / "many.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        for i in range(1, 12):
            body = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>which</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>sheet{i}</t></is></c></row>
<row r="3"><c r="A3"><v>{big}</v></c></row>
</sheetData></worksheet>"""
            z.writestr(f"xl/worksheets/sheet{i}.xml", body)
    pdf = _read_xlsx_minimal(path, sheet=1)  # 0-based: second sheet
    assert pdf["which"].iloc[0] == "sheet2"  # lexicographic would give sheet10
    assert pdf["which"].iloc[1] == big  # exact int, not 2**53
