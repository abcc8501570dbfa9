"""File-type dispatch (S1 — tools/matcher_funcs.py:47-67 `detect_file_type`
/ `read_file`): extension → Spark reader.

The reference reads csv/csv.gz/zip/xlsx/parquet into pandas; here every
format lands as a DataFrame scan so downstream pruning/pushdown work.
xlsx (no Spark-native reader, no openpyxl in this container) is parsed
driver-side with a minimal stdlib zip+XML reader (_read_xlsx_rows) —
like zip, xlsx is non-splittable and inherently a small-upload format,
never a 100 TB input, so a driver-side parse into a DataFrame is the
right shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def detect_file_type(filename: str) -> str:
    """S1: extension sniff (tools/matcher_funcs.py:47-58)."""
    low = filename.lower().rstrip("/")
    if low.endswith(".parquet") or low.endswith(".pq"):
        return "parquet"
    if low.endswith(".csv.zip"):
        return "csv_zip"
    if low.endswith((".csv", ".csv.gz", ".csv.bz2")):
        return "csv"
    if low.endswith(".xlsx"):
        return "xlsx"
    raise ValueError(f"file type not recognised: {filename}")


def _unzip_csv(path: str) -> str:
    """Spark/Hadoop has no zip codec (gz/bz2 only), so a .csv.zip handed
    straight to spark.read.csv would parse the ARCHIVE bytes as text —
    silent garbage.  The reference reads zip via pandas' zipfile support
    (matcher_funcs.py:60-63); here the archive is extracted driver-side
    (stdlib zipfile, local paths only — zip is non-splittable regardless,
    so it is inherently a small-upload format, never a 100 TB input) and
    the inner csv is what Spark scans."""
    import atexit
    import shutil
    import tempfile
    import zipfile

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f".csv.zip inputs are extracted driver-side with stdlib zipfile "
            f"and must be on the local filesystem; got non-local URI {path!r} "
            f"— download it first or repack as .csv.gz (splittable-codec "
            f"path Spark reads natively)"
        )
    tmp = tempfile.mkdtemp(prefix="amspark_zip_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    with zipfile.ZipFile(path.removeprefix("file://")) as zf:
        inner = [n for n in zf.namelist() if n.lower().endswith(".csv")]
        if not inner:
            raise ValueError(f"no .csv member inside zip archive: {path}")
        return zf.extract(inner[0], tmp)


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _cell_col(ref: str | None, fallback: int) -> int:
    """'B3' → 1.  Cells may omit r= (rare writers); fall back to position."""
    if not ref:
        return fallback
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1 if n else fallback


def _read_xlsx_rows(path: str) -> tuple[list[str], list[list[str | None]]]:
    """Minimal dependency-free .xlsx parse (OOXML SpreadsheetML): first
    worksheet, shared strings, inline strings, raw numeric text.  Returns
    (header, rows-of-strings); type coercion is downstream's job exactly
    as with the reference's pd.read_excel → initial-load coercion
    (tools/matcher_funcs.py:60-67, sources/coerce.py).

    Deliberate limits (documented, raise rather than corrupt): first
    sheet only (the reference reads the default sheet), no formula
    re-evaluation (cached <v> is used), no 1904-date handling — dates
    arrive as serial-number strings, which the reference's pandas path
    also only fixes post-hoc (remove_dates_from_address)."""
    import xml.etree.ElementTree as ET
    import zipfile

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f".xlsx inputs are parsed driver-side and must be local; got "
            f"{path!r}"
        )
    with zipfile.ZipFile(path.removeprefix("file://")) as zf:
        names = zf.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_XLSX_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t"))
                )
        sheets = sorted(
            n for n in names
            if n.startswith("xl/worksheets/") and n.endswith(".xml")
        )
        if not sheets:
            raise ValueError(f"no worksheet inside xlsx: {path}")
        root = ET.fromstring(zf.read(sheets[0]))
        raw_rows: list[dict[int, str | None]] = []
        width = 0
        for row in root.iter(f"{_XLSX_NS}row"):
            cells: dict[int, str | None] = {}
            for pos, c in enumerate(row.findall(f"{_XLSX_NS}c")):
                idx = _cell_col(c.get("r"), pos)
                ctype = c.get("t", "n")
                v = c.find(f"{_XLSX_NS}v")
                if ctype == "s":
                    val: str | None = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_XLSX_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_XLSX_NS}t"))
                        if is_el is not None else None
                    )
                else:  # n, b, str (cached formula), d
                    val = v.text if v is not None else None
                cells[idx] = val
                width = max(width, idx + 1)
            raw_rows.append(cells)
    if not raw_rows:
        raise ValueError(f"empty worksheet in xlsx: {path}")
    dense = [[r.get(i) for i in range(width)] for r in raw_rows]
    header = [
        h if h is not None else f"_c{i}" for i, h in enumerate(dense[0])
    ]
    return header, dense[1:]


def read_file(spark: SparkSession, path: str,
              infer_schema: bool = True) -> DataFrame:
    """S1: one reader for every supported input.  CSV compression
    (gz/bz2) is transparent to Spark's csv source; zip is extracted
    driver-side first (see _unzip_csv); xlsx is parsed driver-side
    (_read_xlsx_rows) into an all-string DataFrame, mirroring the
    reference's pd.read_excel → downstream coercion."""
    kind = detect_file_type(path)
    if kind == "parquet":
        return spark.read.parquet(path)
    if kind == "csv_zip":
        path = _unzip_csv(path)
        kind = "csv"
    if kind == "csv":
        return spark.read.csv(path, header=True, inferSchema=infer_schema)
    header, rows = _read_xlsx_rows(path)
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(h, StringType(), True) for h in header])
    return spark.createDataFrame(rows, schema)
