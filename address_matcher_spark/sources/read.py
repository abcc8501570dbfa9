"""File-type dispatch (S1 — tools/matcher_funcs.py:47-67 `detect_file_type`
/ `read_file`): extension → Spark reader.

The reference reads csv/csv.gz/zip/xlsx/parquet into pandas; here every
format lands as a DataFrame scan so downstream pruning/pushdown work.
xlsx has no Spark-native reader and no openpyxl in this container — it
raises with the same "file type not recognised" contract as the
reference's else-branch (matcher_funcs.py:58).
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


def read_file(spark: SparkSession, path: str,
              infer_schema: bool = True) -> DataFrame:
    """S1: one reader for every supported input.  CSV compression
    (gz/bz2) is transparent to Spark's csv source; zip is extracted
    driver-side first (see _unzip_csv)."""
    kind = detect_file_type(path)
    if kind == "parquet":
        return spark.read.parquet(path)
    if kind == "csv_zip":
        path = _unzip_csv(path)
        kind = "csv"
    if kind == "csv":
        return spark.read.csv(path, header=True, inferSchema=infer_schema)
    raise NotImplementedError(
        "xlsx needs a pandas/openpyxl sidecar (absent in this container); "
        "convert to csv/parquet upstream"
    )
