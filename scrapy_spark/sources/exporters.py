"""Flat-file exporters (common/exporters.py: CSVExporter/JSONExporter).

The reference flattens nested payloads before CSV export
(``_flatten_data``, exporters.py:74-92): nested dicts become dotted
columns, lists become JSON strings. Spark twin: recursively expand struct
columns into ``parent.child`` columns and serialize array/map columns with
``to_json`` — after which ``df.write.csv`` / ``.json`` are the rotation-
and compression-aware sinks (Spark handles codec + part-file rotation
natively; the reference hand-rolls both)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_for_export(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten structs to dotted columns; arrays/maps/binary ->
    JSON/base64 strings, so every output column is CSV-safe scalar."""
    cols = []

    def walk(prefix: str, dtype: T.DataType, col):
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}" if prefix else f.name,
                     f.dataType, col.getField(f.name))
        elif isinstance(dtype, (T.ArrayType, T.MapType)):
            cols.append(F.to_json(col).alias(prefix))
        elif isinstance(dtype, T.BinaryType):
            cols.append(F.base64(col).alias(prefix))
        else:
            cols.append(col.alias(prefix))

    for f in df.schema.fields:
        walk(f.name, f.dataType, F.col(f.name))
    return df.select(*cols)


def export_csv(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """CSVExporter twin: flattened, header, compressed part files."""
    flatten_for_export(df).write.mode("overwrite").option("header", True).option(
        "compression", compression
    ).csv(path)


def export_json(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSONExporter twin (JSONL output; Spark's native rotation)."""
    df.write.mode("overwrite").option("compression", compression).json(path)
