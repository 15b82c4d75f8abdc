"""Source/sink formats beyond the parquet fixtures.

CSV (with explicit casts, mirroring the reference's ingestion job
``/root/reference/telco_spark/append_telco_spark_iceberg.py:40-58``) lives
in ``catalog.read_csv_with_casts``; snapshot-versioned tables in
``formats/``.  This package adds the line-delimited JSON source/sink used
by document-corpus interchange.
"""

from .jsonl import read_jsonl, write_jsonl
from .orc_io import read_orc, write_orc

__all__ = ["read_jsonl", "write_jsonl", "read_orc", "write_orc"]
