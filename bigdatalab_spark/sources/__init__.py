from bigdatalab_spark.sources.readers import (
    TABLES,
    corpus_fingerprint,
    load_table,
    read_csv,
    read_dsv,
    read_fixed_width,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
)

__all__ = [
    "TABLES",
    "corpus_fingerprint",
    "load_table",
    "read_csv",
    "read_dsv",
    "read_fixed_width",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "read_xml",
]
