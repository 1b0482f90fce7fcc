"""Sources and sinks: object catalog, glob-scoped readers, partitioned
writers, and the Python DataSource registration (SURVEY §2 R13-R16)."""

from rehiver_spark.sources.catalog import (
    content_type_col,
    content_type_of,
    decode_s3_key,
    decode_s3_key_col,
    dedup_catalog,
    encode_s3_key,
    encode_s3_key_col,
    from_file_scan,
    head_object,
    is_text_col,
    is_valid_bucket_name,
    list_distributed,
    list_local,
    list_s3,
    valid_bucket_name_col,
)
from rehiver_spark.sources.reader import (
    read_matching,
    read_path_glob,
    resolve_matching_paths,
)
from rehiver_spark.sources.writer import (
    create_bucket_if_not_exists,
    put_object,
    put_objects_df,
    write_partitioned,
)

__all__ = [
    "content_type_col",
    "content_type_of",
    "create_bucket_if_not_exists",
    "decode_s3_key",
    "decode_s3_key_col",
    "dedup_catalog",
    "encode_s3_key",
    "encode_s3_key_col",
    "from_file_scan",
    "head_object",
    "is_text_col",
    "is_valid_bucket_name",
    "list_distributed",
    "list_local",
    "list_s3",
    "put_object",
    "put_objects_df",
    "read_matching",
    "read_path_glob",
    "resolve_matching_paths",
    "valid_bucket_name_col",
    "write_partitioned",
]
