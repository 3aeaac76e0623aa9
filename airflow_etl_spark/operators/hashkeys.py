"""Data Vault hash keys (inferred dbt layer; SURVEY.md §0, §2.8 F5).

The reference's vault tables carry `*_hash_key` columns computed by the
(absent) dbt models; the convention visible at the call sites
(utlis/etl_manager.py:894, 904-914) plus the `to_hex(md5(to_utf8(…)))`
pattern (utlis/backup_nessie_postgres.py:88) implies: hash of the
concatenated business keys. We standardize on sha2-256 over '||'-joined,
string-cast, NULL→'' keys — deterministic, collision-safe at 100 TB row
counts, and computable by any SQL engine for oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions import dv_hash_key


def with_hash_key(
    df: DataFrame, business_keys: Sequence[str], out_col: str
) -> DataFrame:
    """Append `out_col` = DV hash key over `business_keys` (order matters)."""
    return df.withColumn(out_col, dv_hash_key(*business_keys))


def with_hash_diff(
    df: DataFrame, attr_cols: Sequence[str], out_col: str = "hash_diff"
) -> DataFrame:
    """Append a hash-diff over descriptive attributes — the SCD2 change
    detector used by satellite loads (columns excluded from the reference's
    harvest filters at utlis/etl_manager.py:894 are exactly the
    non-descriptive ones: load_date, record_source, load_end_date)."""
    return df.withColumn(out_col, dv_hash_key(*attr_cols))
