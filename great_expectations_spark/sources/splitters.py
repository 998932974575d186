"""Splitters & samplers — batch partition predicates and samplers.

Every splitter compiles to a ``df.filter`` predicate (reference:
``execution_engine/split_and_sample/sparkdf_data_splitter.py:40-324``), so
Catalyst pushes it into the scan; on a date-partitioned table the date
splitters become partition pruning.

The reference's hash splitter/sampler use Python ``hashlib`` UDFs
(:294-324; sampler :142-203) — ours stay JVM-side with ``xxhash64`` /
``sha2``.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DATE_PART_FNS = {
    "year": F.year,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.dayofmonth,
    "day_of_month": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
}


def split_on_whole_table(df: DataFrame) -> DataFrame:
    return df


def split_on_column_value(
    df: DataFrame, column_name: str, batch_identifiers: Dict[str, Any]
) -> DataFrame:
    return df.filter(F.col(column_name) == F.lit(batch_identifiers[column_name]))


def split_on_year(df, column_name, batch_identifiers):
    return split_on_date_parts(df, column_name, batch_identifiers, ["year"])


def split_on_year_and_month(df, column_name, batch_identifiers):
    return split_on_date_parts(
        df, column_name, batch_identifiers, ["year", "month"]
    )


def split_on_year_and_month_and_day(df, column_name, batch_identifiers):
    return split_on_date_parts(
        df, column_name, batch_identifiers, ["year", "month", "day"]
    )


def split_on_date_parts(
    df: DataFrame,
    column_name: str,
    batch_identifiers: Dict[str, Any],
    date_parts: Sequence[str],
) -> DataFrame:
    ident = batch_identifiers[column_name]
    conds: List[Column] = []
    for part in date_parts:
        value = ident[part] if isinstance(ident, dict) else ident
        conds.append(_DATE_PART_FNS[part](F.col(column_name)) == F.lit(value))
    return df.filter(reduce(lambda a, b: a & b, conds))


def split_on_converted_datetime(
    df: DataFrame,
    column_name: str,
    batch_identifiers: Dict[str, Any],
    date_format_string: str = "yyyy-MM-dd",
) -> DataFrame:
    return df.filter(
        F.date_format(F.col(column_name), date_format_string)
        == F.lit(batch_identifiers[column_name])
    )


def split_on_divided_integer(
    df: DataFrame, column_name: str, divisor: int, batch_identifiers: Dict[str, Any]
) -> DataFrame:
    return df.filter(
        (F.col(column_name) / F.lit(divisor)).cast("int")
        == F.lit(int(batch_identifiers[column_name]))
    )


def split_on_mod_integer(
    df: DataFrame, column_name: str, mod: int, batch_identifiers: Dict[str, Any]
) -> DataFrame:
    return df.filter(
        F.pmod(F.col(column_name), F.lit(mod)).cast("int")
        == F.lit(int(batch_identifiers[column_name]))
    )


def split_on_multi_column_values(
    df: DataFrame,
    column_names: Sequence[str],
    batch_identifiers: Dict[str, Any],
) -> DataFrame:
    conds = [
        F.col(c) == F.lit(batch_identifiers[c]) for c in column_names
    ]
    return df.filter(reduce(lambda a, b: a & b, conds))


def _hash_bucket(
    column_name: str, hash_digits: int, hash_function_name: str
) -> Any:
    """Bucket expression for hash splitter/sampler — always JVM-side.

    ``md5`` is the reference-parity mode: the LAST ``hash_digits`` hex
    chars of ``md5(str(value))``, byte-identical to the reference's
    hashlib UDF (``sparkdf_data_sampler.py:142-203``,
    ``sparkdf_data_splitter.py:294-324``) — ported bucket definitions get
    the same row assignments, via ``F.md5`` instead of a Python UDF.
    ``sha256`` is this engine's original mode (FIRST digits of sha2-256),
    kept as the default for backward compatibility.
    """
    col = F.col(column_name).cast("string")
    if hash_function_name == "md5":
        return F.substring(F.md5(col), -hash_digits, hash_digits)
    if hash_function_name in ("sha256", "sha2"):
        return F.substring(F.sha2(col, 256), 1, hash_digits)
    raise ValueError(
        f"unsupported hash_function_name {hash_function_name!r}; "
        "use 'md5' (reference parity) or 'sha256'"
    )


def split_on_hashed_column(
    df: DataFrame,
    column_name: str,
    hash_digits: int,
    batch_identifiers: Dict[str, Any],
    hash_function_name: str = "sha256",
) -> DataFrame:
    """Hash-bucket splitter (JVM-side; reference uses a Python hashlib
    UDF).  Pass ``hash_function_name='md5'`` for reference-identical
    bucket membership."""
    bucket = _hash_bucket(column_name, hash_digits, hash_function_name)
    return df.filter(bucket == F.lit(str(batch_identifiers["hash_value"])))


def split_on_salted_bucket(
    df: DataFrame, column_name: str, num_buckets: int, bucket: int
) -> DataFrame:
    """Ours: deterministic xxhash64 bucket splitter for skew-spreading a
    table into co-sized validation batches."""
    return df.filter(
        F.pmod(F.xxhash64(F.col(column_name)), F.lit(num_buckets))
        == F.lit(bucket)
    )


# --- samplers (ref: split_and_sample/sparkdf_data_sampler.py:35-203) ------


def sample_using_limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def sample_using_random(
    df: DataFrame, p: float = 0.1, seed: int = 1
) -> DataFrame:
    return df.sample(fraction=p, seed=seed)


def sample_using_mod(
    df: DataFrame, column_name: str, mod: int, value: int
) -> DataFrame:
    return df.filter(
        F.pmod(F.col(column_name), F.lit(mod)).cast("int") == F.lit(value)
    )


def sample_using_a_list(
    df: DataFrame, column_name: str, value_list: Sequence[Any]
) -> DataFrame:
    return df.filter(F.col(column_name).isin(list(value_list)))


def sample_using_hash(
    df: DataFrame,
    column_name: str,
    hash_digits: int = 1,
    hash_value: str = "f",
    hash_function_name: str = "sha256",
) -> DataFrame:
    """Deterministic hash sampler, JVM-side.  With
    ``hash_function_name='md5'`` the kept rows are byte-identical to the
    reference's hashlib-UDF sampler (md5 hexdigest suffix match)."""
    return df.filter(
        _hash_bucket(column_name, hash_digits, hash_function_name)
        == F.lit(hash_value)
    )
