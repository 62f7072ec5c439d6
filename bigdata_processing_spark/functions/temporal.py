"""Session-TZ-independent timestamp helpers.

The fixture parquet stores naive ``timestamp[us]``, which Spark >= 4.1
reads as TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled``
defaults to true) and whose analyzer rejects ``unix_micros`` on NTZ
input. Naive wall-time in the fixtures is defined to BE UTC — the same
contract as DuckDB's ``epoch_us`` on a naive timestamp — so the NTZ
conversion must be a pure wall-clock difference with NO session-timezone
dependence. (``to_utc_timestamp(ntz, 'UTC')`` is NOT that: Spark first
coerces NTZ→LTZ through the session zone, shifting the instant.)

Keeping columns NTZ end-to-end is deliberate: ``date_format`` /
``date_trunc`` / ``window()`` on NTZ render wall time independent of the
session zone, so oracle parity holds even when the harness session is
not UTC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ntz_epoch_us(col: str) -> Column:
    """Wall-clock microseconds since the NTZ epoch literal — pure
    timestamp arithmetic, no session-timezone involvement."""
    return F.expr(f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, `{col}`)")


def epoch_us(df: DataFrame, col: str) -> Column:
    """Epoch microseconds for a timestamp column of either flavor.

    TIMESTAMP (instant): ``unix_micros``. TIMESTAMP_NTZ: wall-clock
    microsecond difference from the NTZ epoch literal — exactly DuckDB's
    ``epoch_us(naive_ts)``, whatever ``spark.sql.session.timeZone`` is.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return _ntz_epoch_us(col)
    return F.unix_micros(col)


def ntz_to_instant(col: str) -> Column:
    """NTZ wall time → the UTC instant with the same wall clock, with NO
    session-timezone dependence (unlike ``to_utc_timestamp``, which
    coerces NTZ→LTZ through the session zone first). Needed where Spark
    requires a real TIMESTAMP — e.g. ``withWatermark`` rejects NTZ."""
    return F.timestamp_micros(_ntz_epoch_us(col))


