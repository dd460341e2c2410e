"""The house portable hash, in ONE place.

60-bit hash = first 15 hex digits of md5, as BIGINT — chosen because
both engines can compute it exactly (Spark: conv(substr(md5(x),1,15),
16,10); DuckDB: ('0x' || substr(md5(x),1,15))::UBIGINT) and 60 bits
stay inside BIGINT.  Every hash-as-RNG / bucketing operator must use
THIS pair — a drifted copy silently breaks Spark/DuckDB parity for
whichever module is missed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5, as BIGINT."""
    return F.conv(F.md5(col).substr(1, 15), 16, 10).cast("long")


#: DuckDB twin of :func:`h60`; format with the SQL expression for x.
DUCK_H60 = "CAST(('0x' || substr(md5({x}), 1, 15))::UBIGINT AS BIGINT)"
