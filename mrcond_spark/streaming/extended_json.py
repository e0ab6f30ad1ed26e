"""MongoDB Extended-JSON fidelity helpers (SURVEY §7 risk register).

The reference serializes BSON change events with serde — edge types arrive in
Extended JSON shape: ``{"$oid": ...}``, ``{"$date": ...}``,
``{"$numberLong": "..."}``, ``{"$numberDecimal": "..."}``. The pipeline
forwards them verbatim (fidelity by construction); these helpers are for
*consumers* of the envelope that want typed columns out of ``fullDocument``.

All pure JVM expressions (get_json_object / casts) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def oid(doc: Column, path: str) -> Column:
    """Extract an ObjectId field as its 24-hex string.

    Handles both plain-string ids and ``{"$oid": "..."}``.
    """
    plain = F.get_json_object(doc, f"$.{path}")
    wrapped = F.get_json_object(doc, f"$.{path}.$oid")
    return F.coalesce(wrapped, plain)


def number_long(doc: Column, path: str) -> Column:
    """``{"$numberLong": "123"}`` or a bare JSON number -> BIGINT."""
    wrapped = F.get_json_object(doc, f"$.{path}.$numberLong")
    plain = F.get_json_object(doc, f"$.{path}")
    return F.coalesce(wrapped, plain).cast("bigint")


def number_decimal(doc: Column, path: str, scale: int = 4) -> Column:
    """``{"$numberDecimal": "1.23"}`` or a bare number -> DECIMAL(38, scale)."""
    wrapped = F.get_json_object(doc, f"$.{path}.$numberDecimal")
    plain = F.get_json_object(doc, f"$.{path}")
    return F.coalesce(wrapped, plain).cast(f"decimal(38,{scale})")


def date(doc: Column, path: str) -> Column:
    """``{"$date": "ISO"}`` / ``{"$date": {"$numberLong": "ms"}}`` / bare ISO
    string -> TIMESTAMP."""
    iso = F.get_json_object(doc, f"$.{path}.$date")
    ms = F.get_json_object(doc, f"$.{path}.$date.$numberLong")
    plain = F.get_json_object(doc, f"$.{path}")
    return F.coalesce(
        F.timestamp_millis(ms.cast("bigint")),
        iso.cast("timestamp"),
        plain.cast("timestamp"),
    )
