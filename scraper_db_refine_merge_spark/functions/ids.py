"""Deterministic entity keys (SURVEY J1/J2).

J1 — ``generate_unique_id`` (reference schema_adapter_enhanced.py:424-427):
``{prefix}_{slug}_{uuid5(DNS, f"{prefix}:{identifier}").hex[:8]}``.
uuid5 is SHA-1 over the namespace bytes + the name; its version/variant bit
surgery only touches digest bytes 6 and 8, so ``hex[:8]`` (bytes 0-3) equals
the first 8 hex chars of the raw SHA-1 — expressible with builtin ``sha1``,
no UDF, bit-identical to the reference.

J2 — ``composite_event_id`` (reference scrapers_v2/schema_adapter.py:28-32):
sha256 over "|"-joined lowered/trimmed key fields with None → "none".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid.NAMESPACE_DNS.bytes.hex()
_NAMESPACE_DNS_HEX = "6ba7b8109dad11d180b400c04fd430c8"


def uuid5_hex8(name: Column) -> Column:
    """First 8 hex chars of uuid5(NAMESPACE_DNS, name).hex — see module doc."""
    digest = F.sha1(F.concat(F.unhex(F.lit(_NAMESPACE_DNS_HEX)), F.encode(name, "UTF-8")))
    return F.substring(digest, 1, 8)


def slugify(identifier: Column) -> Column:
    """re.sub(r'[^a-zA-Z0-9_-]', '_', identifier.lower())"""
    return F.regexp_replace(F.lower(identifier), r"[^a-z0-9_-]", "_")


def generate_unique_id(prefix: str, identifier: Column) -> Column:
    """Deterministic entity id: ``{prefix}_{slug}_{uuid5-hex8}``."""
    name = F.concat(F.lit(f"{prefix}:"), identifier)
    return F.concat_ws("_", F.lit(prefix), slugify(identifier), uuid5_hex8(name))


def composite_event_id(*fields: Column) -> Column:
    """sha256 of "|"-joined key fields; null → "none", else lower(strip(str)).

    The reference strips with Python ``str.strip()``
    (scrapers_v2/schema_adapter.py:31), whose whitespace set is wider than
    both SQL TRIM (' ' only) and Java ``\\s`` (no NEL/\\x1c-\\x1f/\\p{Z}) —
    a title edged with NEL (which html.unescape can emit) must hash to the
    SAME event_id, or dedup/upsert identity (J3/J4/S6) silently forks.
    ``python_strip`` is the exact-parity primitive (r14 falsifying input
    ``('', '\\x85')`` is pinned in test_properties.py).
    """
    from .strings import python_strip

    parts = [
        F.when(f.isNull(), F.lit("none")).otherwise(F.lower(python_strip(f.cast("string"))))
        for f in fields
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)
