"""PII detection and redaction over a text column.

A standard pre-training hygiene pass (public recipes: C4's blocklist
filtering, BigCode/The-Stack's PII redaction step): find personally
identifying spans — email addresses, IPv4 addresses, phone numbers —
count them per document, and replace each span with a typed placeholder
token so downstream training never sees the raw value. No analog in the
reference (it never ships corpora); this belongs to the task mandate's
training-data-pipeline family.

Scale shape: a pure narrow projection — zero shuffles, zero UDFs. All
three detectors are single-pass JVM regexes inside whole-stage codegen
(`regexp_extract_all` for counts, chained `regexp_replace` for the
rewrite), so the operator runs at parquet-scan speed and Catalyst pushes
column pruning into the reader. The patterns deliberately use only
portable regex constructs (character classes, bounded repetition, `\\b`)
valid in both Java's engine (Spark) and RE2 (DuckDB), so the oracle runs
the identical expressions.

Redaction ORDER is load-bearing: emails first (an email's domain can
contain a dotted-quad that the IP rule would otherwise split), then IPs,
then phones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# portable (Java + RE2) patterns; keep in lockstep with the driver oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_emails, n_ips, n_phones, redacted_text)``.

    Counts are measured on the ORIGINAL text; the rewrite replaces each
    matched span with its placeholder in the documented order
    (email → IP → phone).
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    redacted = F.regexp_replace(redacted, IPV4_RE, IP_TOKEN)
    redacted = F.regexp_replace(redacted, PHONE_RE, PHONE_TOKEN)
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        redacted.alias("redacted_text"),
    )
