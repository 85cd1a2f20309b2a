"""PII detection and redaction — the scrubbing pass every
training-data pipeline runs before text reaches a tokenizer.

Detection is regex-scoped to four classic surface forms (email,
ipv4, US-phone shape, SSN shape). The patterns are deliberately
restricted to constructs with IDENTICAL semantics in Java's regex
engine (Spark executors) and RE2 (the DuckDB oracle): character
classes, bounded repetition, alternation — no lookaround, no
backreferences. That keeps every count and every redacted byte
value-checkable cross-engine.

The gate corpora contain no natural PII, so the registered queries
plant it deterministically (`synthesize_pii_corpus`): doc_id-keyed
rules append synthetic identifiers to a subset of documents — the
same synthesize-then-verify pattern the multimodal codecs use. The
planting is pure Catalyst string construction, so the oracle
reproduces the exact corpus.

Redaction replaces every match with a typed placeholder, most
specific pattern first (SSN before phone: both are digit-dash
shapes, and a fixed order makes the output engine-independent).
Scale shape: map-only — no shuffle, no UDF, whole-stage codegen
regexes; at 100 TB this runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common-subset patterns (keep in lockstep with the
# SQL twins in queries.py)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\(?[0-9]{3}\)?[- ][0-9]{3}[- ][0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
# redaction order: most specific digit shapes first so the SSN form
# is never half-eaten by the phone pattern
PII_REDACT_ORDER = ("email", "ssn", "phone", "ipv4")


def synthesize_pii_corpus(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Deterministically plant synthetic PII into a text corpus:
    every 3rd doc gains an email, every 5th a phone, every 7th an
    ipv4, every 11th an SSN shape (ids divisible by several plant
    several). Pure Catalyst concat — the oracle rebuilds the same
    corpus byte for byte."""
    i = F.col(id_col).cast("long")
    text = F.col(text_col)
    email = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" contact user"),
            i.cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        i % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((i % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((i % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ipv4 = F.when(
        i % 7 == 0,
        F.concat(
            F.lit(" host 10."),
            (i % 256).cast("string"),
            F.lit("."),
            ((i * 7) % 256).cast("string"),
            F.lit(".1"),
        ),
    ).otherwise(F.lit(""))
    ssn = F.when(
        i % 11 == 0,
        F.concat(
            F.lit(" id "),
            F.lpad((i % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((i % 100).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((i % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return df.withColumn(
        text_col, F.concat(text, email, phone, ipv4, ssn)
    )


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII hit counts:
    (id, n_email, n_ssn, n_phone, n_ipv4, n_pii_total). Map-only
    codegen `regexp_count` per pattern.

    Count semantics note: the phone pattern's count is taken AFTER
    masking SSN shapes out of the text (an SSN's tail "[0-9]{2}-
    [0-9]{4}" would otherwise also match the phone shape when
    preceded by a 3-digit area-code-looking group) — the same
    precedence the redactor applies."""
    text = F.col(text_col)
    ssn_free = F.regexp_replace(text, PII_PATTERNS["ssn"], "#")
    counts = {
        "n_email": F.regexp_count(text, F.lit(PII_PATTERNS["email"])),
        "n_ssn": F.regexp_count(text, F.lit(PII_PATTERNS["ssn"])),
        "n_phone": F.regexp_count(ssn_free, F.lit(PII_PATTERNS["phone"])),
        "n_ipv4": F.regexp_count(ssn_free, F.lit(PII_PATTERNS["ipv4"])),
    }
    out = df.where(text.isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col),
        *[c.cast("long").alias(n) for n, c in counts.items()],
    )
    return out.withColumn(
        "n_pii_total",
        (
            F.col("n_email")
            + F.col("n_ssn")
            + F.col("n_phone")
            + F.col("n_ipv4")
        ).cast("long"),
    )


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact all four PII forms with typed placeholders, fixed
    order (email, SSN, phone, ipv4): (id, n_redacted, redacted_md5)
    — counts plus a fingerprint of the scrubbed document, the
    value-checkable form that never ships document bodies (same
    contract as `remove_duplicate_spans`)."""
    text = F.col(text_col)
    original = text
    redacted = text
    for kind in PII_REDACT_ORDER:
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[kind], f"[{kind.upper()}]"
        )
    n_red = (
        F.regexp_count(original, F.lit(PII_PATTERNS["email"]))
        + F.regexp_count(original, F.lit(PII_PATTERNS["ssn"]))
        + F.regexp_count(
            F.regexp_replace(original, PII_PATTERNS["ssn"], "#"),
            F.lit(PII_PATTERNS["phone"]),
        )
        + F.regexp_count(
            F.regexp_replace(original, PII_PATTERNS["ssn"], "#"),
            F.lit(PII_PATTERNS["ipv4"]),
        )
    )
    return df.where(text.isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col),
        n_red.cast("long").alias("n_redacted"),
        F.md5(redacted).alias("redacted_md5"),
    )
