"""Text-analysis column expressions for the LLM-data-pipeline surface.

All pure Column expressions (whole-stage-codegen'd JVM execution) — no
Python UDFs. Each helper has an exact ANSI-SQL twin used by the DuckDB
oracles, so correctness is machine-checkable.

Reference analog: the reference's only string ops are split/startswith/len
(SURVEY.md §2.8 X1-X3); this module is the north-star extension
(SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic English stopword set used by the language-ID
# heuristic and the quality score. Keep sorted + frozen: oracles inline it.
EN_STOPWORDS: tuple[str, ...] = ("a", "and", "in", "is", "of", "the", "to")

# BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
# non-space symbol — the classic pre-tokenization split (works identically
# in Java regex and DuckDB's RE2).
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(col) -> Column:
    """Whitespace tokenization. DuckDB twin: string_split(col, ' ')."""
    return F.split(col, " ")


def token_count(col) -> Column:
    """Whitespace token count (empty tokens excluded).

    DuckDB twin: len(list_filter(string_split(col,' '), t -> t <> ''))."""
    return F.size(F.filter(tokens(col), lambda t: t != ""))


def bpe_token_count(col) -> Column:
    """BPE-ish pre-tokenizer count via regexp_count.

    DuckDB twin: len(regexp_extract_all(col, BPE_TOKEN_RE))."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def punct_count(col) -> Column:
    """Count of non-alphanumeric, non-space chars.

    DuckDB twin: len(regexp_extract_all(col, '[^a-zA-Z0-9 ]'))."""
    return F.regexp_count(col, F.lit("[^a-zA-Z0-9 ]"))


def stopword_count(col) -> Column:
    """How many whitespace tokens are English stopwords.

    DuckDB twin: len(list_filter(string_split(col,' '),
    t -> t IN ('a','and','in','is','of','the','to')))."""
    sw = list(EN_STOPWORDS)
    return F.size(F.filter(tokens(col), lambda t: t.isin(sw)))


def normalized(col) -> Column:
    """Canonical form for fingerprinting: lowercase, trim, collapse runs
    of whitespace. DuckDB twin:
    regexp_replace(lower(trim(col)), '\\s+', ' ', 'g')."""
    return F.regexp_replace(F.lower(F.trim(col)), "\\s+", " ")


def fingerprint(col) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    Identical in DuckDB (md5 → lowercase hex)."""
    return F.md5(normalized(col))


def hash64(col, seed: int | str = 0) -> Column:
    """Portable 32-bit-range hash from md5 hex (first 8 hex chars → int).

    Chosen over xxhash64/murmur because md5 is the one hash both Spark and
    DuckDB implement identically, making MinHash/SimHash oracle-checkable.
    DuckDB twin: ('0x' || substr(md5(seed || '|' || col), 1, 8))::BIGINT.
    """
    salted = F.concat(F.lit(str(seed)), F.lit("|"), col)
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def word_shingles(col, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a document (array<string>).

    Built from transform over the token array — JVM-side, no UDF.
    For n=1 this is the distinct token set.
    DuckDB twin built with list_transform/list_distinct (see dedup
    oracles)."""
    toks = F.filter(tokens(col), lambda t: t != "")
    if n == 1:
        return F.array_distinct(toks)
    # join each window of n consecutive tokens with '_'
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws("_", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))
