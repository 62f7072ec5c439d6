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


def minhash_hashes(col, k: int = 8) -> list[Column]:
    """k independent 32-bit hash values per input, derived 4-per-md5
    (md5 yields 128 bits = four 32-bit chunks) — 4x fewer digest
    computations than one salted md5 per hash function.

    Hash i = chunk (i mod 4) of md5('{i div 4}|' || col).
    DuckDB twin per i: ('0x' || substr(md5('{i//4}|' || col),
    {1 + 8*(i%4)}, 8))::BIGINT.
    """
    out: list[Column] = []
    for i in range(k):
        seed, chunk = divmod(i, 4)
        m = F.md5(F.concat(F.lit(f"{seed}|"), col))
        out.append(F.conv(F.substring(m, 1 + 8 * chunk, 8), 16, 10).cast("bigint"))
    return out


def minhash_hash_sql(expr: str, i: int) -> str:
    """The DuckDB twin of minhash_hashes()[i] over SQL expression ``expr``."""
    seed, chunk = divmod(i, 4)
    return f"('0x' || substr(md5('{seed}|' || {expr}), {1 + 8 * chunk}, 8))::BIGINT"


def word_shingles(col, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a document (array<string>).

    Built from transform over the token array — JVM-side, no UDF.
    For n=1 this is the distinct token set.
    DuckDB twin built with list_transform/list_distinct (see dedup
    oracles)."""
    toks = F.filter(tokens(col), lambda t: t != "")
    if n == 1:
        return F.array_distinct(toks)
    # Linear construction: zip n shifted views of the token array and
    # concat element-wise. (A transform-over-index with a per-index
    # slice is O(len²) per document — measured 2x slower on real docs.)
    sz = F.size(toks)
    win = sz - n + 1
    acc = F.slice(toks, 1, win)
    for k in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, k + 1, win), lambda a, b: F.concat(a, F.lit("_"), b)
        )
    return F.when(sz >= n, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def hashed_tf(col, dim: int = 16) -> Column:
    """Hashing-trick term-frequency featurization: bucket each token by
    the portable md5 hash mod ``dim``, count per bucket, L2-normalize —
    text → dense ``array<double>`` with NO trained vocabulary (the
    HashingTF idea: fixed memory at any corpus size, no vocab shuffle,
    no OOV). All codegen'd column folds; one md5 per token.

    DuckDB twin (hashed_tf_sql) rebuilds the identical vector: the
    bucket hash is hash64 (md5-derived), the fold order is positional,
    so downstream dot products agree bit-for-bit."""
    tks = F.filter(tokens(col), lambda t: t != "")
    barr = F.transform(tks, lambda t: F.pmod(hash64(t), F.lit(dim)))
    tf = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(barr, lambda x: x == b)).cast("double"),
    )
    l2 = F.sqrt(
        F.aggregate(tf, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # empty text → zero vector (not NaNs): keep degenerate rows inert
    return F.transform(
        tf, lambda x: F.when(l2 == 0.0, F.lit(0.0)).otherwise(x / l2)
    )


def hashed_tf_sql(expr: str, dim: int = 16) -> str:
    """The DuckDB twin of hashed_tf() over SQL text expression ``expr``."""
    tk = f"list_filter(string_split({expr}, ' '), t -> t <> '')"
    barr = (
        f"list_transform({tk}, t -> "
        f"('0x' || substr(md5('0|' || t), 1, 8))::BIGINT % {dim})"
    )
    tf = (
        f"list_transform(range(0, {dim}), b -> "
        f"len(list_filter({barr}, x -> x = b))::DOUBLE)"
    )
    l2 = f"sqrt(list_dot_product({tf}, {tf}))"
    return (
        f"list_transform({tf}, x -> "
        f"CASE WHEN {l2} = 0.0 THEN 0.0 ELSE x / {l2} END)"
    )
