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
    the portable md5 hash mod ``dim``, count per bucket — text → dense
    RAW-count ``array<double>`` with NO trained vocabulary (the
    HashingTF idea: fixed memory at any corpus size, no vocab shuffle,
    no OOV). All codegen'd column folds; one md5 per token.

    Returns UNNORMALIZED counts on purpose: callers that compare
    vectors should MATERIALIZE this column (persist/write) and compute
    norms from the stored column — normalizing inside this expression
    would embed the whole md5 fold three times in one tree, and a join
    above it re-evaluates that tree per PAIR (measured 179s → 1s on
    hashed_tf_knn at sf0.1; same class of bug as the r05 probe-sweep
    persist barrier).

    DuckDB twin (hashed_tf_sql) rebuilds the identical vector: the
    bucket hash is hash64 (md5-derived), counts are exact whole doubles,
    so downstream dot products agree bit-for-bit. (The twin counts by
    bucket scan, this side by a single fold — same integers either way.)

    Shape note: the counts are built by ONE aggregate fold over the
    bucket array, not a per-bucket filter scan — the filter form embeds
    the md5-per-token subtree once per bucket (dim× the digest work
    per row)."""
    tks = F.filter(tokens(col), lambda t: t != "")
    barr = F.transform(tks, lambda t: F.pmod(hash64(t), F.lit(dim)))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.aggregate(
        barr,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, b: F.zip_with(
            acc, idx, lambda x, i: x + F.when(i == b, 1.0).otherwise(0.0)
        ),
    )


def hashed_tf_sql(expr: str, dim: int = 16) -> str:
    """The DuckDB twin of hashed_tf() over SQL text expression ``expr``."""
    tk = f"list_filter(string_split({expr}, ' '), t -> t <> '')"
    barr = (
        f"list_transform({tk}, t -> "
        f"('0x' || substr(md5('0|' || t), 1, 8))::BIGINT % {dim})"
    )
    return (
        f"list_transform(range(0, {dim}), b -> "
        f"len(list_filter({barr}, x -> x = b))::DOUBLE)"
    )
