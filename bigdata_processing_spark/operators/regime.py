"""Broadcast-regime switch for join sides that GROW WITH the corpus.

A forced ``F.broadcast()`` on a corpus-derived table (a vocabulary /
document-frequency table, a removed-doc id set, cluster labels, shingle
lookups) is correct and fast at test scale and an executor/driver OOM at
web scale: the hint bypasses Spark's own size check, and Catalyst's
static size estimate through explode/aggregate subtrees undercounts
badly enough to re-enter broadcast territory on its own (both measured
on the 100x clone corpus — see queries/dedup.py's round-9 notes and
tools/reporting_scale_proof.py).

This module is the ONE shared decision. It grew up inside
queries/dedup.py (rounds 8-9) and moved here in round 10 because the
identical anti-pattern kept reappearing in other files (tf-idf's df
table, the surprisal vocab, the curation pipeline's removal sets): the
fix is a package-wide gate, not a per-file one. Every ``F.broadcast``
in the package must be either (a) bounded by construction — k rows, a
batch, a candidate set, a sketch, a centroid table — or (b) routed
through this switch; tests/test_plans.py sweeps the source for
violations.

Two gates, for the two ways callers know the size of the small side:

* :func:`bcast_if_small` — the side is bounded by the corpus it was
  derived from, and the corpus lives at ``sf_dir``: proxy its in-memory
  size from the documents table's parquet footers (uncompressed bytes;
  compression ratio varies too much with content for disk size to be a
  safe proxy — measured 156 MB text → 56 MB parquet on the clone
  corpus).
* :func:`bcast_if_rows` — the side's ROW COUNT is already known to the
  caller (an append batch, an already-counted pair graph): gate on
  ``rows x bytes_per_row``.

Big-regime behavior is an explicit sort-merge HINT, not merely
"no hint": dropping to no-hint lets Catalyst's static estimate force
the same broadcast back (measured — the 100x winnowing proof caught
exactly this through a window+agg subtree).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# In-memory bytes a broadcast side may cost before every corpus-sized
# join in a pipeline degrades to a key-shuffle join. Estimated
# in-memory bytes = 8 x uncompressed parquet text (each ~15-char
# shingle string becomes a ~70-byte JVM object — 2-byte chars +
# header/padding — and derived arrays re-materialize most of the text;
# measured: a 156 MB-uncompressed corpus OOM'd an 8 GB driver as a
# forced broadcast).
VERIFY_BROADCAST_MAX_BYTES = 512 << 20
UNCOMP_TO_MEM_MULT = 8

# Footer-size memo: the regime decision is pure parquet metadata, but a
# reporting query family can consult it a dozen times per call (labels,
# removed sets, df tables, verify legs) — read the footers once per
# dir. Tests poke this to force a regime
# (tests/test_plans.py: _SIZE_MEMO[dir] = 10**15 → big regime).
_SIZE_MEMO: dict[str, int] = {}


def docs_uncompressed_bytes(sf_dir: str) -> int:
    """UNCOMPRESSED byte size of the documents table from the parquet
    column-chunk footers — pure file metadata, no Spark job.

    Compressed file size is the wrong proxy for in-memory relation size:
    compression ratio varies wildly with content (the 100x clone proof
    corpus packs 156 MB of text into 56 MB on disk — a ratio a real
    boilerplate-heavy web crawl can match), so a disk-based threshold
    silently re-enters broadcast territory exactly when duplication is
    worst. Footer uncompressed sizes are ratio-independent. Falls back
    to 3 x file size when a footer can't be read."""
    p = os.path.join(sf_dir, "documents.parquet")
    files = [p] if os.path.isfile(p) else sorted(
        glob.glob(os.path.join(p, "*.parquet"))
    )
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                total += sum(
                    g.column(c).total_uncompressed_size
                    for c in range(g.num_columns)
                )
        return total
    except Exception:
        return 3 * sum(os.path.getsize(f) for f in files)


def fits_broadcast(
    sf_dir: str, cap: int = VERIFY_BROADCAST_MAX_BYTES
) -> bool:
    """ONE regime decision for every broadcast whose table GROWS WITH
    the corpus (shingle-set lookups, cluster labels, removed-doc sets,
    vocabulary/fingerprint df tables, verified-pair frames). Proxy:
    estimated in-memory bytes of the documents table (8 x uncompressed
    parquet size — see VERIFY_BROADCAST_MAX_BYTES); every derived table
    in this family is bounded by the corpus it was derived from, so one
    corpus-sized gate covers them all."""
    sz = _SIZE_MEMO.get(sf_dir)
    if sz is None:
        sz = docs_uncompressed_bytes(sf_dir)
        _SIZE_MEMO[sf_dir] = sz
    return UNCOMP_TO_MEM_MULT * sz <= cap


def bcast_if_small(df: DataFrame, sf_dir: str) -> DataFrame:
    """Broadcast-or-merge switch for corpus-growing join sides. Small
    regime: explicit broadcast (these joins are the hot path and AQE
    does not always convert them). Big regime: explicit sort-merge
    HINT, not merely no-hint — a bare F.broadcast() bypasses Spark's
    size check and OOMs outright at real-corpus cardinalities, and
    Catalyst's static size estimate through explode/aggregate subtrees
    undercounts badly enough to re-enter broadcast territory on its own
    (measured: the 100x proof corpus OOM'd an 8 GB driver through a
    forced vocab broadcast)."""
    return F.broadcast(df) if fits_broadcast(sf_dir) else df.hint("merge")


def bcast_if_rows(
    df: DataFrame,
    n_rows: int,
    bytes_per_row: int = 64,
    cap: int = VERIFY_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Broadcast-or-merge switch when the caller already KNOWS the row
    count of the candidate broadcast side (an append batch it just
    counted, a pair graph it just materialized) — no corpus dir to
    proxy from. ``bytes_per_row`` defaults to 64: generous for the
    id-only frames this gates (a long doc_id is 8 bytes + row
    overhead), so the switch errs toward shuffle joins near the cap."""
    return (
        F.broadcast(df)
        if n_rows * bytes_per_row <= cap
        else df.hint("merge")
    )
