"""Operator library: pieces that go beyond single Column expressions —
multimodal binary-column processing (Arrow-batched pandas plumbing) and
topk/dedup building blocks used by the query layer."""
