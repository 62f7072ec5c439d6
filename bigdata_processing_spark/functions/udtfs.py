"""Python UDTF surface (SURVEY.md §2.10: 'udtf for table-valued needs').

The reference's flatMap lambdas (etherscams.py:48-49) are an ad-hoc
table-valued-function surface; the engine's equivalents are `explode`
over Column expressions (preferred — JVM-side, see
queries/semistructured.py) and, for genuinely procedural row
expansion, registered Python UDTFs. UDTFs cross into Python per row —
keep them OUT of hot paths; this module exists to round out the API
surface with a registration pattern + tests.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """tokenize(text) → one row per whitespace token with its position.
    (The production path for this is explode(split(...)) —
    queries/semistructured.py::explode_token_counts.)"""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for tok in text.split(" "):
            if tok:
                yield tok, pos
                pos += 1


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for the SQL surface
    (``SELECT * FROM tokenize(...)``)."""
    spark.udtf.register("tokenize", TokenizeUDTF)
