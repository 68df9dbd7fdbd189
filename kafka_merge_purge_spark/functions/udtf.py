"""Python UDTF surface (SURVEY §2.2 "UDTF — one-to-many expansion").

One registered table function: ``tokenize(text)`` — explode a document
into (pos, token) rows.  The built-in ``posexplode(split(...))`` is the
production path (JVM-side, used by x_explode_embeddings/x_word_freq);
the UDTF exists to cover the API surface with identical, oracle-checkable
semantics, and as the template for expansions that genuinely need Python
(e.g. a real BPE tokenizer library).

Arrow-batched by Spark 4's UDTF evaluator; still Python-side row
generation — keep off the 100 TB hot path unless the logic demands it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class Tokenize:
    """(text) → one row per whitespace token, 1-based position."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" "), start=1):
            yield i, tok


def register_udtfs(spark: SparkSession) -> None:
    """Register all engine UDTFs in the session catalog."""
    spark.udtf.register("tokenize", Tokenize)
