"""Python UDTFs (table functions, Spark 4): one input row → N typed
output rows, usable in `LATERAL` joins and as standalone relations.

`TokenChunker` packs documents into fixed-size token chunks — the
context-window segmentation step a pretraining pipeline runs before
tokenization/packing. A UDTF (rather than explode over a split() array)
keeps the chunking logic in Python where real chunkers (BPE-aware
packing, overlap windows) live, while Spark distributes rows; the
lateral form streams chunks without materializing the whole list per
document.

The chunk rule is deterministic (whitespace tokens, fixed size, no
overlap) so the DuckDB oracle reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

CHUNK_TOKENS = 32


@udtf(returnType="chunk_idx: int, chunk: string, n_tokens: int")
class TokenChunker:
    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        toks = [t for t in text.strip().lower().split() if t]
        for i in range(0, len(toks), CHUNK_TOKENS):
            chunk = toks[i : i + CHUNK_TOKENS]
            yield i // CHUNK_TOKENS, " ".join(chunk), len(chunk)


def chunk_documents(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """doc_id × its fixed-size token chunks via a LATERAL UDTF join."""
    spark.udtf.register("chunk_tokens", TokenChunker)
    docs.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM _docs_for_udtf d,
             LATERAL chunk_tokens(d.text) c
        """
    )


def chunk_documents_sql(table: str = "documents",
                        size: int = CHUNK_TOKENS) -> str:
    """DuckDB oracle: identical chunking via list slicing."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(trim(lower(text)), ' '),
                               t -> t != '') AS ts
            FROM {table}
        ),
        chunks AS (
            SELECT doc_id, i AS chunk_idx,
                   ts[i * {size} + 1 : (i + 1) * {size}] AS chunk_toks
            FROM toks,
                 unnest(range(0, CAST(ceil(len(ts) / {size}.0) AS BIGINT)))
                     AS u(i)
        )
        SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
               array_to_string(chunk_toks, ' ') AS chunk,
               CAST(len(chunk_toks) AS INTEGER) AS n_tokens
        FROM chunks
    """
