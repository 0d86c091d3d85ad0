"""Row-projection helpers mirroring the reference's sentence-prep steps.

The reference's encode pipeline receives ``[instruction, text]`` pairs and
joins them with NO separator before tokenizing (instructor.py:404-427:
asserts ``len(sentence) == 2`` then ``"".join(sentence)``; the retrieval
wrapper prepends a task instruction to every query the same way,
RetrievalEvaluator.py/encode_queries).  Spark-side this is a pure column
expression — JVM-codegen string concat, no UDF — so it fuses into
whatever projection pipeline surrounds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prepend_instruction(df: DataFrame, instruction: Column | str,
                        text_col: str = "text",
                        out_col: str = "instructed") -> DataFrame:
    """Add ``out_col`` = instruction ++ text (no separator — the
    reference's exact ``"".join([instruction, text])`` contract).

    ``instruction`` is a literal string (one task instruction for the
    whole frame, the common case) or a Column (per-row instructions,
    e.g. joined from a task table).  NULLs on either side coalesce to
    the empty string, matching ``"".join`` over ``""`` members rather
    than propagating NULL through the concat.
    """
    instr = F.lit(instruction) if isinstance(instruction, str) else instruction
    return df.withColumn(
        out_col,
        F.concat(
            F.coalesce(instr.cast("string"), F.lit("")),
            F.coalesce(F.col(text_col).cast("string"), F.lit("")),
        ),
    )


def prepend_instruction_sql_expr(instruction_sql: str,
                                 text_col: str = "text") -> str:
    """DuckDB twin of :func:`prepend_instruction`'s column expression —
    ``instruction_sql`` is a SQL expression (usually a quoted literal)."""
    return (
        f"concat(coalesce(CAST({instruction_sql} AS VARCHAR), ''), "
        f"coalesce(CAST({text_col} AS VARCHAR), ''))"
    )
