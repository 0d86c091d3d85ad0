"""SQL literal builders shared by the DuckDB oracle twins.

Every twin that embeds the (query_id, text) list inline uses the same
single-quote-doubling VALUES literal; one definition keeps the escaping
rule identical across modules.
"""

from __future__ import annotations


def sql_values_pairs(pairs) -> str:
    """``(1, 'a''b'), (2, 'c')`` — VALUES body for (int, str) pairs with
    standard SQL single-quote doubling."""
    return ", ".join(
        "({}, '{}')".format(qid, text.replace("'", "''"))
        for qid, text in pairs
    )
