"""Referential-integrity checks as anti-joins (SURVEY.md §2.10).

The schema-land analog of $ref resolution lifted to table scale: every
foreign key must resolve in the dimension table.  Small dimensions are
broadcast (hash-join, zero shuffle of the fact side); large ones fall
back to a sort-merge anti-join, which AQE converts back to broadcast at
runtime if the dimension turns out small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(fact: DataFrame, dim: DataFrame,
                           fk: str, pk: str | None = None,
                           broadcast_dim: bool = True) -> DataFrame:
    """Rows of ``fact`` whose ``fk`` does not exist as ``dim.pk``.

    NULL fks are not referential violations (they are ``required``'s
    job), matching SQL anti-join semantics.
    """
    pk = pk or fk
    keys = dim.select(F.col(pk).alias(fk)).where(F.col(pk).isNotNull())
    if broadcast_dim:
        keys = F.broadcast(keys)
    return (fact.where(F.col(fk).isNotNull())
                .join(keys, on=fk, how="left_anti"))
