"""The registry's shared core: the Declared record, the REGISTRY list,
and the @declare decorator.

Lives in its own leaf module (no heavy imports) so sibling registry
modules can depend on it WITHOUT importing plans.registry — importing a
sibling first must not trigger registry.py's module body, whose final
window-curation step would then run before the sibling's own entries
exist (a circular-import footgun: the partially-initialized sibling is
what registry.py's `from . import registry_x` returns mid-cycle).
Consumers that want the full, curated registry import plans.registry,
which loads every sibling and re-exports REGISTRY from here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Declared:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # None -> driver records weaker rows-only check
    survey_ids: str = ""


REGISTRY: list[Declared] = []


def declare(name: str, sql: Optional[str], survey_ids: str = ""):
    def deco(fn):
        REGISTRY.append(Declared(name, fn, sql, survey_ids))
        return fn

    return deco
