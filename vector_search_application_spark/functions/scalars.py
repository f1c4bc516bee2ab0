"""UI-facing scalar functions (SURVEY.md §2.10 C3/C4) — portable pairs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IMAGE_HOST = "http://www.airgas.com"

# C3 score->label ladder (reference search_ui/search.py:118-126)
_LADDER = [(0.8, "Excellent"), (0.6, "Good"), (0.45, "Fair"), (0.3, "Weak")]
_FLOOR_LABEL = "No Match"


def score_label(score: Column) -> Column:
    expr = F.lit(_FLOOR_LABEL)
    for threshold, label in reversed(_LADDER):
        expr = F.when(score >= F.lit(threshold), F.lit(label)).otherwise(expr)
    return expr


def score_label_sql(expr: str) -> str:
    whens = " ".join(
        f"WHEN ({expr}) >= {t} THEN '{label}'" for t, label in _LADDER
    )
    return f"CASE {whens} ELSE '{_FLOOR_LABEL}' END"


def normalize_image_url(img: Column) -> Column:
    """C4: prefix the host when the path is relative
    (reference search_ui/search.py:173-177); null stays null."""
    return F.when(
        img.startswith("/"), F.concat(F.lit(IMAGE_HOST), img)
    ).otherwise(img)


def normalize_image_url_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} LIKE '/%' THEN '{IMAGE_HOST}' || {expr} "
        f"ELSE {expr} END"
    )
