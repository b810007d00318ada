"""Results processing: normalized-return tables, LaTeX emit."""

from .process import (  # noqa: F401
    normalized_scores,
    latex_table,
    expand_records,
    REFERENCE_BASELINES,
)
