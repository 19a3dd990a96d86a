"""CSVW metadata handling: normalization, parsing, compiled plans."""

from .model import (  # noqa: F401
    ColumnPlan,
    CompiledTable,
    CompiledTableGroup,
    Dialect,
    MetadataParseError,
)
from .parser import parse_metadata  # noqa: F401
