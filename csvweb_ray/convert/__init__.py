"""Per-file CSV→RDF conversion (the Ray map_batches UDF core)."""

from .converter import Converter, ConversionResult, convert_file  # noqa: F401
from .cells import CellValue, normalize_cell_value  # noqa: F401
