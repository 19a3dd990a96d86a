"""CSVW cell-value normalization (steps 1-7 of the parsing algorithm).

Mirrors ``Rdf/CellParser.cs:53-149``: whitespace normalization classed by
datatype, empty→default substitution, null-set matching, separator list
splitting with per-token trimming.  Steps 8-9 (format parse + constraint
validation) are applied later at literal-emission time, matching the
reference's division of labor (``Rdf/Converter.cs:533-595``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from ..metadata.datatypes import (
    RETAINS_LEADING_TRAILING_WS,
    RETAINS_LINE_ENDINGS,
    RETAINS_WS_IN_LIST,
    is_valid_base,
)
from ..metadata.model import ColumnPlan

_WS_RUN_RE = re.compile(r"\s+")


class CellParseError(Exception):
    pass


@dataclass
class CellValue:
    raw: Optional[str] = None
    normalized: Optional[str] = None
    is_list: bool = False
    value_list: Optional[list] = None
    value: Optional[str] = None
    errors: list = field(default_factory=list)


def normalize_cell_value(raw_value: Optional[str], column: ColumnPlan) -> CellValue:
    datatype = column.datatype
    base = datatype.base if datatype is not None else "string"
    if not is_valid_base(base):
        raise CellParseError(f"Unrecognized cell base datatype ID: {base}")

    cell = CellValue(raw=raw_value)
    if raw_value is None:
        return cell

    normalized = raw_value
    if base not in RETAINS_LINE_ENDINGS:
        normalized = normalized.replace("\r", " ").replace("\n", " ").replace("\t", " ")
    if base not in RETAINS_LEADING_TRAILING_WS:
        normalized = _WS_RUN_RE.sub(" ", normalized.strip())
    if normalized == "":
        normalized = column.default
    cell.normalized = normalized

    if column.separator is not None:
        cell.is_list = True
        if normalized is None or normalized in column.null:
            cell.value_list = None
        else:
            cell.value_list = []
            for token in normalized.split(column.separator):
                if base not in RETAINS_WS_IN_LIST:
                    token = token.strip()
                _apply_default_and_null(cell, token, column)
    else:
        _apply_default_and_null(cell, normalized, column)
    return cell


def _apply_default_and_null(cell: CellValue, text: Optional[str], column: ColumnPlan) -> None:
    if text == "":
        text = column.default
    if text is not None and text in column.null:
        text = None
        if column.separator is None and column.required:
            cell.errors.append("Got NULL value for a required cell")
    if cell.is_list:
        cell.value_list.append(text)
    else:
        cell.value = text
