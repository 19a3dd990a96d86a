"""Compiled CSVW metadata model.

The reference keeps a mutable object tree with an inherited-property chain
walked at access time (``Metadata/InheritedPropertyContainer.cs:26-101``:
Column → Schema → Table → TableGroup for aboutUrl/propertyUrl/valueUrl/
datatype/default/lang/null/separator/required).  Here the chain is resolved
**at compile time** into flat per-column plans so the per-row hot loop in
the Ray ``map_batches`` conversion UDF does no chain walking, and the whole
plan pickles cheaply into tasks.

One intentional divergence: the reference initializes ``Null`` to ``{""}``
on every container, which accidentally breaks inheritance of the ``null``
annotation from schema/table level down to columns.  We inherit ``null``
properly (per the CSVW spec) because the W3C csv2rdf expected outputs
assume it; the default remains ``("",)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Optional

from ..uritemplate import UriTemplate


class MetadataParseError(Exception):
    """Fatal metadata parse error (reference ``MetadataParseException``)."""


@dataclass
class ParserWarning:
    path: str
    message: str


@dataclass
class Dialect:
    """CSV parsing configuration (reference ``Metadata/Dialect.cs:8-31``)."""

    # the reference defaults to "#" (``Dialect.cs:10``) but the CSVW spec
    # default is null — W3C test286 has data rows that begin with '#'
    comment_prefix: Optional[str] = None
    delimiter: str = ","
    double_quote: bool = True
    encoding: str = "utf-8"
    header: bool = True
    header_row_count: Optional[int] = None
    line_terminators: tuple = ("\r\n", "\n")
    quote_char: Optional[str] = '"'
    skip_blank_rows: bool = False
    skip_columns: int = 0
    skip_initial_space: bool = False
    skip_rows: int = 0
    trim: Optional[str] = None  # None | "true" | "false" | "start" | "end"

    def effective_header_row_count(self) -> int:
        if self.header_row_count is not None:
            return self.header_row_count
        return 1 if self.header else 0

    def effective_trim(self) -> str:
        if self.trim is not None:
            return self.trim
        return "start" if self.skip_initial_space else "false"


@dataclass
class ValueConstraint:
    """min/max constraint (reference ``Metadata/ValueConstraint.cs``); the
    threshold is a float for numeric datatypes or an ISO lexical string for
    temporal ones (compared lexicographically, which is order-preserving for
    same-precision ISO dates/times)."""

    kind: str  # "min" | "max" | "minExclusive" | "maxExclusive"
    threshold: object = 0.0

    def is_satisfied(self, value) -> bool:
        threshold = self.threshold
        if isinstance(threshold, float):
            try:
                value = float(value)
            except (TypeError, ValueError):
                return True
        else:
            value = str(value)
            threshold = str(threshold)
        if self.kind == "min":
            return value >= threshold
        if self.kind == "max":
            return value <= threshold
        if self.kind == "minExclusive":
            return value > threshold
        if self.kind == "maxExclusive":
            return value < threshold
        return True


@dataclass
class LengthConstraint:
    """length/minLength/maxLength (reference ``Metadata/LengthConstraint.cs``)."""

    length: Optional[int] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None

    def is_satisfied(self, value: str) -> bool:
        n = len(value)
        if self.length is not None and n != self.length:
            return False
        if self.min_length is not None and n < self.min_length:
            return False
        if self.max_length is not None and n > self.max_length:
            return False
        return True


@dataclass
class DatatypeSpec:
    """Reference ``Metadata/DatatypeDescription.cs:29-51``."""

    base: str = "string"
    id: Optional[str] = None  # custom datatype IRI; wins over base annotation
    format: Any = None  # object with is_valid / normalize, or None
    constraints: tuple = ()


@dataclass
class Inherited:
    """Effective inherited-property values at one level of the chain."""

    about_url: Optional[UriTemplate] = None
    property_url: Optional[UriTemplate] = None
    value_url: Optional[UriTemplate] = None
    datatype: Optional[DatatypeSpec] = None
    default: Optional[str] = None
    lang: Optional[str] = None
    null: Optional[tuple] = None
    separator: Optional[str] = None
    required: Optional[bool] = None
    ordered: Optional[bool] = None
    text_direction: Optional[str] = None

    def overlay(self, parent: "Inherited") -> "Inherited":
        """Child-wins merge: any field unset here falls back to ``parent``."""
        return Inherited(
            about_url=self.about_url if self.about_url is not None else parent.about_url,
            property_url=self.property_url if self.property_url is not None else parent.property_url,
            value_url=self.value_url if self.value_url is not None else parent.value_url,
            datatype=self.datatype if self.datatype is not None else parent.datatype,
            default=self.default if self.default is not None else parent.default,
            lang=self.lang if self.lang is not None else parent.lang,
            null=self.null if self.null is not None else parent.null,
            separator=self.separator if self.separator is not None else parent.separator,
            required=self.required if self.required is not None else parent.required,
            ordered=self.ordered if self.ordered is not None else parent.ordered,
            text_direction=self.text_direction if self.text_direction is not None else parent.text_direction,
        )


@dataclass
class ColumnPlan:
    """Flat, effective per-column conversion plan."""

    name: Optional[str]
    titles: tuple = ()  # tuple of (lang, value)
    suppress_output: bool = False
    virtual: bool = False
    name_explicit: bool = False  # True when 'name' came from the metadata
    about_url: Optional[UriTemplate] = None
    property_url: Optional[UriTemplate] = None
    value_url: Optional[UriTemplate] = None
    datatype: Optional[DatatypeSpec] = None
    default: str = ""
    lang: Optional[str] = None
    null: tuple = ("",)
    separator: Optional[str] = None
    required: bool = False
    ordered: bool = False

    @staticmethod
    def from_inherited(name, inh: Inherited, titles=(), suppress_output=False,
                       virtual=False, name_explicit=False) -> "ColumnPlan":
        return ColumnPlan(
            name=name,
            titles=tuple(titles),
            suppress_output=suppress_output,
            virtual=virtual,
            name_explicit=name_explicit,
            about_url=inh.about_url,
            property_url=inh.property_url,
            value_url=inh.value_url,
            datatype=inh.datatype,
            default=inh.default if inh.default is not None else "",
            lang=inh.lang,
            null=inh.null if inh.null is not None else ("",),
            separator=inh.separator,
            required=bool(inh.required),
            ordered=bool(inh.ordered),
        )


@dataclass
class CompiledTable:
    url: str
    id: Optional[str] = None
    columns: list = field(default_factory=list)  # list[ColumnPlan]
    dialect: Dialect = field(default_factory=Dialect)
    suppress_output: bool = False
    common_properties: dict = field(default_factory=dict)
    notes: Optional[list] = None
    # effective schema-level inherited chain, used when fabricating default
    # columns for ragged rows (reference ``Rdf/Converter.cs:473-483``)
    schema_inherited: Inherited = field(default_factory=Inherited)
    columns_declared: bool = True  # False → infer from header at convert time
    foreign_keys: list = field(default_factory=list)
    primary_key: object = None
    row_titles: object = None  # str | list[str] | None (schema "rowTitles")

    def default_column(self, col_number: int) -> ColumnPlan:
        """Fabricated ``_col.N`` column for ragged/headerless input."""
        plan = ColumnPlan.from_inherited(f"_col.{col_number}", self.schema_inherited)
        return replace(plan, datatype=DatatypeSpec(base="string"), default="", lang=None)

    def inferred_column(self, name: str) -> ColumnPlan:
        """Header-inferred column (reference ``Rdf/Converter.cs:512-525``)."""
        return ColumnPlan.from_inherited(name, self.schema_inherited)


@dataclass
class CompiledTableGroup:
    id: Optional[str] = None
    tables: list = field(default_factory=list)
    common_properties: dict = field(default_factory=dict)
    notes: Optional[list] = None
    warnings: list = field(default_factory=list)
