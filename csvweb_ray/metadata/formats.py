"""CSVW datatype *format* specifications (boolean / numeric / date / time /
dateTime), matching the reference's normalization behavior string-for-string.

Reference classes:
- ``Metadata/BooleanFormatSpecification.cs`` — ``"T|F"`` two-part format.
- ``Metadata/NumericFormatSpecification.cs`` — decimalChar / groupChar /
  pattern; normalize via C#-invariant double/decimal round-trip.
- ``Metadata/DateFormatSpecification.cs`` + ``TimeFormatSpecification.cs`` +
  ``DateTimeFormatSpecification.cs`` — Unicode-ish patterns via NodaTime;
  normalized to (extended) ISO with NodaTime's short offset rendering
  (``+09``, not ``+09:00``, when offset minutes are zero; ``Z`` for UTC —
  see ``Tests/data/dateTime.ttl``).

The pattern → parser translation here is hand-rolled (regex-based) because
Python ``strptime`` cannot express NodaTime's optional-width fields or
offset specifier variants.  Behavior is pinned by the test matrices in
``Tests/DateFormatSpecificationSpec.cs:14-34``,
``Tests/TimeFormatSpecificationSpec.cs:11-40`` and
``Tests/DateTimeFormatSpecificationSpec.cs``.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation


class FormatError(Exception):
    """A literal failed to parse under the column's format specification."""


class MetadataFormatError(Exception):
    """The format specification itself is invalid (metadata parse error)."""


# ---------------------------------------------------------------------------
# boolean
# ---------------------------------------------------------------------------


class BooleanFormat:
    __slots__ = ("true_format", "false_format")

    def __init__(self, fmt: str):
        parts = fmt.split("|")
        if len(parts) != 2:
            raise MetadataFormatError(
                "The format specifier for a boolean datatype must be two strings "
                "separated by a | character."
            )
        self.true_format, self.false_format = parts

    def is_valid(self, literal: str) -> bool:
        return literal in (self.true_format, self.false_format)

    def normalize(self, literal: str) -> str:
        if literal == self.true_format:
            return "true"
        if literal == self.false_format:
            return "false"
        raise FormatError(
            f"Could not parse cell value '{literal}' as a boolean according to "
            "the column format specification."
        )


# ---------------------------------------------------------------------------
# numeric
# ---------------------------------------------------------------------------


def format_double_invariant(value: float) -> str:
    """Render a float the way C# ``double.ToString(CultureInfo.InvariantCulture)``
    does (shortest round-trip; integral values without a decimal point;
    ``E+NN`` exponent notation with a 2-digit minimum exponent)."""
    if value != value:  # NaN
        return "NaN"
    if value == float("inf"):
        return "Infinity"
    if value == float("-inf"):
        return "-Infinity"
    if value == int(value) and abs(value) < 1e16:
        return str(int(value))
    text = repr(value)
    if "e" in text:
        mantissa, exp = text.split("e")
        exp_i = int(exp)
        sign = "+" if exp_i >= 0 else "-"
        if mantissa.endswith(".0"):
            mantissa = mantissa[:-2]
        return f"{mantissa}E{sign}{abs(exp_i):02d}"
    return text


class NumericFormat:
    """UAX-35 number-format pattern (subset: ``0 # . E + % ‰`` plus the
    configured decimal/group characters), per the csv2rdf requirements
    exercised by W3C tests 158/170/171/255/279-304.

    The reference validates with a looser regex and normalizes via C#
    double/decimal round-trips (``NumericFormatSpecification.cs:47-79``);
    the W3C expected outputs instead keep the matched lexical form with only
    group-char stripping, decimal-char canonicalization and %/‰ scaling —
    that behavior is implemented here.
    """

    __slots__ = ("decimal_char", "group_char", "pattern", "_spec", "_regex")

    def __init__(self, decimal_char: str = ".", group_char: str | None = ",",
                 pattern: str | None = None):
        self.decimal_char = decimal_char or "."
        self.group_char = group_char
        self.pattern = pattern
        self._spec = None
        self._regex = None
        if pattern is not None:
            valid = {"0", "#", self.decimal_char, "E", "e", "+", "-", "%", "‰"}
            if group_char:
                valid.add(group_char)
            if any(c not in valid for c in pattern):
                raise MetadataFormatError("Invalid pattern for numeric format specification.")
            self._spec = self._parse_pattern(pattern)
        else:
            # single group separators between digit runs; ',,' is invalid
            # (W3C test162)
            group_pat = re.escape(self.group_char) if self.group_char else None
            dec_pat = re.escape(self.decimal_char)
            int_part = (r"\d+(?:" + group_pat + r"\d+)*") if group_pat else r"\d+"
            self._regex = re.compile(
                r"^((\+|-)?" + int_part + r"(" + dec_pat
                + r"\d+)?([Ee](\+|-)?\d+)?(%|‰)?|NaN|(\+|-)?INF)$")

    def _parse_pattern(self, pattern: str) -> dict:
        dc, gc = self.decimal_char, self.group_char
        i, n = 0, len(pattern)
        spec = {"prefix": "", "suffix": "", "int_min": 0, "int_hash": False,
                "int_group": False, "frac_min": 0, "frac_max": 0,
                "frac_group": False, "has_frac": False, "exp_min": 0,
                "exp_hash": False, "has_exp": False, "exp_sign": False}

        def take_affix():
            nonlocal i
            out = []
            while i < n and pattern[i] in "+-%‰":
                out.append(pattern[i])
                i += 1
            return "".join(out)

        spec["prefix"] = take_affix()
        runs = [0]
        while i < n and (pattern[i] in "0#" or (gc and pattern[i] == gc)):
            ch = pattern[i]
            if ch == "0":
                spec["int_min"] += 1
                runs[-1] += 1
            elif ch == "#":
                spec["int_hash"] = True
                runs[-1] += 1
            else:
                spec["int_group"] = True
                runs.append(0)
            i += 1
        # UAX-35 group sizes: primary from the rightmost separator,
        # secondary from the next (defaults to primary) — W3C test282-295
        if spec["int_group"] and len(runs) >= 2:
            spec["group_primary"] = runs[-1]
            spec["group_secondary"] = runs[-2] if len(runs) >= 3 else runs[-1]
        else:
            spec["group_primary"] = spec["group_secondary"] = None
        if i < n and pattern[i] == dc:
            spec["has_frac"] = True
            i += 1
            while i < n and (pattern[i] in "0#" or (gc and pattern[i] == gc)):
                ch = pattern[i]
                if ch == "0":
                    spec["frac_min"] += 1
                    spec["frac_max"] += 1
                elif ch == "#":
                    spec["frac_max"] += 1
                else:
                    spec["frac_group"] = True
                i += 1
        if i < n and pattern[i] in "Ee":
            spec["has_exp"] = True
            i += 1
            if i < n and pattern[i] == "+":
                spec["exp_sign"] = True
                i += 1
            while i < n and pattern[i] in "0#":
                if pattern[i] == "0":
                    spec["exp_min"] += 1
                else:
                    spec["exp_hash"] = True
                i += 1
        spec["suffix"] = take_affix()
        if i < n:
            raise MetadataFormatError("Invalid pattern for numeric format specification.")
        return spec

    def _digits_ok(self, text: str, grouped: bool) -> int | None:
        """Digit count of a digit run with optional single group separators;
        None when malformed."""
        if not text:
            return 0
        gc = self.group_char
        if grouped and gc:
            parts = text.split(gc)
            if any(p == "" for p in parts):
                return None
            text = "".join(parts)
        if not text.isdigit():
            return None
        return len(text)

    def is_valid(self, literal: str) -> bool:
        if self._regex is not None:
            return bool(self._regex.match(literal))
        s = self._spec
        text = literal
        # prefix: an explicit '+' in the pattern requires a sign; a sign is
        # always permitted (W3C test283 row 2)
        for ch in s["prefix"]:
            if ch == "+":
                if text[:1] in ("+", "-"):
                    text = text[1:]
                else:
                    return False
            elif text[:1] == ch:
                text = text[1:]
            else:
                return False
        if "+" not in s["prefix"] and text[:1] in ("+", "-"):
            text = text[1:]
        for ch in reversed(s["suffix"]):
            if text[-1:] == ch:
                text = text[:-1]
            else:
                return False
        # exponent
        if s["has_exp"]:
            m = re.search(r"[Ee]([+-]?)(.*)$", text)
            if not m:
                return False
            exp_digits = m.group(2)
            if not exp_digits.isdigit():
                return False
            if s["exp_hash"]:
                if len(exp_digits) < max(s["exp_min"], 1):
                    return False
            elif len(exp_digits) != max(s["exp_min"], 1):
                return False
            text = text[: m.start()]
        elif re.search(r"[Ee]", text):
            return False
        # mantissa
        dc = self.decimal_char
        if dc in text:
            if not s["has_frac"] or s["frac_max"] == 0:
                return False
            int_part, frac_part = text.split(dc, 1)
            frac_digits = self._digits_ok(frac_part, s["frac_group"])
            if frac_digits is None or not (s["frac_min"] <= frac_digits <= s["frac_max"]):
                return False
        else:
            if s["frac_min"] > 0:
                return False
            int_part = text
        gc = self.group_char
        if s["int_group"] and gc and s["group_primary"]:
            primary, secondary = s["group_primary"], s["group_secondary"]
            groups = int_part.split(gc)
            if any(not g.isdigit() for g in groups):
                return False
            if len(groups) == 1:
                # ungrouped input must fit within the primary group
                if len(groups[0]) > primary:
                    return False
            else:
                if len(groups[-1]) != primary:
                    return False
                for g in groups[1:-1]:
                    if len(g) != secondary:
                        return False
                if not (1 <= len(groups[0]) <= secondary):
                    return False
            int_digits = sum(len(g) for g in groups)
        else:
            int_digits = self._digits_ok(int_part, s["int_group"])
            if int_digits is None:
                return False
        if s["int_hash"]:
            return int_digits >= s["int_min"]
        return int_digits == s["int_min"] if s["int_min"] else int_digits >= 0

    def normalize(self, literal: str) -> str:
        if self.group_char:
            literal = literal.replace(self.group_char, "")
        if self.decimal_char != ".":
            literal = literal.replace(self.decimal_char, ".")
        if literal in ("NaN", "INF", "-INF", "+INF"):
            return literal.lstrip("+")
        # percent / per-mille signs scale the value (W3C test170/171/283)
        scale = 0
        if "%" in literal:
            literal = literal.replace("%", "")
            scale = -2
        elif "‰" in literal:
            literal = literal.replace("‰", "")
            scale = -3
        if scale:
            try:
                return format(Decimal(literal).scaleb(scale).normalize(), "f")
            except InvalidOperation:
                raise FormatError(
                    f"Could not parse '{literal}' as a decimal value.") from None
        # otherwise keep the lexical form as matched (W3C test283: '+1' stays);
        # exponents render with a lowercase 'e' (W3C test158 expects '0.0e0')
        if self._spec is not None and self._spec["has_exp"]:
            literal = literal.replace("E", "e")
        return literal


# ---------------------------------------------------------------------------
# date / time / dateTime
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"(yyyy|yy|u{1,4}|MM|M|dd|d|HH|H|mm|m|ss|s|S+|XXX|XX|X|xxx|xx|x|Z)")

# offset variant → regex alternatives (derived from the NodaTime pattern
# translation in ``TimeFormatSpecification.cs:26-41`` and pinned by the
# InlineData matrices)
_OFFSET_PATTERNS = {
    "X": r"(?P<off>Z|[+-]\d{2}(?:\d{2})?)",
    "XX": r"(?P<off>Z|[+-]\d{4})",
    "Z": r"(?P<off>Z|[+-]\d{4})",
    "XXX": r"(?P<off>Z|[+-]\d{2}:\d{2})",
    "x": r"(?P<off>[+-]\d{2}(?:\d{2})?)",
    "xx": r"(?P<off>[+-]\d{4})",
    "xxx": r"(?P<off>[+-]\d{2}:\d{2})",
}


def _compile_datetime_pattern(fmt: str):
    """Compile a Unicode-ish date/time pattern to a regex with named groups.
    Returns (regex, has_date, has_time, has_offset)."""
    out = []
    has_date = has_time = has_offset = False
    pos = 0
    seen = set()

    def add_group(name: str, pat: str) -> str:
        if name in seen:
            raise MetadataFormatError(f"Duplicate field '{name}' in pattern '{fmt}'")
        seen.add(name)
        return f"(?P<{name}>{pat})"

    for m in _TOKEN_RE.finditer(fmt):
        if m.start() > pos:
            out.append(re.escape(fmt[pos : m.start()]))
        tok = m.group(0)
        if tok in ("yyyy", "uuuu", "u"):
            out.append(add_group("year", r"\d{4}"))
            has_date = True
        elif tok == "yy":
            out.append(add_group("year2", r"\d{2}"))
            has_date = True
        elif tok == "MM":
            out.append(add_group("month", r"\d{2}"))
            has_date = True
        elif tok == "M":
            out.append(add_group("month", r"\d{1,2}"))
            has_date = True
        elif tok == "dd":
            out.append(add_group("day", r"\d{2}"))
            has_date = True
        elif tok == "d":
            out.append(add_group("day", r"\d{1,2}"))
            has_date = True
        elif tok == "HH":
            out.append(add_group("hour", r"\d{2}"))
            has_time = True
        elif tok == "H":
            out.append(add_group("hour", r"\d{1,2}"))
            has_time = True
        elif tok == "mm":
            out.append(add_group("minute", r"\d{2}"))
            has_time = True
        elif tok == "m":
            out.append(add_group("minute", r"\d{1,2}"))
            has_time = True
        elif tok == "ss":
            out.append(add_group("second", r"\d{2}"))
            has_time = True
        elif tok == "s":
            out.append(add_group("second", r"\d{1,2}"))
            has_time = True
        elif tok[0] == "S":
            out.append(add_group("frac", r"\d{1,%d}" % len(tok)))
            has_time = True
        elif tok in _OFFSET_PATTERNS:
            out.append(_OFFSET_PATTERNS[tok])
            has_offset = True
        else:  # pragma: no cover
            out.append(re.escape(tok))
        pos = m.end()
    if pos < len(fmt):
        out.append(re.escape(fmt[pos:]))
    return re.compile("^" + "".join(out) + "$"), has_date, has_time, has_offset


def _normalize_offset(off: str, full: bool = False) -> str:
    """Offset rendering. Default mirrors NodaTime's general pattern used by
    the reference (``Z`` for UTC, ``±HH`` when minutes are zero — the golden
    ``dateTime.ttl`` expects ``+09``); ``full=True`` renders the W3C
    suite's canonical ``±HH:MM``."""
    if off == "Z":
        return "Z"
    sign = off[0]
    rest = off[1:].replace(":", "")
    hh = int(rest[:2])
    mm = int(rest[2:4]) if len(rest) >= 4 else 0
    if hh == 0 and mm == 0:
        return "Z"
    if full:
        return f"{sign}{hh:02d}:{mm:02d}"
    if mm == 0:
        return f"{sign}{hh:02d}"
    return f"{sign}{hh:02d}:{mm:02d}"


class DateTimeFormatBase:
    """Shared parse/normalize machinery for date/time/dateTime formats."""

    kind = "dateTime"

    def __init__(self, fmt: str, full_offsets: bool = False):
        if fmt is None:
            raise MetadataFormatError("format must not be null")
        self.full_offsets = full_offsets
        self._regex, self.has_date, self.has_time, self.has_offset = _compile_datetime_pattern(fmt)
        self._check_pattern()

    def _check_pattern(self) -> None:
        pass

    def _parse(self, literal: str):
        m = self._regex.match(literal)
        if not m:
            raise FormatError(f"'{literal}' does not match the expected format")
        g = m.groupdict()
        parts = {}
        if "year" in g and g.get("year") is not None:
            parts["year"] = int(g["year"])
        elif g.get("year2") is not None:
            parts["year"] = 2000 + int(g["year2"])
        for key in ("month", "day", "hour", "minute", "second"):
            if g.get(key) is not None:
                parts[key] = int(g[key])
        parts.setdefault("hour", 0)
        parts.setdefault("minute", 0)
        parts.setdefault("second", 0)
        frac = g.get("frac")
        off = g.get("off")
        if "month" in parts and not (1 <= parts["month"] <= 12):
            raise FormatError(f"Month out of range in '{literal}'")
        if "day" in parts and not (1 <= parts["day"] <= 31):
            raise FormatError(f"Day out of range in '{literal}'")
        if parts["hour"] > 23 or parts["minute"] > 59 or parts["second"] > 59:
            raise FormatError(f"Time component out of range in '{literal}'")
        if "year" in parts and "month" in parts and "day" in parts:
            import datetime as _dt

            try:
                _dt.date(parts["year"], parts["month"], parts["day"])
            except ValueError:
                raise FormatError(f"Invalid date in '{literal}'") from None
        return parts, frac, off

    def is_valid(self, literal: str) -> bool:
        try:
            self._parse(literal)
            return True
        except FormatError:
            return False

    def normalize(self, literal: str) -> str:
        parts, frac, off = self._parse(literal)
        out = []
        if self.has_date:
            out.append(f"{parts['year']:04d}-{parts.get('month', 1):02d}-{parts.get('day', 1):02d}")
            out.append("T")
        time_txt = f"{parts['hour']:02d}:{parts['minute']:02d}:{parts['second']:02d}"
        if frac:
            trimmed = frac.rstrip("0")
            if trimmed:
                time_txt += "." + trimmed
        out.append(time_txt)
        if off is not None:
            out.append(_normalize_offset(off, self.full_offsets))
        return "".join(out)


class DateFormat(DateTimeFormatBase):
    kind = "date"

    def _check_pattern(self) -> None:
        # xsd:date permits a timezone, so offset specifiers are allowed
        # (W3C test188: pattern "yyyy-MM-ddX")
        if not self.has_date or self.has_time:
            raise MetadataFormatError("Invalid date pattern")

    def normalize(self, literal: str) -> str:
        parts, _, off = self._parse(literal)
        out = f"{parts['year']:04d}-{parts.get('month', 1):02d}-{parts.get('day', 1):02d}"
        if off is not None:
            out += _normalize_offset(off, self.full_offsets)
        return out


class TimeFormat(DateTimeFormatBase):
    kind = "time"

    def _check_pattern(self) -> None:
        if self.has_date or not self.has_time:
            raise MetadataFormatError("Invalid time pattern")


class DateTimeFormat(DateTimeFormatBase):
    kind = "dateTime"

    def _check_pattern(self) -> None:
        if not self.has_date:
            raise MetadataFormatError("Invalid dateTime pattern")


class RegexFormat:
    """Format for datatypes outside the special boolean/numeric/temporal
    set: the format string is an (anchored) regular expression per the CSVW
    metadata spec (W3C test194 — durations)."""

    __slots__ = ("pattern", "_regex")

    def __init__(self, pattern: str):
        self.pattern = pattern
        try:
            self._regex = re.compile(pattern)
        except re.error as ex:
            raise MetadataFormatError(f"Invalid regex format: {ex}") from None

    def is_valid(self, literal: str) -> bool:
        return self._regex.fullmatch(literal) is not None

    def normalize(self, literal: str) -> str:
        if not self.is_valid(literal):
            raise FormatError(
                f"Value '{literal}' does not match the format regular expression")
        return literal
