"""Format-spec matrices, ported from the reference InlineData tables
(``Tests/DateFormatSpecificationSpec.cs:14-34``,
``Tests/TimeFormatSpecificationSpec.cs:11-40``,
``Tests/DateTimeFormatSpecificationSpec.cs``)."""

import pytest

from csvweb_ray.metadata.formats import (
    BooleanFormat,
    DateFormat,
    DateTimeFormat,
    NumericFormat,
    TimeFormat,
)

DATE_CASES = [
    ("yyyy-MM-dd", "2015-03-22", True, "2015-03-22"),
    ("yyyyMMdd", "20150322", True, "2015-03-22"),
    ("dd-MM-yyyy", "22-03-2015", True, "2015-03-22"),
    ("d-M-yyyy", "22-3-2015", True, "2015-03-22"),
    ("MM-dd-yyyy", "03-22-2015", True, "2015-03-22"),
    ("M-d-yyyy", "3-22-2015", True, "2015-03-22"),
    ("dd/MM/yyyy", "22/03/2015", True, "2015-03-22"),
    ("d/M/yyyy", "22/3/2015", True, "2015-03-22"),
    ("MM/dd/yyyy", "03/22/2015", True, "2015-03-22"),
    ("M/d/yyyy", "3/22/2015", True, "2015-03-22"),
    ("dd.MM.yyyy", "22.03.2015", True, "2015-03-22"),
    ("d.M.yyyy", "22.3.2015", True, "2015-03-22"),
    ("MM.dd.yyyy", "03.22.2015", True, "2015-03-22"),
    ("M.d.yyyy", "3.22.2015", True, "2015-03-22"),
    ("u-MM-dd", "2015-03-22", True, "2015-03-22"),
]


@pytest.mark.parametrize("fmt,literal,valid,normalized", DATE_CASES)
def test_date_formats(fmt, literal, valid, normalized):
    spec = DateFormat(fmt)
    assert spec.is_valid(literal) == valid
    if valid:
        assert spec.normalize(literal) == normalized


TIME_CASES = [
    ("HH:mm:ss.SSS", "15:02:37.143", True, "15:02:37.143"),
    ("HH:mm:ss", "15:02:37", True, "15:02:37"),
    ("HH:mm", "15:02", True, "15:02:00"),
    ("HH:mm:ss.S", "15:02:37.1", True, "15:02:37.1"),
    ("HHmmss", "150237", True, "15:02:37"),
    ("HHmm", "1502", True, "15:02:00"),
    ("HH:mm:ss.SSSX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSX", "15:02:37.143-08", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSX", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSXX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSXX", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSXX", "15:02:37.143-0800", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSXX", "15:02:37.143+0530", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSZ", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSZ", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSZ", "15:02:37.143-0800", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143Z", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-0800", False, None),
    ("HH:mm:ss.SSSXXX", "15:02:37.143-08:00", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSXXX", "15:02:37.143+05:30", True, "15:02:37.143+05:30"),
    ("HH:mm:ss.SSSx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSx", "15:02:37.143+00", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSx", "15:02:37.143-08", True, "15:02:37.143-08"),
    ("HH:mm:ss.SSSxx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSxx", "15:02:37.143+0000", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSxx", "15:02:37.143-08", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143Z", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143+00:00", True, "15:02:37.143Z"),
    ("HH:mm:ss.SSSxxx", "15:02:37.143-0800", False, None),
    ("HH:mm:ss.SSSxxx", "15:02:37.143-08:00", True, "15:02:37.143-08"),
]


@pytest.mark.parametrize("fmt,literal,valid,normalized", TIME_CASES)
def test_time_formats(fmt, literal, valid, normalized):
    spec = TimeFormat(fmt)
    assert spec.is_valid(literal) == valid
    if valid:
        assert spec.normalize(literal) == normalized


DATETIME_CASES = [
    ("yyyy-MM-ddTHH:mm:ss.SSS", "2015-03-15T15:02:37.143", True, "2015-03-15T15:02:37.143"),
    ("yyyy-MM-ddTHH:mm:ss", "2015-03-15T15:02:37", True, "2015-03-15T15:02:37"),
    ("yyyy-MM-ddTHH:mm", "2015-03-15T15:02", True, "2015-03-15T15:02:00"),
    ("dd-MM-yyyy HH:mm:ss.S", "15-03-2015 15:02:37.1", True, "2015-03-15T15:02:37.1"),
    ("d/M/yyyy HH:mm:ss", "15/3/2015 15:02:37", True, "2015-03-15T15:02:37"),
    ("M/d/yyyy HHmmss", "3/15/2015 150237", True, "2015-03-15T15:02:37"),
    ("dd.MM.yyyy HH:mm", "15.03.2015 15:02", True, "2015-03-15T15:02:00"),
    ("M.d.yyyy HHmm", "3.15.2015 1502", True, "2015-03-15T15:02:00"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143Z", True, "2015-03-15T15:02:37.143Z"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143-08", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-MM-ddTHH:mm:ss.SSSX", "2015-03-15T15:02:37.143+0530", True, "2015-03-15T15:02:37.143+05:30"),
    ("yyyy-MM-ddTHH:mm:ss.SSSXX", "2015-03-15T15:02:37.143-08", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143-0800", False, None),
    ("yyyy-MM-ddTHH:mm:ss.SSSXXX", "2015-03-15T15:02:37.143-08:00", True, "2015-03-15T15:02:37.143-08"),
    ("yyyy-M-dTH:m:sZ", "2019-03-16T15:03:23Z", True, "2019-03-16T15:03:23Z"),
]


@pytest.mark.parametrize("fmt,literal,valid,normalized", DATETIME_CASES)
def test_datetime_formats(fmt, literal, valid, normalized):
    spec = DateTimeFormat(fmt)
    assert spec.is_valid(literal) == valid
    if valid:
        assert spec.normalize(literal) == normalized


def test_boolean_format():
    spec = BooleanFormat("Y|N")
    assert spec.normalize("Y") == "true"
    assert spec.normalize("N") == "false"
    assert not spec.is_valid("maybe")


def test_numeric_pattern_grouping():
    spec = NumericFormat(pattern="#,#00")
    assert spec.is_valid("1,234")
    assert spec.normalize("1,234") == "1234"
    assert not spec.is_valid("1234")  # grouped pattern requires separators past primary
    assert not spec.is_valid("12,34")
    assert spec.is_valid("12")


def test_numeric_percent_scaling():
    spec = NumericFormat(group_char=",")
    assert spec.normalize("123456.789%") == "1234.56789"
    assert spec.normalize("123‰") == "0.123"


def test_numeric_default_rejects_double_group():
    spec = NumericFormat()
    assert not spec.is_valid("123,,456.789")
    assert spec.is_valid("1,234.5")


def test_full_offset_mode():
    spec = DateTimeFormat("yyyy-M-dTH:m:sXXX", full_offsets=True)
    assert spec.normalize("2018-12-25T23:59:58+09:00") == "2018-12-25T23:59:58+09:00"
    spec_short = DateTimeFormat("yyyy-M-dTH:m:sXXX")
    assert spec_short.normalize("2018-12-25T23:59:58+09:00") == "2018-12-25T23:59:58+09"
