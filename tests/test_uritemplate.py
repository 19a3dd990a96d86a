"""URI template tests (reference semantics: ``UriTemplate.cs:30-118``)."""

import pytest

from csvweb_ray.uritemplate import UriTemplate, UriTemplateBindingError


def test_simple_substitution():
    t = UriTemplate("http://example.org/countries/{code}")
    assert t.resolve({"code": "AD"}) == "http://example.org/countries/AD"


def test_no_percent_encoding_in_reference_mode():
    t = UriTemplate("http://example.org/data/{Subject}")
    assert t.resolve({"Subject": "foo bar"}) == "http://example.org/data/foo bar"


def test_percent_encoding_in_spec_mode():
    t = UriTemplate("http://example.org/data/{Subject}", encode=True)
    assert t.resolve({"Subject": "foo bar"}) == "http://example.org/data/foo%20bar"


def test_fragment_operator():
    t = UriTemplate("http://example.org/doc{#frag}")
    assert t.resolve({"frag": "x"}) == "http://example.org/doc#x"


def test_plus_operator_keeps_reserved():
    t = UriTemplate("{+url}.json", encode=True)
    assert t.resolve({"url": "http://e.org/a b"}) == "http://e.org/a%20b.json"


def test_comma_variable_list():
    t = UriTemplate("http://example.org/{a,b}")
    assert t.resolve({"a": "1", "b": "2"}) == "http://example.org/1,2"


def test_unbound_variable_raises():
    t = UriTemplate("http://example.org/{missing}")
    with pytest.raises(UriTemplateBindingError):
        t.resolve({})


def test_empty_binding_raises():
    t = UriTemplate("http://example.org/{x}")
    with pytest.raises(UriTemplateBindingError):
        t.resolve({"x": ""})


def test_percent_encoded_variable_name_decoded():
    t = UriTemplate("http://example.org/{On%20Street}")
    assert t.resolve({"On Street": "v"}) == "http://example.org/v"


def test_literal_text_untouched():
    t = UriTemplate("http://example.org/static")
    assert t.resolve({}) == "http://example.org/static"
