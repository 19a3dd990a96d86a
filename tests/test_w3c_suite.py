"""W3C CSVW csv2rdf conformance suite (270 approved cases;
``fixtures/test-suite/manifest-rdf.ttl``), run through the same converter
core the Ray pipeline uses.  BASELINE.md gates triple P/R ≥ 0.95; the
engine currently passes every case, so the assertions are tighter."""

import os

import pytest

from csvweb_ray.conformance import make_dir_fetch, read_manifest, run_suite_test


@pytest.fixture(scope="module")
def suite(suite_dir):
    tests = read_manifest(os.path.join(suite_dir, "manifest-rdf.ttl"))
    fetch = make_dir_fetch(suite_dir)
    return tests, fetch


def test_suite_shape(suite):
    tests, _ = suite
    assert len(tests) == 270


def test_full_suite_pass_rate_and_pr(suite):
    tests, fetch = suite
    outcomes = [run_suite_test(t, fetch) for t in tests]
    passed = sum(o.passed for o in outcomes)
    macro_p = sum(o.precision for o in outcomes) / len(outcomes)
    macro_r = sum(o.recall for o in outcomes) / len(outcomes)
    failed = [o.test_id for o in outcomes if not o.passed]
    # the BASELINE gate is P/R >= 0.95; we hold the bar at full pass
    assert macro_p >= 0.99 and macro_r >= 0.99, (macro_p, macro_r)
    assert passed == len(outcomes), f"failing cases: {failed}"
