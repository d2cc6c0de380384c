"""The driver contract module itself: ordering policy and registry
completeness. A typo in _CHECK_FIRST would silently burn one of the
driver's ~50 correctness slots."""

import importlib.util
import os

import dwh_spark.plans.all  # noqa: F401
from dwh_spark.plans.registry import ORACLES, QUERIES


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_check_first_names_all_exist():
    mod = _entry()
    missing = [n for n in mod._CHECK_FIRST if n not in QUERIES]
    assert not missing, f"_CHECK_FIRST entries not in registry: {missing}"


def test_check_first_has_no_duplicates():
    mod = _entry()
    assert len(mod._CHECK_FIRST) == len(set(mod._CHECK_FIRST))


def test_queries_and_oracles_align():
    mod = _entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert list(qs)[: len(mod._CHECK_FIRST)] == [
        n for n in mod._CHECK_FIRST if n in qs
    ]
    assert set(osql) <= set(qs)
    assert set(qs) == set(QUERIES) and set(osql) == set(ORACLES)
