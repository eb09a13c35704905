"""Pin the bench list to the query registry (round-3 verdict item 2:
a hand-maintained BENCH_QUERIES silently dropped 8 queries from
BENCH_r03.json; the list is now derived so it cannot rot)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_list_is_registry_minus_explicit_exclusions():
    bench = _load_bench()
    from spatialjoincountovershells_ray.queries import REGISTRY

    names = bench.bench_query_names()
    assert set(names) == set(REGISTRY) - set(bench.BENCH_EXCLUDE)
    assert len(names) == len(REGISTRY) - len(bench.BENCH_EXCLUDE)
    assert len(set(names)) == len(names)
    # every exclusion names a real registry query and states a reason
    for name, reason in bench.BENCH_EXCLUDE.items():
        assert name in REGISTRY, name
        assert isinstance(reason, str) and reason, name
