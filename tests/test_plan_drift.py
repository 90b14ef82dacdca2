"""Plan-audit regression gate: the physical plan of every registered batch
query must match the committed PLANS.md table.

This turns the 179-row audit from documentation into a tripwire — editing
any query in a way that adds a shuffle, drops a broadcast, changes the scan
count, or flips a join strategy fails here until `python
scripts/plan_audit.py` is re-run and the new PLANS.md is reviewed/committed.
(Plan shapes at sf0.01 are deterministic: AQE re-planning happens at
execution, not in the pre-execution executedPlan this audits.)
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = str(REPO / "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)

from plan_audit import check_drift, collect_audit, parse_plans_md  # noqa: E402
from tests.conftest import SF_ORACLE


def test_plans_md_matches_live_plans(spark):
    drift = check_drift(collect_audit(spark, SF_ORACLE), parse_plans_md())
    assert not drift, "\n".join(
        ["PLANS.md is stale — review the plan change, then regenerate with "
         "`python scripts/plan_audit.py`:"] + drift)
