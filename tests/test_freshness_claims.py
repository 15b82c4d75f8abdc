"""Pin FRESHNESS.md (the generated adjudication-strata artifact) against
recomputation from CORRECTNESS_r*.json + the live registry.

This is VERDICT r12 prescription #2: stale hand-maintained freshness prose
survived three rounds of flagging (r12's "every entry's latest driver row is
r7+" vs six entries actually last-adjudicated r5).  The claim is now a
computed artifact; this test makes a stale committed copy a suite failure.

Grace semantics: the strict comparison is evaluated at FRESHNESS.md's own
``as_of`` round, so the external driver appending CORRECTNESS_r{N+1}.json at
round end does not fail the suite mid-snapshot.  A lag of more than one round
(i.e. a session that started after new driver rows landed and did not
regenerate the artifact) DOES fail — that is the tripwire.
"""

from __future__ import annotations

import re
from pathlib import Path

from local_llm_iceberg_cdw_spark import freshness
from local_llm_iceberg_cdw_spark.operators import _DRIVER_WINDOW_PRIORITY

REPO = Path(__file__).resolve().parent.parent


def _artifact_as_of() -> int:
    text = (REPO / "FRESHNESS.md").read_text()
    m = re.search(r"- as_of: r(\d+)", text)
    assert m, "FRESHNESS.md lost its as_of line"
    return int(m.group(1))


def test_freshness_artifact_matches_recomputation():
    as_of = _artifact_as_of()
    s = freshness.compute_strata(max_round=as_of)
    expected = freshness.render_markdown(s) + "\n"
    actual = (REPO / "FRESHNESS.md").read_text()
    assert actual == expected, (
        "FRESHNESS.md is stale — regenerate with "
        "`python -m local_llm_iceberg_cdw_spark.freshness --write`"
    )


def test_freshness_artifact_lag_at_most_one_round():
    rounds = freshness.correctness_rounds()
    assert rounds, "no CORRECTNESS_r*.json artifacts found"
    lag = max(rounds) - _artifact_as_of()
    assert lag <= 1, (
        f"FRESHNESS.md is {lag} rounds behind the newest CORRECTNESS artifact "
        f"(r{max(rounds):02d}) — regenerate it as the first rotation step"
    )


def test_no_reds_at_latest_adjudication():
    s = freshness.compute_strata()
    assert s["reds"] == [], f"red driver rows at latest adjudication: {s['reds']}"


def test_driver_window_covers_never_adjudicated_backlog():
    """Every registry entry with no driver row must sit inside the next
    window (the first 50 registry entries), unless the backlog exceeds the
    window — rotation exists precisely to retire this stratum first."""
    s = freshness.compute_strata()
    window = set(_DRIVER_WINDOW_PRIORITY)
    missing = [op for op in s["never_adjudicated"] if op not in window]
    if len(s["never_adjudicated"]) <= len(_DRIVER_WINDOW_PRIORITY):
        assert not missing, (
            f"never-adjudicated ops left out of the driver window: {missing}"
        )
