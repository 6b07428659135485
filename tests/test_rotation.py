"""The driver-record rotation invariant (VERDICT r4 #2): with a 50-
entry driver window over a 140+-query registry, every registered
query's latest external verdict must stay within MAX_STALENESS
rounds — enforced by tools/rotation_check.py, wrapped here so pytest
fails a bad rotation BEFORE the round is judged."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_rotation_invariant_holds():
    import rotation_check

    violations = rotation_check.check(REPO)
    assert not violations, "\n".join(violations)


def test_priority_window_is_the_registry_prefix():
    from real_time_event_streaming_pipeline_spark.plans import (
        _PRIORITY_R7,
        all_queries,
        all_oracles,
    )

    registry = list(all_queries())
    assert list(_PRIORITY_R7) == registry[: rotation_len()]
    # every window entry resolves (a dangling name would silently
    # shrink the checked set)
    assert all(q in registry for q in _PRIORITY_R7)
    # oracles stay aligned with queries
    assert set(all_oracles()) <= set(registry)


def rotation_len():
    import rotation_check

    return rotation_check.WINDOW


def test_staged_r8_plan_resolves():
    """The pre-staged next-round window (r7 close-out discipline — r6
    shipped without one and went red): 50 unique names, all resolving
    in the current registry. The full feasibility simulation runs at
    r8's own close-out once CORRECTNESS_r07 exists."""
    from real_time_event_streaming_pipeline_spark.plans import (
        _PRIORITY_R8_PLAN,
        all_queries,
    )

    registry = set(all_queries())
    assert len(_PRIORITY_R8_PLAN) == rotation_len()
    assert len(set(_PRIORITY_R8_PLAN)) == len(_PRIORITY_R8_PLAN)
    missing = [q for q in _PRIORITY_R8_PLAN if q not in registry]
    assert not missing, missing
