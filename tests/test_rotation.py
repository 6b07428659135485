"""The driver-record rotation invariant (VERDICT r4 #2): with a 50-
entry driver window over a 140+-query registry, every registered
query's latest external verdict must stay within MAX_STALENESS
rounds — enforced by tools/rotation_check.py, wrapped here so pytest
fails a bad rotation BEFORE the round is judged. Tooling references
plans.PRIORITY_WINDOW / plans.STAGED_NEXT_WINDOW so each round's
rewire is a one-line alias change, not a test edit (r7 verdict #1)."""

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
        PRIORITY_WINDOW,
        all_queries,
        all_oracles,
    )

    registry = list(all_queries())
    assert list(PRIORITY_WINDOW) == registry[: rotation_len()]
    # every window entry resolves (a dangling name would silently
    # shrink the checked set)
    assert all(q in registry for q in PRIORITY_WINDOW)
    # oracles stay aligned with queries
    assert set(all_oracles()) <= set(registry)


def rotation_len():
    import rotation_check

    return rotation_check.WINDOW


def test_staged_next_plan_resolves():
    """The pre-staged next-round window (close-out discipline — r6
    shipped without one and went red): 50 unique names, all resolving
    in the current registry, and every query with the earliest
    (upcoming+1) deadline covered, so the between-rounds handoff state
    passes rotation_check as soon as the driver lands this round's
    CORRECTNESS file."""
    from real_time_event_streaming_pipeline_spark.plans import (
        STAGED_NEXT_WINDOW,
        all_queries,
    )

    registry = set(all_queries())
    assert len(STAGED_NEXT_WINDOW) == rotation_len()
    assert len(set(STAGED_NEXT_WINDOW)) == len(STAGED_NEXT_WINDOW)
    missing = [q for q in STAGED_NEXT_WINDOW if q not in registry]
    assert not missing, missing


def test_handoff_state_passes_with_staged_plan(tmp_path, capsys):
    """Simulate the between-rounds state that burned r6 and r7: the
    driver has landed THIS round's CORRECTNESS file (copied as the
    live window's green verdict), the live window has not been rewired
    for the next round — rotation_check must pass (with a warning)
    because the staged next plan cures every would-be violation."""
    import glob
    import json
    import shutil

    import rotation_check
    from real_time_event_streaming_pipeline_spark import plans

    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    _, upcoming = rotation_check.load_history(str(tmp_path))
    fake = {q: {"hash_match": True} for q in plans.PRIORITY_WINDOW}
    (tmp_path / f"CORRECTNESS_r{upcoming:02d}.json").write_text(json.dumps(fake))
    # the staged plan must exist under the name the check looks for
    staged_name = f"_PRIORITY_R{upcoming + 1}_PLAN"
    had = getattr(plans, staged_name, None)
    try:
        if had is None:
            setattr(plans, staged_name, plans.STAGED_NEXT_WINDOW)
        violations = rotation_check.check(str(tmp_path))
    finally:
        if had is None:
            delattr(plans, staged_name)
    assert not violations, "\n".join(violations)


def test_handoff_pending_is_machine_detectable(tmp_path):
    """r8 ADVICE: the staged-plan pass must be distinguishable from a
    clean pass by exit-code gating — check_ex returns
    handoff_pending=True in the between-rounds state, False once the
    window is wired, and EXIT_HANDOFF_PENDING differs from 0/1."""
    import glob
    import json
    import shutil

    import rotation_check
    from real_time_event_streaming_pipeline_spark import plans

    assert rotation_check.EXIT_HANDOFF_PENDING not in (0, 1)
    # wired state: clean pass, no pending handoff
    violations, pending = rotation_check.check_ex(REPO)
    assert not violations and not pending
    # stale between-rounds state: land the LIVE window twice in a row
    # (the driver re-verifying the same 50 rows) so the pre-drained
    # backlog genuinely goes stale; the staged plan for the round
    # after must flip the result to pass-with-pending, not clean pass
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    _, upcoming = rotation_check.load_history(str(tmp_path))
    fake = json.dumps({q: {"hash_match": True} for q in plans.PRIORITY_WINDOW})
    (tmp_path / f"CORRECTNESS_r{upcoming:02d}.json").write_text(fake)
    (tmp_path / f"CORRECTNESS_r{upcoming + 1:02d}.json").write_text(fake)
    live_viol, _ = rotation_check.check_ex(str(tmp_path))  # no staged plan yet
    staged_name = f"_PRIORITY_R{upcoming + 2}_PLAN"
    assert getattr(plans, staged_name, None) is None, "pick a deeper simulation"
    assert live_viol, "two same-window rounds should strand the pre-drained backlog"
    try:
        setattr(plans, staged_name, plans.STAGED_NEXT_WINDOW)
        violations, pending = rotation_check.check_ex(str(tmp_path))
    finally:
        delattr(plans, staged_name)
    assert not violations and pending


def test_all_oracles_rejects_bogus_sf_dir():
    """r8 ADVICE: a nonexistent sf_dir (e.g. a flag string passed as
    the dir) must raise, not silently degrade every trained-literal
    row to rows-only."""
    import pytest

    from real_time_event_streaming_pipeline_spark.plans import all_oracles

    with pytest.raises(NotADirectoryError):
        all_oracles(sf_dir="--strict")
