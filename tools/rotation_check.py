"""Rotation-staleness invariant for the external driver record.

The driver's correctness gate checks only the FIRST 50 registry
entries per round, so with a 140+-query registry the priority window
(plans/__init__.PRIORITY_WINDOW, the registry prefix) must rotate: the invariant is that no
registered query's latest external verdict is ever older than
MAX_STALENESS rounds. This tool replays the recorded
CORRECTNESS_r*.json history, assumes the CURRENT window lands in the
upcoming round, and fails when any query would still violate the
invariant — i.e. it catches a bad rotation BEFORE the round is judged.

    python tools/rotation_check.py            # exit 1 on violation
    python tools/rotation_check.py --verbose  # per-query ages

Run as part of the close-out sweep; also wrapped by
tests/test_rotation.py so `pytest` enforces it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_STALENESS = 3  # a verdict may be at most this many rounds old
WINDOW = 50  # the driver checks the first WINDOW registry entries


def load_history(repo_dir: str) -> tuple[dict[str, int], int]:
    """{query: latest round with a driver verdict}, and the upcoming
    round number (max recorded round + 1)."""
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as fh:
            for q in json.load(fh):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest, max_round + 1


def _violations(
    registry: list[str],
    window: set[str],
    latest: dict[str, int],
    upcoming: int,
    verbose: bool = False,
) -> list[str]:
    """Staleness violations assuming `window` lands in round `upcoming`,
    plus the full feasibility lookahead (Hall's condition): for every
    horizon h, the queries whose verification deadline falls within
    the next h rounds must fit h windows, or some future round is
    already over-committed no matter how its rotation is arranged (the
    r7 lesson: the r3/r4-era backlog plus a 149-query registry left r8
    nearly zero slack until five rows were retired)."""
    violations = []
    deadlines: list[int] = []
    for q in registry:
        eff = upcoming if q in window else latest.get(q)
        if eff is None:
            violations.append(f"{q}: never in any driver window and not in the current one")
            continue
        age = upcoming - eff
        if verbose:
            print(f"{q}: latest r{eff} (age {age}{' — in current window' if q in window else ''})")
        if age > MAX_STALENESS:
            violations.append(
                f"{q}: latest driver verdict r{latest.get(q)}, age {age} > {MAX_STALENESS} "
                "after the upcoming round — rotate it into the priority window"
            )
        # feasibility lookahead input: the last round q can wait for is
        # eff + MAX_STALENESS + 1 (being in THAT round's window cures
        # the would-be violation at its pre-round check)
        deadlines.append(eff + MAX_STALENESS + 1)
    # Hall's condition over the rolling windows
    for h in range(1, MAX_STALENESS + 2):
        due = sum(1 for d in deadlines if d <= upcoming + h)
        if due > h * WINDOW:
            violations.append(
                f"lookahead: {due} queries must be verified within the next "
                f"{h} round(s) but only {h * WINDOW} window slots exist — "
                "retire/merge rows or rotate more of them this round"
            )
        elif verbose:
            print(f"lookahead h={h}: {due} due of {h * WINDOW} slots")
    return violations


# main() exit code when the check passes ONLY via the staged plan and
# --strict-handoff is given: distinct from 0 (clean) and 1 (violation)
# so exit-code-gating callers can tell "plan staged but not wired"
# apart from both (r8 ADVICE — a caller gating on exit 0 alone would
# keep passing all round even if the plan is never wired).
EXIT_HANDOFF_PENDING = 3


def check(repo_dir: str, verbose: bool = False) -> list[str]:
    """Violations with the LIVE window presumed to land in the upcoming
    round (see check_ex for the handoff flag)."""
    return check_ex(repo_dir, verbose=verbose)[0]


def check_ex(repo_dir: str, verbose: bool = False) -> tuple[list[str], bool]:
    """(violations, handoff_pending). Handoff-aware (r7 verdict #1):
    between rounds — the driver has landed CORRECTNESS_r{N}.json but
    round N+1's first commit has not yet rewired the window — the live
    window simulates as already landed and the backlog looks red even
    though the staged next-window plan covers it. If a staged
    ``_PRIORITY_R{upcoming}_PLAN`` exists and presuming IT as the
    upcoming window cures every violation, the check passes with
    handoff_pending=True (a warning on stderr; ``--strict-handoff``
    turns it into exit EXIT_HANDOFF_PENDING so exit-code gating can
    refuse to coast on an unwired plan — r8 ADVICE)."""
    import real_time_event_streaming_pipeline_spark.plans as plans

    registry = list(plans.all_queries())
    latest, upcoming = load_history(repo_dir)
    live = _violations(registry, set(registry[:WINDOW]), latest, upcoming, verbose=verbose)
    if not live:
        return [], False
    staged = getattr(plans, f"_PRIORITY_R{upcoming}_PLAN", None)
    if staged is not None:
        staged_viol = _violations(registry, set(staged), latest, upcoming)
        if not staged_viol:
            print(
                f"rotation WARNING: live window stale for upcoming r{upcoming} "
                f"({len(live)} would-be violations) but staged _PRIORITY_R{upcoming}_PLAN "
                "cures all of them — wire it as the round's first commit",
                file=sys.stderr,
            )
            return [], True
    return live, False


def main() -> int:
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verbose = "--verbose" in sys.argv
    strict_handoff = "--strict-handoff" in sys.argv
    violations, handoff_pending = check_ex(repo_dir, verbose=verbose)
    if violations:
        print(f"ROTATION CHECK FAILED ({len(violations)} violations):")
        for v in violations:
            print("  " + v)
        return 1
    latest, upcoming = load_history(repo_dir)
    from real_time_event_streaming_pipeline_spark.plans import all_queries

    if handoff_pending and strict_handoff:
        print(
            f"rotation HANDOFF PENDING (--strict-handoff): staged plan for r{upcoming} "
            "cures the stale live window but has not been wired as PRIORITY_WINDOW"
        )
        return EXIT_HANDOFF_PENDING
    print(
        f"rotation OK{' (handoff pending)' if handoff_pending else ''}: "
        f"{len(list(all_queries()))} registered queries, "
        f"window {WINDOW}, upcoming round r{upcoming}, max staleness {MAX_STALENESS}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
