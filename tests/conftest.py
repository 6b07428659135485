from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_event_streaming_pipeline_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED


def uncommit_newest_epoch(ckpt: str) -> str:
    """Failure injection for streaming tests: erase the newest epoch's
    commit marker (and its Hadoop checksum sidecar — a stale .crc makes
    the replayed commit's atomic create fail) so a restarted query
    replays that epoch. Returns the replayed batch id as a string."""
    commits = os.path.join(ckpt, "commits")
    newest = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.remove(os.path.join(commits, newest))
    crc = os.path.join(commits, f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return newest
