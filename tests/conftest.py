from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_event_streaming_pipeline_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

# A usable google.protobuf lives vendored inside the gcloud SDK on this
# image (no installs allowed). Spark 4's transformWithStateInPandas
# needs it for the worker<->JVM state protocol.
_VENDORED_PROTOBUF = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def enable_vendored_protobuf() -> bool:
    """Make google.protobuf importable in the driver AND in pyspark
    worker processes, using the SDK-vendored runtime (6.32). The pb2
    gencode pyspark ships is 6.33 — one minor ahead — so protobuf's
    own documented escape hatch env var disables the strict
    runtime>=gencode check (the StateMessage wire format is unchanged
    between the two; the TWS test then verifies the whole protocol
    end-to-end against batch results). Must run BEFORE the JVM starts
    so workers inherit the env. Returns False when unavailable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True  # a real protobuf is installed; nothing to do
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_VENDORED_PROTOBUF, "google", "protobuf")):
        return False
    os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
    pp = os.environ.get("PYTHONPATH", "")
    if _VENDORED_PROTOBUF not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pp + os.pathsep + _VENDORED_PROTOBUF if pp else _VENDORED_PROTOBUF
        )
    if _VENDORED_PROTOBUF not in sys.path:
        sys.path.append(_VENDORED_PROTOBUF)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="session")
def spark():
    # before the JVM: worker processes inherit PYTHONPATH from it
    enable_vendored_protobuf()
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
