"""Shared test fixtures.

Ray is initialised ONCE per pytest session (session-scoped fixture);
tests that need a Ray session request ``ray_session``. Pure-function
tests never touch Ray.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_addoption(parser):
    parser.addoption(
        "--shard",
        default=None,
        help=(
            "k/n (1-based): run only the k-th of n deterministic shards. "
            "Tests are assigned by crc32(nodeid) so shards are stable "
            "across runs and balanced across the big parametrized suites. "
            "scripts/test_sharded.sh launches all n shards in parallel "
            "processes (each with its own small Ray session) so the full "
            "suite fits in the per-round time budget on 32 cpus."
        ),
    )


def pytest_collection_modifyitems(config, items):
    shard = config.getoption("--shard")
    if not shard:
        return
    import zlib

    k, n = map(int, shard.split("/"))
    keep, skip = [], []
    for item in items:
        if zlib.crc32(item.nodeid.encode()) % n == (k - 1) % n:
            keep.append(item)
        else:
            skip.append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=skip)


@pytest.fixture(scope="session")
def ray_session(request):
    import ray

    if not ray.is_initialized():
        kwargs = {}
        # sharded runs put n Ray sessions on one box: cap each object
        # store so n shards never overcommit /dev/shm.  8 GiB, not less:
        # a 3 GiB cap sent the 50k-doc dedup scale test into a >15 min
        # spill-churn loop (64 s uncapped) — 8 shards x 8 GiB still fits
        # the 128 GiB box
        if request.config.getoption("--shard"):
            kwargs["object_store_memory"] = 8 * 1024**3
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kwargs,
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
