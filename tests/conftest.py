import os

import pytest
import ray

# One aggregator per hash-shuffle join in tests: every join spins
# num_partitions aggregator actors PER EXECUTION (~0.9 s fixed at the
# production default of 8 on this host vs ~0.54 s at 1), and the
# iterative graph tests run dozens of joins over toy inputs — this knob
# alone cuts the suite's wall-clock by minutes without touching any
# semantics (tier-equality tests pin results at any width). Must be set
# before the engine modules are imported (JOIN_PARTS is read at
# fastagg import time).
os.environ.setdefault("FCRAY_JOIN_PARTS", "1")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("FCRAY_TEST_CPUS", "4")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
