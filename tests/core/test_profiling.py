"""Stage-timing / profiling hooks (SURVEY §5.1 aux subsystem)."""

import numpy as np

from pylinac_tpu import profiling
from pylinac_tpu.parallel import QABatchRunner


def test_noop_without_collector():
    with profiling.stage("anything"):
        x = 1 + 1
    assert x == 2


def test_collect_nested_stages():
    with profiling.collect() as times:
        with profiling.stage("a"):
            pass
        with profiling.stage("b"):
            with profiling.stage("a"):
                pass
    agg = times.as_dict()
    assert set(agg) == {"a", "b"}
    assert len(times.stages) == 3
    assert "total" in times.report()


def test_batch_runner_records_stages():
    imgs = np.random.default_rng(0).random((8, 64, 64)).astype(np.float32) * 100
    # add a clear central field so metrics are physical
    imgs[:, 16:48, 16:48] += 1000
    runner = QABatchRunner()
    with profiling.collect() as times:
        metrics, mean_width = runner.run(imgs)
    assert {"bucket+pad", "sharded_compute"} <= set(times.as_dict())
    assert times.total() > 0
