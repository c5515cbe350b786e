import json

import jax.numpy as jnp

from sfd2_tpu.utils.profiling import StageTimer, device_time


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    t.dump(tmp_path / "p.json")
    assert json.loads((tmp_path / "p.json").read_text())["a"]["count"] == 2


def test_device_time_runs():
    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    dt = device_time(f, x, iters=2)
    assert dt > 0
