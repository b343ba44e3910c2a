"""The bench probe-retry wrapper (bench.py::_probe_with_retry).

The driver runs bench.py once at round end; the axon tunnel flaps
(minutes-long dropouts between UP windows), so the wrapper must survive a
transient dropout and still give up within its window when the tunnel is
hard-down. Pinned with a stubbed probe — the real probe needs the device.
"""

import importlib.util
import time


def _load_bench():
    repo = __file__.rsplit("/tests/", 1)[0]
    spec = importlib.util.spec_from_file_location("benchmod", f"{repo}/bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_probe_retry_recovers_from_flaps():
    m = _load_bench()
    calls = {"n": 0}
    m._probe_device = lambda each: (calls.__setitem__("n", calls["n"] + 1)
                                    or calls["n"] >= 3)
    assert m._probe_with_retry(window_s=60, each_s=0.01, sleep_s=0.0) is True
    assert calls["n"] == 3


def test_probe_retry_bounded_give_up():
    m = _load_bench()
    m._probe_device = lambda each: False
    t0 = time.monotonic()
    assert m._probe_with_retry(window_s=0.2, each_s=0.01, sleep_s=0.01) is False
    assert time.monotonic() - t0 < 5.0
