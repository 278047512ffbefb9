"""The bench's relay-outage gate must fail FAST and still print its one
JSON line (VERDICT r3: round 3's outage burned the whole driver window
inside wait_for_device — six 240 s probes — and the guaranteed error JSON
never printed; the gate's budget must sit strictly inside the driver's).

These tests drive bench.py as a subprocess with YOLO_BENCH_PROBE_CMD
stubbed to a failing/hanging command, so the outage path is exercised
end-to-end without a TPU.
"""

import json
import os
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run_bench(env_extra, timeout=60):
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.monotonic()
    r = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    return r, time.monotonic() - t0


def test_outage_prints_error_json_within_budget():
    """Probe command always fails -> one zeroed-JSON line, within ~budget."""
    r, elapsed = _run_bench({
        "YOLO_BENCH_PROBE_CMD": sys.executable + " -c 'raise SystemExit(1)'",
        "YOLO_BENCH_WAIT_S": "3",
        "YOLO_BENCH_PROBE_TIMEOUT_S": "2",
    })
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["error"] == "tpu_relay_unavailable"
    assert payload["value"] == 0.0
    assert elapsed < 30  # budget 3s + probe/interpreter overhead, not 1440s


def test_outage_hanging_probe_is_timeboxed():
    """A probe that HANGS (the relay's observed failure mode: backend init
    blocks for minutes) is cut at the probe timeout, not the driver's."""
    r, elapsed = _run_bench({
        "YOLO_BENCH_PROBE_CMD":
            sys.executable + " -c 'import time; time.sleep(600)'",
        "YOLO_BENCH_WAIT_S": "2",
        "YOLO_BENCH_PROBE_TIMEOUT_S": "1",
    })
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["error"] == "tpu_relay_unavailable"
    assert elapsed < 30


def test_default_wait_budget_inside_driver_window():
    """The compiled-in defaults must keep the worst-case gate well inside
    any plausible driver timeout (round 3's was >= 1590 s and still hit)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    src = open(BENCH).read()
    assert 'os.environ.get("YOLO_BENCH_WAIT_S", 420)' in src
    assert 'os.environ.get("YOLO_BENCH_PROBE_TIMEOUT_S", 60)' in src


def test_healthy_probe_passes_gate():
    """A succeeding stub probe returns True without touching a device."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod2", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    os.environ["YOLO_BENCH_PROBE_CMD"] = sys.executable + " -c 'print(1)'"
    try:
        assert mod.wait_for_device(max_wait_s=10, probe_timeout_s=10) is True
    finally:
        del os.environ["YOLO_BENCH_PROBE_CMD"]


def test_sigterm_flushes_partial_results():
    """A driver kill (SIGTERM) mid-bench must flush whatever was measured
    as the one JSON line instead of dying silently (the full phase list
    can outlive an unknown driver budget)."""
    code = (
        "import importlib.util, json, os, signal\n"
        f"spec = importlib.util.spec_from_file_location('b', {BENCH!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m.RESULTS.update({'metric': 'x', 'value': 123.0})\n"
        "signal.signal(signal.SIGTERM, m._sigterm_handler)\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "import time; time.sleep(5)\n"  # handler must exit before this
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=30,
    )
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["value"] == 123.0
    assert payload["error"] == "killed_mid_bench_partial_results"
