"""Stall watchdog (train/watchdog.py): heartbeat semantics, expiry action,
fit() integration, and the supervised-resume restart loop."""

import subprocess
import sys
import time
from pathlib import Path

import numpy as np

from yolo_v1_tpu.train.watchdog import STALL_EXIT_CODE, StallWatchdog

REPO = Path(__file__).resolve().parent.parent


def test_beats_keep_watchdog_quiet():
    fired = []
    wd = StallWatchdog(0.4, _exit=fired.append)
    wd.start()
    for _ in range(6):
        time.sleep(0.15)
        wd.beat()
    wd.stop()
    assert fired == []


def test_expiry_exits_with_stall_code_and_logs():
    fired, logged = [], []
    wd = StallWatchdog(0.3, log=logged.append, _exit=fired.append)
    wd.start()
    deadline = time.monotonic() + 5.0
    while not fired and time.monotonic() < deadline:
        time.sleep(0.05)  # no beats: must fire well within the deadline
    wd.stop()
    assert fired and fired[0] == STALL_EXIT_CODE
    assert logged and "no training heartbeat" in logged[0]


def test_stop_prevents_late_fire():
    fired = []
    wd = StallWatchdog(0.3, _exit=fired.append)
    wd.start()
    wd.stop()
    time.sleep(0.5)
    assert fired == []


def test_fit_with_watchdog_completes_and_disarms():
    """A normal fit() with the watchdog armed neither fires nor leaks the
    thread (stop() joins it in the finally)."""
    import threading

    import jax

    from tests.test_train import _tiny_setup
    from yolo_v1_tpu.losses.yolov1 import YoloV1LossConfig
    from yolo_v1_tpu.train.loop import FitConfig, fit

    state, images, targets = _tiny_setup()

    def loader(epoch):
        for _ in range(3):
            yield images, targets

    state, result = fit(
        state,
        loader,
        YoloV1LossConfig(S=7),
        config=FitConfig(num_epochs=2, log_every=2, watchdog_timeout_s=60.0),
    )
    assert len(result.epoch_losses) == 2
    assert not any(
        t.name == "stall-watchdog" and t.is_alive()
        for t in threading.enumerate()
    )


def test_train_supervised_restarts_on_stall_code(tmp_path):
    """The supervisor re-runs `cli train` with --resume true exactly while
    the exit code is the watchdog's, then propagates the final code."""
    stub = tmp_path / "stub.py"
    log = tmp_path / "calls.log"
    stub.write_text(
        "import sys, pathlib\n"
        f"log = pathlib.Path({str(log)!r})\n"
        "calls = log.read_text().splitlines() if log.exists() else []\n"
        "calls.append(' '.join(sys.argv[1:]))\n"
        "log.write_text('\\n'.join(calls) + '\\n')\n"
        f"sys.exit({STALL_EXIT_CODE} if len(calls) < 3 else 0)\n"
    )
    wrapper = tmp_path / "python_stub.sh"
    wrapper.write_text(
        f"#!/bin/bash\nexec {sys.executable} {stub} \"${{@:4}}\"\n"
    )  # drop '-m yolo_v1_tpu.cli train', keep the user args
    wrapper.chmod(0o755)
    proc = subprocess.run(
        ["bash", str(REPO / "tools/train_supervised.sh"), "--save_dir", "x"],
        env={"PYTHON": str(wrapper), "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    calls = log.read_text().splitlines()
    assert len(calls) == 3
    assert "--resume true" not in calls[0]
    assert calls[1].endswith("--resume true")
    assert calls[2].endswith("--resume true")
