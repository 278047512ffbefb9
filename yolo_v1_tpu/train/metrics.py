"""Named-series metric writer — structured replacement for the reference's
visdom dashboard (`/root/reference/utils/visual.py:5-51`).

Same API shape as the reference's ``Visual``: ``plot(name, value)`` appends
to an auto-incrementing per-name series (visual.py:25-33) and ``log(text)``
records a line (visual.py:42-47).  Instead of a visdom HTTP socket, series
go to an append-only CSV (easily plotted or loaded into TensorBoard/pandas)
and text to the python logger.  Series plotted by the reference and
reproduced by the trainer: now-learning-rate, train loss, the four loss
components, little/full mAP (train.py:162, 183, 200-201; v1Loss.py:112-116).
"""

from __future__ import annotations

import csv
import os
import time
from collections import defaultdict


class MetricWriter:
    def __init__(self, base_path: str, filename: str = "metrics.csv", logger=None):
        os.makedirs(base_path, exist_ok=True)
        self.path = os.path.join(base_path, filename)
        self.logger = logger
        self._steps: dict[str, int] = defaultdict(int)
        self.history: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._fh = open(self.path, "a", newline="")
        self._csv = csv.writer(self._fh)
        if self._fh.tell() == 0:
            self._csv.writerow(["wallclock", "series", "step", "value"])

    def plot(self, name: str, value, step: int | None = None) -> None:
        """Append a point to a named series (auto-incrementing x like the
        reference's Visual.plot, visual.py:25-33)."""
        value = float(value)
        if step is None:
            step = self._steps[name]
        self._steps[name] = step + 1
        self.history[name].append((step, value))
        self._csv.writerow([f"{time.time():.3f}", name, step, f"{value:.8g}"])
        self._fh.flush()

    def plot_many(self, values: dict, step: int | None = None) -> None:
        for k, v in values.items():
            self.plot(k, v, step)

    def log(self, text: str) -> None:
        if self.logger:
            self.logger.info(text)

    def close(self) -> None:
        self._fh.close()
