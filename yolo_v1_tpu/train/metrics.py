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
    def __init__(
        self,
        base_path: str,
        filename: str = "metrics.csv",
        logger=None,
        resume: bool = False,
    ):
        os.makedirs(base_path, exist_ok=True)
        self.path = os.path.join(base_path, filename)
        self.logger = logger
        self._steps: dict[str, int] = defaultdict(int)
        self.history: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._images: dict[str, str] = {}  # name -> latest relative path
        if not resume and os.path.exists(self.path):
            # Fresh run into a reused save_dir: rotate the old CSV aside so
            # the two runs' series don't interleave.
            base, ext = os.path.splitext(self.path)
            n = 1
            while os.path.exists(f"{base}.{n}{ext}"):
                n += 1
            os.rename(self.path, f"{base}.{n}{ext}")
        # Resumed run: reload prior series so auto-increment continues where
        # it left off instead of rewriting steps 0,1,2... into the same CSV.
        if resume and os.path.exists(self.path):
            with open(self.path, newline="") as f:
                for row in csv.reader(f):
                    if len(row) != 4 or row[0] == "wallclock":
                        continue
                    _, name, step, value = row
                    step = int(step)
                    self.history[name].append((step, float(value)))
                    self._steps[name] = max(self._steps[name], step + 1)
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

    def img(self, name: str, image) -> None:
        """Record an image panel (the reference's ``Visual.img`` visdom
        window, visual.py:35-40): JPEG under ``panels/`` with an
        auto-incrementing step, embedded in the dashboard HTML."""
        import cv2
        import numpy as np

        step = self._steps[f"img:{name}"]
        self._steps[f"img:{name}"] = step + 1
        panel_dir = os.path.join(os.path.dirname(self.path), "panels")
        os.makedirs(panel_dir, exist_ok=True)
        path = os.path.join(panel_dir, f"{name}_{step:05d}.jpg")
        cv2.imwrite(path, cv2.cvtColor(np.asarray(image), cv2.COLOR_RGB2BGR))
        self._images[name] = os.path.join("panels", f"{name}_{step:05d}.jpg")

    def render_html(self, filename: str = "dashboard.html") -> str:
        """Write a self-contained SVG dashboard of all series — the offline
        stand-in for the reference's live visdom panels (visual.py:25-33)."""
        path = os.path.join(os.path.dirname(self.path), filename)
        panels = []
        for name, points in sorted(self.history.items()):
            if not points:
                continue
            xs = [p[0] for p in points]
            ys = [p[1] for p in points]
            x0, x1 = min(xs), max(xs) or 1
            y0, y1 = min(ys), max(ys)
            if y1 == y0:
                y1 = y0 + 1.0
            W, H, pad = 360, 160, 28
            def sx(x):
                return pad + (W - 2 * pad) * (x - x0) / max(x1 - x0, 1)
            def sy(y):
                return H - pad - (H - 2 * pad) * (y - y0) / (y1 - y0)
            pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
            panels.append(
                f"<div class='p'><h3>{name}</h3>"
                f"<svg width='{W}' height='{H}'>"
                f"<polyline points='{pts}' fill='none' stroke='#36c' "
                f"stroke-width='1.5'/>"
                f"<text x='{pad}' y='12' class='t'>last: {ys[-1]:.5g}"
                f"  min: {min(ys):.5g}  max: {max(ys):.5g}</text></svg></div>"
            )
        for name, rel in sorted(self._images.items()):
            panels.append(
                f"<div class='p'><h3>{name}</h3>"
                f"<img src='{rel}' style='max-width:720px'/></div>"
            )
        html = (
            "<html><head><style>body{font-family:sans-serif;display:flex;"
            "flex-wrap:wrap}.p{margin:8px;border:1px solid #ddd;padding:4px}"
            "h3{margin:2px;font-size:13px}.t{font-size:10px;fill:#666}"
            "</style></head><body>" + "".join(panels) + "</body></html>"
        )
        with open(path, "w") as f:
            f.write(html)
        return path

    def close(self) -> None:
        self._fh.close()
