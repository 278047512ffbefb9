"""Summarize a training run's metrics.csv for docs: loss/mAP trajectory,
best epochs, LR-phase boundaries, epoch timing from train.log.

Usage: python tools/summarize_run.py runs/synth_r50_s7
"""

from __future__ import annotations

import csv
import re
import sys
from collections import defaultdict


def load_series(path: str) -> dict[str, list[tuple[int, float]]]:
    series = defaultdict(list)
    with open(path) as f:
        for row in csv.DictReader(f):
            series[row["series"]].append(
                (int(row["step"]), float(row["value"]))
            )
    return series


def epoch_times(log_path: str) -> list[float]:
    pat = re.compile(r"Epoch (\d+) finished, avg loss [\d.]+, ([\d.]+)s")
    times = []
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                times.append(float(m.group(2)))
    return times


def main(run_dir: str) -> None:
    series = load_series(f"{run_dir}/metrics.csv")
    loss = dict(series["train loss"])
    little = dict(series["little mAP"])
    full = dict(series["mAP"])
    epochs = sorted(loss)
    print(f"epochs completed: {len(epochs)} (last index {epochs[-1]})")
    times = epoch_times(f"{run_dir}/train.log")
    steady = sorted(times)[: max(1, int(len(times) * 0.8))]
    print(
        f"epoch wall: median {sorted(times)[len(times)//2]:.1f}s, "
        f"steady mean {sum(steady)/len(steady):.1f}s over {len(times)} epochs"
    )
    best_full = max(full.items(), key=lambda kv: kv[1]) if full else (0, 0.0)
    best_little = max(little.items(), key=lambda kv: kv[1])
    print(f"best full mAP {best_full[1]:.5f} @ epoch {best_full[0] + 1}")
    print(f"best little mAP {best_little[1]:.5f} @ epoch {best_little[0] + 1}")
    print(f"final loss {loss[epochs[-1]]:.4f}, min loss {min(loss.values()):.4f}")
    print("\n| epoch | train loss | little mAP | full mAP (gated) |")
    print("|---|---|---|---|")
    marks = sorted(
        {1, 2, 5, 10, 20, 40, 75, 76, 100, 115, 116, 130, epochs[-1] + 1}
    )
    for e1 in marks:
        e = e1 - 1
        if e not in loss:
            continue
        fm = f"{full[e]:.4f}" if full.get(e, 0) > 0 else "—"
        print(
            f"| {e1} | {loss[e]:.4f} | {little.get(e, float('nan')):.4f} "
            f"| {fm} |"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/synth_r50_s7")
