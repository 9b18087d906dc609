"""Summarize a training log into a PSNR-vs-step table (markdown).

Parses the loop's [TRAIN]/[EVAL] lines (train/loop.py:233-256) and emits the
holdout-PSNR curve at a decimated set of checkpoints plus throughput stats.

Usage: python tools/convergence_report.py <train.log> [--every 10]
"""

import re
import sys


def parse(path):
    train, evals = [], []
    for line in open(path, errors="replace"):
        m = re.search(
            r"\[TRAIN\] Iter: (\d+) Loss: ([\d.e+-]+)\s+PSNR: ([\d.]+)\s+"
            r"\(([\d,]+) rays/s(?:, ([\d.]+)% MFU)?", line
        )
        if m:
            train.append((
                int(m.group(1)), float(m.group(2)), float(m.group(3)),
                float(m.group(4).replace(",", "")),
                float(m.group(5)) if m.group(5) else None,
            ))
        m = re.search(r"\[EVAL\] Iter: (\d+) holdout view (\d+) PSNR: ([\d.]+)", line)
        if m:
            evals.append((int(m.group(1)), int(m.group(2)), float(m.group(3))))
        m = re.search(r"\[EVAL\] mean PSNR over (\d+) views: ([\d.]+)", line)
        if m:
            evals.append((None, int(m.group(1)), float(m.group(2))))
    return train, evals


def main():
    path = sys.argv[1]
    every = 10
    if "--every" in sys.argv:
        every = int(sys.argv[sys.argv.index("--every") + 1])
    train, evals = parse(path)

    print("| step | train PSNR | holdout PSNR | rays/s | MFU |")
    print("|---|---|---|---|---|")
    ev = {s: p for s, _, p in evals if s is not None}
    for i, (step, loss, psnr, rate, mfu) in enumerate(train):
        if i % every and step != train[-1][0]:
            continue
        hold = f"{ev[step]:.2f}" if step in ev else ""
        mfu_s = f"{mfu:.1f}%" if mfu else ""
        print(f"| {step} | {psnr:.2f} | {hold} | {rate:,.0f} | {mfu_s} |")

    testset = [(n, p) for s, n, p in evals if s is None]
    if testset:
        for n, p in testset:
            print(f"\n**Test-set mean PSNR over {n} views: {p:.2f} dB**")


if __name__ == "__main__":
    main()
