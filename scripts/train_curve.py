"""Render the long-run PSNR-vs-step curve from a --metrics JSONL.

Emits the markdown table published in PERF.md ("Reference training
protocol at scale", round 5) plus leg statistics for the leak-tolerant
supervisor record: per-leg step spans (wall_s resets at each rc-75
restart) and the overall ms/step.

Run: python scripts/train_curve.py runs/r5_long/metrics.jsonl [stride]
"""

import json
import sys


def main():
    path = sys.argv[1]
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    rows = [json.loads(l) for l in open(path) if l.strip()]
    rows = [r for r in rows if "step" in r]
    if not rows:
        print("no metric rows")
        return

    # Leg boundaries: wall_s resets when the supervisor restarts a leg.
    legs = []
    start = 0
    for i in range(1, len(rows)):
        if rows[i]["wall_s"] < rows[i - 1]["wall_s"]:
            legs.append((start, i - 1))
            start = i
    legs.append((start, len(rows) - 1))

    # A kill between checkpoints re-runs (and re-logs) the span since the
    # last checkpoint; keep the LAST occurrence of each step — the one on
    # the surviving optimizer path.
    by_step = {r["step"]: r for r in rows}
    uniq = [by_step[s] for s in sorted(by_step)]

    print("| step | val PSNR (logo_rs, held out) | train loss |")
    print("|---|---|---|")
    picks = {1}
    picks.update(r["step"] for r in uniq if r["step"] % stride == 0)
    picks.add(uniq[-1]["step"])
    for r in uniq:
        if r["step"] in picks:
            print(f"| {r['step']} | {r['val_psnr']:.2f} dB "
                  f"| {r['loss']:.2e} |")

    total_wall = sum(rows[b]["wall_s"] - rows[a]["wall_s"]
                     for a, b in legs)
    total_steps = sum(rows[b]["step"] - rows[a]["step"] for a, b in legs)
    best = max(uniq, key=lambda r: r["val_psnr"])
    spans = ", ".join(f"{rows[a]['step']}..{rows[b]['step']}"
                      for a, b in legs)
    print(f"\nlegs: {len(legs)} ({spans})")
    print(f"in-leg rate: {total_wall / max(1, total_steps) * 1e3:.0f} ms/step "
          f"over {total_steps} steps")
    print(f"best val PSNR: {best['val_psnr']:.2f} dB at step {best['step']}")


if __name__ == "__main__":
    main()
