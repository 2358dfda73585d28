"""Summarize a pretrain CSV: loss trajectory + steady-state throughput.

Usage: python tools/summarize_run.py runs/r3_1558m/train_*.csv [--skip N]

Steady state skips the first N train steps (default 2: compile +
first-dispatch effects). Prints one human line and one JSON line.
"""
import argparse
import csv
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    ap.add_argument("--skip", type=int, default=2)
    args = ap.parse_args()

    rows = [r for r in csv.DictReader(open(args.csv_path))
            if r["phase"] == "train"]
    if not rows:
        print("no train rows", file=sys.stderr)
        sys.exit(1)
    losses = [float(r["loss"]) for r in rows]
    toks = [float(r["tok_per_s"]) for r in rows[args.skip:]] or [
        float(r["tok_per_s"]) for r in rows
    ]
    vals = {}
    for r in csv.DictReader(open(args.csv_path)):
        if r["phase"] == "val":
            vals[int(r["step"])] = float(r["loss"])
    out = {
        "steps": len(rows),
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "loss_min": min(losses),
        "tok_s_mean": sum(toks) / len(toks),
        "tok_s_max": max(toks),
        "val": vals,
    }
    print(
        f"{len(rows)} steps, loss {losses[0]:.4f} -> {losses[-1]:.4f} "
        f"(min {min(losses):.4f}), steady tok/s mean "
        f"{out['tok_s_mean']:.0f} max {out['tok_s_max']:.0f}"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
