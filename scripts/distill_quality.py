"""Distill a training run's logs into artifacts/<name>/QUALITY.md + copies
of psnr.json / train_log.json / cfg_args.json (round-end evidence pipeline).

Usage: python scripts/distill_quality.py /tmp/run_flagship artifacts/run_flagship_r3
"""
import json
import os
import shutil
import sys


def main():
    run = sys.argv[1]
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    for f in ("psnr.json", "train_log.json", "cfg_args.json", "metric.txt",
              "env1.png", "env2.png"):
        p = os.path.join(run, f)
        if os.path.exists(p):
            shutil.copy2(p, out)

    log = json.load(open(os.path.join(run, "train_log.json")))
    psnr = {}
    pj = os.path.join(run, "psnr.json")
    if os.path.exists(pj):
        raw = json.load(open(pj))
        if isinstance(raw, dict):
            psnr = {int(k): v for k, v in raw.items()}
        else:  # list of {iteration, psnr} records
            psnr = {int(r["iteration"]): r["psnr"] for r in raw}

    lines = ["# Flagship quality evidence (auto-distilled)\n",
             "| iteration | train PSNR | test PSNR | n_alive | loss |",
             "|---|---|---|---|---|"]
    for m in log:
        it = m["iteration"]
        if it % 500 != 0:
            continue
        t = psnr.get(it)
        tcell = f"{t:.2f}" if t is not None else "—"
        lines.append(
            f"| {it} | {m.get('psnr', float('nan')):.2f} | {tcell} | "
            f"{m.get('n_alive', 0)} | {m.get('loss', 0):.4f} |"
        )
    best = max(psnr.values()) if psnr else float("nan")
    lines.append(f"\nBest test PSNR: {best:.2f}")
    with open(os.path.join(out, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}/QUALITY.md (best test PSNR {best:.2f})")


if __name__ == "__main__":
    main()
