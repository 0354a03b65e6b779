"""Distill a training run's logs into artifacts/<name>/QUALITY.md + copies
of psnr.json / train_log.json / cfg_args.json / metric.txt (round-end
evidence pipeline).

The table is keyed on the UNION of test-PSNR marks and train-log marks so no
recorded measurement is ever dropped (round-3 VERDICT: the committed table
missed the run's best rows because it walked only train_log 500-multiples).

Usage: python scripts/distill_quality.py <run_dir> artifacts/<name>
"""
import json
import os
import shutil
import sys


def main():
    run = sys.argv[1]
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    copied = []
    for f in ("psnr.json", "train_log.json", "cfg_args.json", "metric.txt",
              "chkpnt_meta.json", "env1.png", "env2.png"):
        p = os.path.join(run, f)
        if os.path.exists(p):
            shutil.copy2(p, out)
            copied.append(f)
    # Eval artifacts live under <run>/test_eval/ or <run>/test/: metric.txt
    # plus per-map PNG dumps (scripts/eval.py). Copy the metrics file and a
    # small map sample so the round's quality claim is inspectable.
    for sub in ("test", "test_eval", "train"):
        mp = os.path.join(run, sub, "metric.txt")
        if os.path.exists(mp):
            shutil.copy2(mp, os.path.join(out, f"metric_{sub}.txt"))
            copied.append(f"metric_{sub}.txt")

    log_path = os.path.join(run, "train_log.json")
    log = json.load(open(log_path)) if os.path.exists(log_path) else []
    by_iter = {m["iteration"]: m for m in log}
    psnr = {}
    pj = os.path.join(run, "psnr.json")
    if os.path.exists(pj):
        raw = json.load(open(pj))
        if isinstance(raw, dict):
            psnr = {int(k): v for k, v in raw.items()}
        else:  # list of {iteration, psnr} records
            psnr = {int(r["iteration"]): r["psnr"] for r in raw}

    marks = sorted(
        set(psnr) | {it for it in by_iter if it % 500 == 0}
    )
    lines = ["# Flagship quality evidence (auto-distilled)\n",
             "| iteration | train PSNR | test PSNR | n_alive | loss | tracer_overflow |",
             "|---|---|---|---|---|---|"]
    for it in marks:
        m = by_iter.get(it, {})
        t = psnr.get(it)
        tcell = f"{t:.2f}" if t is not None else "—"
        tr = m.get("psnr")
        trcell = f"{tr:.2f}" if tr is not None else "—"
        ov = m.get("tracer_overflow")
        ovcell = f"{int(ov)}" if ov is not None else "—"
        lines.append(
            f"| {it} | {trcell} | {tcell} | {m.get('n_alive', 0) or '—'} | "
            f"{m.get('loss', float('nan')):.4f} | {ovcell} |"
        )
    best = max(psnr.values()) if psnr else float("nan")
    lines.append(f"\nBest test PSNR: {best:.2f}")
    lines.append(f"\nCopied from the run dir: {', '.join(copied) or 'none'}")
    with open(os.path.join(out, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}/QUALITY.md ({len(marks)} marks, best test PSNR {best:.2f})")


if __name__ == "__main__":
    main()
