"""Distill a training run's logs into artifacts/<name>/QUALITY.md + copies
of psnr.json / train_log.json / cfg_args.json / metric.txt (round-end
evidence pipeline).

The table is keyed on the UNION of test-PSNR marks and train-log marks so no
recorded measurement is ever dropped (round-3 VERDICT: the committed table
missed the run's best rows because it walked only train_log 500-multiples).

Round-5 additions (VERDICT r4 items 1/9):
- env-cloud liveness columns (env_n_alive, tracer_pairs): "alive at the last
  mark" must be machine-checkable in the artifact, not prose — the round-4
  flagship's env cloud died silently (tracer_overflow -> 0 read as healthy).
- multiple run dirs merge into ONE timeline (staged/resumed flagships:
  evidence continuous from iteration 1). Later dirs win on mark collisions.

Usage: python scripts/distill_quality.py <run_dir> [<run_dir2> ...] artifacts/<name>
"""
import json
import os
import shutil
import sys


def load_log(run):
    p = os.path.join(run, "train_log.json")
    return json.load(open(p)) if os.path.exists(p) else []


def load_psnr(run):
    p = os.path.join(run, "psnr.json")
    if not os.path.exists(p):
        return {}
    raw = json.load(open(p))
    if isinstance(raw, dict):
        return {int(k): v for k, v in raw.items()}
    return {int(r["iteration"]): r["psnr"] for r in raw}


def main():
    runs = sys.argv[1:-1]
    out = sys.argv[-1]
    os.makedirs(out, exist_ok=True)
    copied = []
    # File artifacts come from the LAST run dir (the most recent stage);
    # psnr/train_log are merged below and re-dumped.
    for f in ("cfg_args.json", "metric.txt", "chkpnt_meta.json",
              "env1.png", "env2.png"):
        p = os.path.join(runs[-1], f)
        if os.path.exists(p):
            shutil.copy2(p, out)
            copied.append(f)
    for sub in ("test", "test_eval", "train"):
        mp = os.path.join(runs[-1], sub, "metric.txt")
        if os.path.exists(mp):
            shutil.copy2(mp, os.path.join(out, f"metric_{sub}.txt"))
            copied.append(f"metric_{sub}.txt")

    by_iter, psnr = {}, {}
    for run in runs:  # later stages override colliding marks
        for m in load_log(run):
            by_iter[m["iteration"]] = m
        psnr.update(load_psnr(run))
    with open(os.path.join(out, "train_log.json"), "w") as f:
        json.dump([by_iter[k] for k in sorted(by_iter)], f)
    with open(os.path.join(out, "psnr.json"), "w") as f:
        json.dump({str(k): psnr[k] for k in sorted(psnr)}, f)
    copied += ["train_log.json (merged)", "psnr.json (merged)"]

    marks = sorted(set(psnr) | {it for it in by_iter if it % 500 == 0})
    lines = [
        "# Flagship quality evidence (auto-distilled)\n",
        "| iteration | train PSNR | test PSNR | n_alive | env_n_alive | "
        "tracer_pairs | tracer_overflow | loss |",
        "|---|---|---|---|---|---|---|---|",
    ]

    def cell(v, fmt="{}"):
        return fmt.format(v) if v is not None else "—"

    for it in marks:
        m = by_iter.get(it, {})
        lines.append(
            "| {} | {} | {} | {} | {} | {} | {} | {} |".format(
                it,
                cell(m.get("psnr"), "{:.2f}"),
                cell(psnr.get(it), "{:.2f}"),
                m.get("n_alive", 0) or "—",
                cell(m.get("env_n_alive")),
                cell(None if m.get("tracer_pairs") is None
                     else int(m["tracer_pairs"])),
                cell(None if m.get("tracer_overflow") is None
                     else int(m["tracer_overflow"])),
                cell(m.get("loss"), "{:.4f}"),
            )
        )
    best = max(psnr.values()) if psnr else float("nan")
    lines.append(f"\nBest test PSNR: {best:.2f}")
    last = by_iter[max(by_iter)] if by_iter else {}
    if last.get("env_n_alive") is not None:
        alive = int(last["env_n_alive"])
        pairs = int(last.get("tracer_pairs", 0))
        verdict = "ALIVE" if alive > 0 and pairs > 0 else "DEAD"
        lines.append(
            f"\nEnv-GS cloud at the final mark ({int(last['iteration'])}): "
            f"**{verdict}** — {alive} alive gaussians, {pairs} traced pairs."
        )
    lines.append(f"\nCopied from the run dir: {', '.join(copied) or 'none'}")
    lines.append(f"\nSource run dirs (merged in order): {', '.join(runs)}")
    with open(os.path.join(out, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}/QUALITY.md ({len(marks)} marks, best test PSNR {best:.2f})")


if __name__ == "__main__":
    main()
