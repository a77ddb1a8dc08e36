"""ADA margin A/B (VERDICT r2 #10): full synthetic-recipe e2e at margin 64
(default) vs 224 (full rotation border parity), same seeds, FID deltas.

Runs `bench.py --e2e` twice, preserving each run's stats.jsonl / best_fid.txt
under /tmp/rick_margin_ab/<label>/ and printing a summary table.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = "/tmp/rick_e2e"
EXP = os.path.join(ROOT, "_output", "e2e")
OUT = "/tmp/rick_margin_ab"


def fid_trail(stats_path):
    out = []
    if not os.path.exists(stats_path):
        return out
    with open(stats_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "fid" in rec:
                out.append((rec.get("step", -1), rec["fid"]))
    return out


def run(label, extra_args):
    env = dict(os.environ)
    if extra_args:
        env["RICK_E2E_ARGS"] = extra_args
    else:
        env.pop("RICK_E2E_ARGS", None)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py", "--e2e"],
        env=env, capture_output=True, text=True, cwd="/root/repo",
    )
    wall = time.time() - t0
    dst = os.path.join(OUT, label)
    os.makedirs(dst, exist_ok=True)
    for name in ("stats.jsonl", "best_fid.txt", "args.txt"):
        src = os.path.join(EXP, name)
        if os.path.exists(src):
            shutil.copy(src, dst)
    with open(os.path.join(dst, "bench_stdout.txt"), "w") as f:
        f.write(p.stdout + "\n--- stderr tail ---\n" + p.stderr[-2000:])
    print(f"[{label}] rc={p.returncode} wall={wall/60:.1f} min")
    if p.returncode != 0:
        print(f"[{label}] FAILED — stderr tail:\n{p.stderr[-3000:]}")
        raise RuntimeError(f"{label} arm failed rc={p.returncode}")
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if line:
        print(f"[{label}] {line[-1]}")
    trail = fid_trail(os.path.join(dst, "stats.jsonl"))
    best = min(v for _, v in trail) if trail else float("nan")
    final = trail[-1][1] if trail else float("nan")
    print(f"[{label}] best FID {best:.3f}  final FID {final:.3f}  ({len(trail)} evals)")
    return best, final, wall


def main():
    os.makedirs(OUT, exist_ok=True)
    # MARGIN_AB_BASE lets a time-bounded environment shrink both arms
    # identically (e.g. "--iter 1000"); the A/B stays like-for-like.
    base = os.environ.get("MARGIN_AB_BASE", "").strip()
    # MARGIN_AB_SEEDS runs the pair at several train seeds (VERDICT r4 #3:
    # one seed pair is inadequate evidence for a default).  Default seed 1 is
    # the CLI's own default -- the round-3 pair used it, so extra runs here
    # add NEW seed pairs to that table.
    seeds = [s for s in os.environ.get("MARGIN_AB_SEEDS", "").split() if s]
    if not seeds:
        seeds = ["1"]
    summary = {}
    for seed in seeds:
        seed_arg = f"--seed {seed}" if seed != "1" else ""
        tag = f"_s{seed}" if seed != "1" else ""
        r64 = run(f"margin64{tag}", (base + " " + seed_arg).strip())
        r224 = run(
            f"margin224{tag}", (base + " " + seed_arg + " --ada_margin 224").strip()
        )
        print(f"\nmargin A/B (seed {seed}):")
        print(f"  margin  64: best {r64[0]:.3f}  final {r64[1]:.3f}  wall {r64[2]/60:.1f} min")
        print(f"  margin 224: best {r224[0]:.3f}  final {r224[1]:.3f}  wall {r224[2]/60:.1f} min")
        summary[f"margin64{tag}"] = {
            "best_fid": r64[0], "final_fid": r64[1], "wall_min": r64[2] / 60,
        }
        summary[f"margin224{tag}"] = {
            "best_fid": r224[0], "final_fid": r224[1], "wall_min": r224[2] / 60,
        }
        # write after each pair: a timeout still leaves complete pairs on disk
        with open(os.path.join(OUT, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
