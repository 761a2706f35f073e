#!/usr/bin/env python
"""Training-run supervisor: keep a long training run alive across TPU
backend outages.

The shared TPU backend is reached through a tunneled terminal that can
wedge (observed in round 3: a client killed during a multi-minute
checkpoint readback left the terminal's session lock held, and every
later PJRT client creation hung forever).  A long training run therefore
needs an external supervisor that (a) detects a stalled/hung run, (b)
kills it BY PID (never by pattern), and (c) relaunches it with
``--resume`` after a backoff — so one command survives any outage:

  python tools/supervise_train.py --ckpt-dir runs/bench_ckpt -- \
      --config configs/synthetic_fullres.yml --synthetic 504 \
      --ckpt-dir runs/bench_ckpt --ckpt-every 16

Everything after ``--`` is passed to ``tools/train.py`` verbatim
(``--resume`` is appended automatically on every attempt; train.py
ignores it when no checkpoint exists yet).

Stall detection: "activity" is the newest of (last stdout/stderr line
from the child, newest mtime under the synthetic-pool cache, newest
mtime under the checkpoint dir).  Long silent phases are NORMAL — a cold
XLA compile is minutes, a full-state checkpoint readback through the
~5 MB/s tunnel is multi-minute — so the default stall timeout is 30
minutes.  A child that exits non-zero (backend claim failed, OOM, ...)
is retried with exponential backoff; a child that exits 0 ends the
supervision successfully.

Reproducibility note (the committed contract for the bench checkpoint
run): the synthetic scene pool is a pure function of the effective
config + batch index — ``tools/train.py`` renders scene batch ``s`` with
``synthetic_batch(cfg, global_batch, seed=s)`` and caches it under
``runs/synth_pool/v3_{H}x{W}_b{batch}_g{max_gt}_s{s}.npz``.  A fresh VM
re-renders the IDENTICAL pool from the repo alone (no state to migrate);
the cache only saves the ~35 s/batch render time.

No reference counterpart: the reference's ``trainval_net.py`` (SURVEY.md
§3.2) is baby-sat by a human; checkpoint-resume (`--r`) is its only
recovery story.
"""

import argparse
import os
import select
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# train.py exits with this (EX_TEMPFAIL) after a SIGTERM-triggered
# graceful checkpoint: incomplete-but-resumable, not a completion and
# not a crash.  Kept in sync with tools/train.py::PREEMPTED_RC.
PREEMPTED_RC = 75


def parse_args():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--ckpt-dir", required=True,
                   help="checkpoint dir of the supervised run (watched for "
                        "activity; must match the --ckpt-dir passed to "
                        "train.py after --)")
    p.add_argument("--stall-timeout", type=float, default=1800.0,
                   help="seconds without child output OR file activity "
                        "before the child is declared wedged and killed")
    p.add_argument("--max-attempts", type=int, default=20)
    p.add_argument("--backoff", type=float, default=60.0,
                   help="initial retry backoff (doubles up to 15 min)")
    p.add_argument("--max-hours", type=float, default=0.0,
                   help="give up after this many hours total (0 = no cap)")
    p.add_argument("--term-grace", type=float, default=600.0,
                   help="seconds to wait after SIGTERM before SIGKILL; "
                        "must cover train.py's graceful-preemption save "
                        "(a full-state readback through the ~5 MB/s "
                        "tunnel is multi-minute)")
    p.add_argument("train_args", nargs=argparse.REMAINDER,
                   help="-- then arguments for tools/train.py")
    args = p.parse_args()
    if args.train_args and args.train_args[0] == "--":
        args.train_args = args.train_args[1:]
    if not args.train_args:
        p.error("pass train.py arguments after --")
    return args


def _newest_mtime(path: str) -> float:
    newest = 0.0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
            except OSError:
                pass
    return newest


def _kill_tree(proc: subprocess.Popen, term_grace: float = 600.0) -> None:
    """Kill the child's process group by pgid — never by name pattern.

    SIGTERM first with a grace long enough for train.py's
    graceful-preemption checkpoint (a multi-minute full-state save through
    the tunneled backend); only then SIGKILL.  A 30 s grace here would
    kill the checkpoint mid-write, defeating the SIGTERM handler.
    """
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, term_grace),
                       (signal.SIGKILL, 30.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        try:
            proc.wait(timeout=grace)
            return
        except subprocess.TimeoutExpired:
            continue


def run_attempt(args, attempt: int) -> int:
    """One supervised train.py run.  Returns the child's exit code, or -1
    if it was killed for stalling."""
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"),
           *args.train_args]
    if "--resume" not in cmd:
        cmd.append("--resume")
    print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1, start_new_session=True)
    watch = [os.path.join(REPO, "runs", "synth_pool"), args.ckpt_dir]
    last_activity = time.time()
    try:
        while True:
            ready, _, _ = select.select([proc.stdout], [], [], 30.0)
            if ready:
                line = proc.stdout.readline()
                if line:
                    sys.stdout.write(line)
                    sys.stdout.flush()
                    last_activity = time.time()
                    continue
                # EOF: child exited (or closed stdout) — collect rc.
                return proc.wait()
            file_act = max((_newest_mtime(w) for w in watch
                            if os.path.isdir(w)), default=0.0)
            last_activity = max(last_activity, file_act)
            if time.time() - last_activity > args.stall_timeout:
                print(f"[supervise] no activity for "
                      f"{args.stall_timeout:.0f}s — killing pid "
                      f"{proc.pid} (wedged backend?)", flush=True)
                _kill_tree(proc, args.term_grace)
                return -1
    finally:
        if proc.poll() is None:
            _kill_tree(proc, args.term_grace)


def main():
    args = parse_args()
    t0 = time.time()
    backoff = args.backoff
    for attempt in range(1, args.max_attempts + 1):
        rc = run_attempt(args, attempt)
        if rc == 0:
            print(f"[supervise] training completed "
                  f"(total {(time.time() - t0) / 3600:.2f} h)", flush=True)
            return 0
        if args.max_hours and (time.time() - t0) > args.max_hours * 3600:
            print("[supervise] time budget exhausted; giving up", flush=True)
            return 2
        if rc == PREEMPTED_RC:
            # "Preempted after a successful checkpoint" (train.py's
            # EX_TEMPFAIL contract): the run is incomplete but cleanly
            # resumable — relaunch immediately, no backoff, and reset the
            # backoff ladder (this was not a crash).
            print(f"[supervise] attempt {attempt} preempted with a saved "
                  f"checkpoint; resuming immediately", flush=True)
            backoff = args.backoff
            continue
        print(f"[supervise] attempt {attempt} ended rc={rc}; retrying in "
              f"{backoff:.0f}s", flush=True)
        time.sleep(backoff)
        backoff = min(backoff * 2, 900.0)
    print("[supervise] max attempts exhausted", flush=True)
    return 2


if __name__ == "__main__":
    sys.exit(main())
