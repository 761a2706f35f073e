"""Graceful preemption of a training run (SIGTERM -> checkpoint -> rc 75).

TPU reservations get preempted and the supervisor (tools/supervise_train.py)
stops runs on purpose; tools/train.py must save a full checkpoint at the
CURRENT step on SIGTERM and exit PREEMPTED_RC (75, EX_TEMPFAIL) — distinct
from 0 so the supervisor relaunches with --resume instead of reporting a
false completion, and distinct from a crash so it skips the backoff.  At
most one in-flight step is lost instead of up to --ckpt-every epochs.  No
reference counterpart: ``trainval_net.py`` (SURVEY.md §3.2) loses
everything since its last per-epoch save.

Subprocess-isolated like tests/test_cli_e2e.py; forces --platform cpu.
"""

import os
import select
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigterm_checkpoints_current_step(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    proc = subprocess.Popen(
        [sys.executable, "tools/train.py", "--tiny", "--synthetic", "8",
         "--batch-per-device", "4", "--epochs", "500",
         "--ckpt-dir", ckpt, "--ckpt-every", "1000",
         "--disp-interval", "1", "--platform", "cpu"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1)
    lines = []
    deadline = time.time() + 1200  # cold XLA:CPU compile dominates
    try:
        # Wait until training demonstrably stepped, then preempt.  Poll
        # with select so the deadline fires even if the child hangs
        # silently (a blocking ``for line in proc.stdout`` would wait
        # forever on a wedged child and hang the whole suite).
        stepped = False
        while not stepped:
            if time.time() > deadline:
                raise AssertionError(
                    "no training step before deadline\n" + "".join(lines))
            ready, _, _ = select.select([proc.stdout], [], [], 10.0)
            if not ready:
                continue
            line = proc.stdout.readline()
            if not line:
                raise AssertionError(
                    "train.py exited before stepping\n" + "".join(lines))
            lines.append(line)
            stepped = "[step " in line
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=600)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    full = "".join(lines)
    assert proc.returncode == 75, f"rc={proc.returncode}\n{full}"
    assert "preempted at step" in full, full
    # The save is restorable and at the step the run reached (not a stale
    # epoch boundary): with --ckpt-every 1000 only the preemption saves.
    sys.path.insert(0, REPO)
    from stereo_rcnn_tpu.train.checkpoint import latest_step
    saved = latest_step(ckpt)
    assert saved is not None and saved >= 1
    assert os.path.isdir(os.path.join(ckpt, "params_export"))
