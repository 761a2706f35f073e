"""Drive the demo CLI end to end (reference ``demo.py`` flow: load pair ->
detect -> solve -> visualise).  Completes the CLI coverage triangle with
tests/test_cli_e2e.py (train + eval): synthetic pair, tiny model, CPU,
must produce a readable PNG with the 2D/3D/BEV panels."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_cli_synthetic(tmp_path):
    out = str(tmp_path / "demo.png")
    proc = subprocess.run(
        [sys.executable, "tools/demo.py", "--synthetic", "--tiny",
         "--platform", "cpu", "--out", out],
        cwd=REPO, timeout=1800, capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"demo failed rc={proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout[-3000:]}\n--- stderr ---\n{proc.stderr[-3000:]}")
    assert os.path.exists(out)
    with open(out, "rb") as f:
        magic = f.read(8)
    assert magic[:4] == b"\x89PNG"
    assert os.path.getsize(out) > 20_000   # non-trivial render
