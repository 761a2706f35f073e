"""The multichip dryrun's phase ordering reads driver evidence from the
committed MULTICHIP_r*.json records (tails) so the phase WITHOUT recent
driver validation gets the cold-compile budget first on any host.  Runs
the parser in a subprocess — importing __graft_entry__ mutates XLA flags
and the compile-cache config, which must not leak into this test session.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _evidence_in(tmp_path, records):
    for name, rec in records.items():
        with open(tmp_path / name, "w") as f:
            json.dump(rec, f)
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "import __graft_entry__ as g; print(g._phase_evidence(sys.argv[2]))",
         os.path.abspath(REPO), str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    lines = out.stdout.splitlines()
    return lines[-1].strip() if lines else ""


def test_latest_ok_round_wins(tmp_path):
    ev = _evidence_in(tmp_path, {
        "MULTICHIP_r01.json": {"ok": True, "tail": "OK, loss=60.1, step=1"},
        "MULTICHIP_r02.json": {"ok": False, "tail": ""},
        "MULTICHIP_r03.json": {"ok": True,
                               "tail": "train OK, loss=827\nskipping"},
    })
    assert ev == "train"


def test_inference_evidence_detected(tmp_path):
    ev = _evidence_in(tmp_path, {
        "MULTICHIP_r03.json": {"ok": True, "tail": "train OK, loss=1"},
        "MULTICHIP_r04.json": {
            "ok": True, "tail": "dryrun_multichip(8): inference OK"},
    })
    assert ev == "inference"


def test_failed_rounds_ignored(tmp_path):
    ev = _evidence_in(tmp_path, {
        "MULTICHIP_r02.json": {"ok": False, "tail": "train OK, loss=9"},
    })
    assert ev == ""
