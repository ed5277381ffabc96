"""Parity runbook plumbing (tools/parity_release.py, VERDICT r2 item 3).

The real released checkpoints / GroZi data are not downloadable in this
environment, so the north-star 90.65-mAP gate itself cannot run here; this
test certifies that the one-command runbook WORKS end to end — checkpoint
cascade load, reference-layout dataset build, full eval protocol, JSON
verdict and exit semantics — on a synthetic grozi tree and a synthetic
reference-format checkpoint, so the gate is zero-work once artifacts exist.
"""

import json
import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.dirname(__file__))

from test_checkpoint_import import build_reference_like_state_dict
from test_main_cli import IMG_W, write_grozi_tree

from tools import parity_release


@pytest.mark.slow
def test_parity_runbook_end_to_end(tmp_path, monkeypatch, capsys):
    data_path = str(tmp_path / "data")
    write_grozi_tree(data_path)

    rng = np.random.RandomState(0)
    _, _, sd = build_reference_like_state_dict(rng)
    ckpt_path = str(tmp_path / "os2d_v2-train.pth")
    torch.save({"net": {k: torch.as_tensor(v) for k, v in sd.items()}},
               ckpt_path)

    # shrink the protocol to test scale: synthetic 480px tree, 2-level pyramid
    monkeypatch.setattr(parity_release, "SCALE", IMG_W)
    monkeypatch.setattr(parity_release, "ROWS", {
        "v2-train": ("os2d_v2-train.pth", 90.65, {},
                     {"scales_of_image_pyramid": [0.8, 1.0]}),
    })

    def run(argv):
        monkeypatch.setattr(sys, "argv", ["parity_release.py"] + argv)
        with pytest.raises(SystemExit) as e:
            parity_release.main()
        out = capsys.readouterr().out.strip().splitlines()
        return e.value.code, [json.loads(line) for line in out if
                              line.startswith("{")]

    # generous tolerance: the runbook must report PASS and exit 0
    rc, lines = run(["--row", "v2-train", "--checkpoint", ckpt_path,
                     "--data-path", data_path, "--tol", "100"])
    assert rc == 0
    row_line, gate_line = lines[-2], lines[-1]
    assert row_line["row"] == "v2-train" and row_line["pass"] is True
    assert 0.0 <= row_line["mAP@0.50"] <= 100.0
    assert gate_line["parity_gate"] == "PASS"

    # strict tolerance against the real 90.65 target: random-ish weights
    # cannot hit it, so the gate must FAIL with exit code 1
    rc, lines = run(["--row", "v2-train", "--checkpoint", ckpt_path,
                     "--data-path", data_path, "--tol", "0.0"])
    assert rc == 1
    assert lines[-1]["parity_gate"] == "FAIL"

    # --models-dir resolution by release filename
    rc, lines = run(["--rows", "v2-train", "--models-dir", str(tmp_path),
                     "--data-path", data_path, "--tol", "100"])
    assert rc == 0 and lines[-1]["parity_gate"] == "PASS"
