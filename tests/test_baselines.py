"""Baselines interface, exercised end to end (VERDICT r1 item 10): a real
external detector (plain-torch NCC template matcher, independent of the
os2d_tpu model stack) consumes ONLY the COCO export + query manifest and its
detections score through the framework's VOC evaluator.

This is the TPU-era replacement for the reference's per-baseline dataset
adapters (baselines/CoAE/lib/datasets/os2d.py:20-80,
baselines/detector_retrieval/detector/detector_data.py:20-76).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "baselines")))


def test_external_baseline_end_to_end(tmp_path):
    from run_external_baseline import run_demo

    root = str(tmp_path / "data")
    out = str(tmp_path / "coco")
    coco_json, res_file, metrics = run_demo(root, out)

    assert os.path.isfile(coco_json)
    assert os.path.isfile(res_file)
    assert os.path.isfile(os.path.join(out, "queries", "0.jpg"))
    # template matching on verbatim planted patches must solve the task
    assert metrics["map"] >= 0.5, metrics
