"""Collect exp1 results into a table (port of launcher_exp1_collect.py:1-40):
scrape the best mAP@0.50 from each job's train_log.pkl."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import pickle

from os2d_tpu.utils.logger import mine_log_value

if __name__ == "__main__":
    log_root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "output/exp1")
    )
    rows = []
    if os.path.isdir(log_root):
        for job_dir in sorted(os.listdir(log_root)):
            log_file = os.path.join(log_root, job_dir, "train_log.pkl")
            if not os.path.isfile(log_file):
                continue
            with open(log_file, "rb") as f:
                full_log = pickle.load(f)
            value = mine_log_value(full_log, "mAP@0.50_grozi-val-new-cl", "max")
            rows.append((job_dir, value))
    print(f"{'job':<90} {'best mAP@0.50':>14}")
    for job, value in rows:
        print(f"{job:<90} {value if value is not None else 'n/a':>14}")
