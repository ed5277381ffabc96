"""Collect eval-job results (port of launcher_*_eval_collect.py): scrape
mAP values from the text logs of eval jobs."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from os2d_tpu.utils.logger import extract_map_value_from_os2d_log

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--log-root", type=str, default="output/eval")
    parser.add_argument("--metric", type=str, default="mAP@0.50")
    args = parser.parse_args()

    print(f"{'dataset':<25} {'log':<50} {args.metric:>10}")
    for log_file in sorted(glob.glob(os.path.join(args.log_root, "*", "*out.txt"))):
        dataset = os.path.basename(os.path.dirname(log_file))
        value = extract_map_value_from_os2d_log(log_file, dataset, args.metric)
        print(f"{dataset:<25} {os.path.basename(log_file):<50} "
              f"{value if value is not None else 'n/a':>10}")
