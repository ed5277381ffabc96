"""Experiment 3: INSTRE training (reference launcher_exp3_instre.py).

Thin alias over launcher_instre_eval.py --train, which queues the
INSTRE-S1/S2 training jobs (dataset scales 700/600, val on the held-out
class splits).
"""

import os
import subprocess
import sys

if __name__ == "__main__":
    script = os.path.join(os.path.dirname(__file__), "launcher_instre_eval.py")
    sys.exit(
        subprocess.call([sys.executable, script, "--train"] + sys.argv[1:])
    )
