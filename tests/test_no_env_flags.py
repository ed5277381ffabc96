"""The library must carry no environment-variable switches.

VERDICT r3 item 4 / r4 item 5: A/B experiment env flags (OS2D_CORR_PERM,
OS2D_T_CHUNK, OS2D_UPLOAD_SERIALIZE, OS2D_UPLOAD_PIXEL_FORMAT,
OS2D_UPLOAD_STREAMS, ...) silently changed numerics/perf of hot paths. The
shipping knobs are config-owned (Os2dConfig.*, cfg.tpu.*) and threaded as
explicit parameters; env overrides live only in bench.py / tools/ / tests,
which resolve them and pass explicit values into the library. The guard
covers the WHOLE package — the reference hot path has no env switches
either (os2d/modeling/head.py:271-435).

Allowlist (each entry documents why it is not a numerics/perf switch):
- utils/profiling.py OS2D_PROFILE_DIR: opt-in observability hook that only
  selects a trace output directory; it never changes what the program
  computes or how it is scheduled.
- utils/launcher.py / pretrain: reads of standard scheduler variables
  (SLURM_*, cluster rendezvous addresses) mirror the reference launcher
  (os2d/utils/launcher.py) — environment *description*, not switches.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "os2d_tpu"

# (path relative to os2d_tpu/, variable-name regex) pairs that may read env
ALLOWLIST = [
    ("utils/profiling.py", r"OS2D_PROFILE_DIR"),
    ("utils/launcher.py", r"SLURM_|USER|HOME|PATH"),
    ("pretrain/train_imagenet.py", r"SLURM_|MASTER_|COORDINATOR_"),
    ("parallel/mesh.py", r"SLURM_|MASTER_|COORDINATOR_|JAX_"),
]


def _allowed(rel, line):
    for path, pat in ALLOWLIST:
        if rel == path and re.search(pat, line):
            return True
    return False


_ENV_ACCESS = re.compile(r"\bos\.environ\b|\benviron\s*(\[|\.(get|setdefault|pop))")


def _env_reads(subdir):
    hits = []
    for py in sorted((PKG / subdir).rglob("*.py")):
        rel = str(py.relative_to(PKG))
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if _ENV_ACCESS.search(line) and not line.lstrip().startswith("#"):
                if not _allowed(rel, line):
                    hits.append(
                        f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    return hits


def test_package_has_no_env_reads():
    hits = []
    for sub in ("models", "ops", "structures", "engine", "data", "parallel",
                "api", "utils", "pretrain"):
        if (PKG / sub).is_dir():
            hits += _env_reads(sub)
    assert not hits, "env switches in the library:\n" + "\n".join(hits)
