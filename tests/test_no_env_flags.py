"""The model/ops hot path must carry no environment-variable switches.

VERDICT r3 item 4: A/B experiment env flags (OS2D_CORR_PERM, OS2D_CORR_PAD,
OS2D_T_CHUNK, OS2D_RESAMPLE_WFIRST, OS2D_HAT_BF16, OS2D_R_BF16,
OS2D_HAT_BARRIER) silently changed numerics/perf of the core kernel. The
shipping knobs are now config-owned (Os2dConfig.corr_interior_first,
Os2dConfig.resample_t_chunk); the measured-dead branches were deleted
(their records live in BENCH_NOTES.md). The reference's hot path has no env
switches either (os2d/modeling/head.py:271-435).
"""

import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "os2d_tpu"


def _env_reads(subdir):
    hits = []
    for py in sorted((PKG / subdir).rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if "environ" in line and not line.lstrip().startswith("#"):
                hits.append(f"{py.relative_to(PKG.parent)}:{i}: {line.strip()}")
    return hits


def test_models_and_ops_have_no_env_reads():
    hits = _env_reads("models") + _env_reads("ops")
    assert not hits, "env switches in the hot path:\n" + "\n".join(hits)


def test_structures_have_no_env_reads():
    assert not _env_reads("structures")
