"""Experiment job launcher: local bash or cluster batch scripts.

Port of os2d/utils/launcher.py:1-291 adapted to TPU fleets: experiment scripts
queue jobs (`add_job`) and launch them locally (bash script + tee) or as
scheduler batch scripts. Besides SLURM (`--slurm`, as in the reference), an
XPK/GKE-style stub (`--xpk`) emits `xpk workload create` commands for TPU
pods. Diagnostics written into each job script cover env, git state, and the
visible JAX devices (instead of gpustat).
"""

from __future__ import annotations

import argparse
import os
import subprocess


def create_args_parser():
    parser = argparse.ArgumentParser(
        description="Launching experiments locally, with SLURM, or with XPK"
    )
    group = parser.add_mutually_exclusive_group(required=False)
    group.add_argument("--job-names", default=None, nargs="+", type=str,
                       help="Launch only jobs with these names")
    group.add_argument("--job-indices", default=None, nargs="+", type=int,
                       help="Launch only jobs with these indices")
    parser.add_argument("--venv", type=str, default=None,
                        help="Activate this virtualenv in the job")
    parser.add_argument("--slurm", action="store_true",
                        help="Prepare sbatch scripts and submit them")
    parser.add_argument("--xpk", action="store_true",
                        help="Emit xpk workload create commands (TPU pods)")
    parser.add_argument("--no-launch", action="store_true",
                        help="Only generate commands, do not run")
    parser.add_argument("-p", "--partition", type=str, default=None,
                        help="SLURM partition / XPK cluster name")
    parser.add_argument("--tpu-type", type=str, default="v5litepod-8",
                        help="TPU accelerator type for XPK jobs")
    parser.add_argument("--num-cpus", type=int, default=4,
                        help="CPUs per job (SLURM) / host threads pinned")
    parser.add_argument("--timeout", type=float, default=None,
                        help="Job timeout in hours")
    parser.add_argument("--exclusive-node", action="store_true")
    parser.add_argument("--exclude-nodes", type=str, nargs="+", default=None)
    parser.add_argument("--nodelist", type=str, default=None)
    parser.add_argument("--stdout-file", type=str, default="out.txt")
    parser.add_argument("--stderr-file", type=str, default="err.txt")
    return parser


def parse_arguments(parser=None):
    return (parser or create_args_parser()).parse_args()


def parameters_to_str(d):
    """OrderedDict of CLI params -> 'k1 v1 k2 v2 ...' (reference launcher)."""
    return " ".join(f"{k} {v}" for k, v in d.items())


JOB_QUEUE_NAMES = []
JOB_QUEUE_PATHS = []
JOB_QUEUE_COMMANDS = []
JOB_QUEUE_LOG_FILE_PREFIX = []


def add_job(job_name="", log_path="", commands="", log_file_prefix=""):
    JOB_QUEUE_NAMES.append(job_name)
    JOB_QUEUE_PATHS.append(log_path)
    JOB_QUEUE_COMMANDS.append(commands)
    JOB_QUEUE_LOG_FILE_PREFIX.append(log_file_prefix)


def _echo_and_execute(out_f, command):
    out_f.write(f'echo "{command}"\n{command}\necho\n')


def _echo_system_info(out_f):
    out_f.write('echo "Working on node `hostname`"\n')
    _echo_and_execute(out_f, "git show -s --pretty=format:'%H' || true")
    _echo_and_execute(
        out_f,
        "python -c \"import jax; print('jax devices:', jax.devices())\" || true",
    )


def _set_num_cpu_threads(out_f, num_cpus):
    out_f.write(f"export EXP_NUM_CPU_THREADS={num_cpus}\n")
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        out_f.write(f"export {var}=${{EXP_NUM_CPU_THREADS}}\n")
    out_f.write("\n")


def run_job_locally(job_command, log_path, args, no_launch=False,
                    log_file_prefix=""):
    cmd_file = os.path.join(log_path, log_file_prefix + "launch.sh")
    with open(cmd_file, "w") as out_f:
        if args.venv:
            out_f.write(f"source {args.venv}/bin/activate\n")
        _echo_system_info(out_f)
        _set_num_cpu_threads(out_f, args.num_cpus)
        out_f.write(job_command + "\n")
        _echo_system_info(out_f)
    stdout_path = os.path.join(log_path, log_file_prefix + args.stdout_file)
    stderr_path = os.path.join(log_path, log_file_prefix + args.stderr_file)
    cmd = f"bash {cmd_file} 2>{stderr_path} | tee -a {stdout_path}"
    _run_cmd(cmd, no_launch)


def run_job_slurm(job_command, log_path, args, job_name=None, no_launch=False,
                  log_file_prefix=""):
    launcher_file = os.path.join(log_path, log_file_prefix + "launch.sh")
    with open(launcher_file, "w") as out_f:
        out_f.write("#!/bin/bash\n")
        if args.exclusive_node:
            out_f.write("#SBATCH --exclusive=user\n")
        if args.partition:
            out_f.write(f"#SBATCH --partition {args.partition}\n")
        out_f.write(f"#SBATCH --cpus-per-task={args.num_cpus}\n")
        if job_name:
            out_f.write(f"#SBATCH --job-name={job_name}\n")
        out_f.write(
            f"#SBATCH --output={os.path.join(log_path, log_file_prefix + args.stdout_file)}\n"
        )
        out_f.write(
            f"#SBATCH --error={os.path.join(log_path, log_file_prefix + args.stderr_file)}\n"
        )
        if args.exclude_nodes:
            out_f.write(f"#SBATCH --exclude={','.join(args.exclude_nodes)}\n")
        if args.nodelist:
            out_f.write(f"#SBATCH --nodelist={args.nodelist}\n")
        if args.timeout:
            out_f.write(f"#SBATCH --time={int(args.timeout * 60)}\n")
        out_f.write("\n")
        if args.venv:
            _echo_and_execute(out_f, f"source {args.venv}/bin/activate")
        _echo_system_info(out_f)
        _set_num_cpu_threads(out_f, args.num_cpus)
        out_f.write(f"{job_command}\n\n")
        _echo_system_info(out_f)
    _run_cmd(f"sbatch {launcher_file}", no_launch)


def run_job_xpk(job_command, log_path, args, job_name=None, no_launch=False,
                log_file_prefix=""):
    """XPK-style TPU pod submission (stub: emits the command; requires a
    configured GKE cluster to actually run)."""
    launcher_file = os.path.join(log_path, log_file_prefix + "launch.sh")
    with open(launcher_file, "w") as out_f:
        out_f.write("#!/bin/bash\n")
        _echo_system_info(out_f)
        out_f.write(f"{job_command}\n")
    cluster = args.partition or "default-cluster"
    cmd = (
        f"xpk workload create --cluster {cluster} "
        f"--workload {job_name or 'os2d-job'} --tpu-type {args.tpu_type} "
        f"--command 'bash {launcher_file}'"
    )
    _run_cmd(cmd, no_launch)


def launch_all_jobs(args):
    for i_job, (job_name, log_path, commands, prefix) in enumerate(
        zip(JOB_QUEUE_NAMES, JOB_QUEUE_PATHS, JOB_QUEUE_COMMANDS,
            JOB_QUEUE_LOG_FILE_PREFIX)
    ):
        selected = (
            (args.job_names is None and args.job_indices is None)
            or (args.job_names is not None and job_name in args.job_names)
            or (args.job_indices is not None and i_job in args.job_indices)
        )
        if not selected:
            continue
        print(
            f"{'Launching' if not args.no_launch else 'Preparing'} job "
            f"#{i_job}: {job_name}"
        )
        if log_path:
            os.makedirs(log_path, exist_ok=True)
        job_command = "\n\n".join(commands)
        if args.slurm:
            run_job_slurm(job_command, log_path, args, job_name=job_name,
                          no_launch=args.no_launch, log_file_prefix=prefix)
        elif args.xpk:
            run_job_xpk(job_command, log_path, args, job_name=job_name,
                        no_launch=args.no_launch, log_file_prefix=prefix)
        else:
            run_job_locally(job_command, log_path, args,
                            no_launch=args.no_launch, log_file_prefix=prefix)
        print("success", flush=True)


def _run_cmd(cmd, no_launch=False):
    if no_launch:
        print(cmd)
        return
    p = subprocess.Popen(cmd, shell=True, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
    while True:
        out = p.stdout.readline().decode("utf-8")
        if out == "" and p.poll() is not None:
            break
        print(out, end="")
