"""Job-farm queueing for TPU training runs.

TPU-native counterpart of the reference's ``cc/queue_cc.py`` (Slurm/PBS
cluster database + chained submission, ``queue_cc.py:43-130,355-408``). The
elasticity model is identical: training runs checkpoint on a wall clock and
resume unconditionally, so a long pretraining job is submitted as N chained
short allocations, each continuing from the last checkpoint.

Three backends:

* ``slurm``  — ``sbatch`` with ``--dependency=afterany:<prev>`` chaining
  (drop-in for Slurm-managed TPU or GPU clusters);
* ``gcloud`` — emits ``gcloud compute tpus tpu-vm ...`` create/ssh commands
  for plain GCE TPU VMs (queued-resource style chaining via a wrapper loop);
* ``local``  — sequential ``nohup`` execution on the current host (useful for
  single-host TPU VMs and for testing the tooling).

Job scripts are written to ``scripts/todo/`` and moved to ``scripts/done/``
on submission, mirroring the reference's bookkeeping.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass, field
from typing import Optional

# Accelerator database: TPU equivalents of the reference's per-cluster
# GPU/core/memory table (queue_cc.py:43-130).
ACCELERATORS = {
    "v5e-1": dict(chips=1, topology="1x1", runtime="v2-alpha-tpuv5-lite"),
    "v5e-4": dict(chips=4, topology="2x2", runtime="v2-alpha-tpuv5-lite"),
    "v5e-8": dict(chips=8, topology="2x4", runtime="v2-alpha-tpuv5-lite"),
    "v4-8": dict(chips=4, topology="2x2x1", runtime="tpu-ubuntu2204-base"),
    "v4-32": dict(chips=16, topology="2x2x4", runtime="tpu-ubuntu2204-base"),
}


@dataclass
class JobSpec:
    name: str
    command: str                      # the training command to run
    accelerator: str = "v5e-8"
    time_limit: str = "03:00:00"      # per-allocation wall clock
    num_runs: int = 7                 # chained resumes (ref default, launch_pretraining.py:23-25)
    env: dict = field(default_factory=dict)
    setup_lines: list = field(default_factory=list)  # e.g. data staging


class JobQueue:
    def __init__(self, scripts_dir: str, backend: str = "local"):
        if backend not in ("local", "slurm", "gcloud"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.todo_dir = os.path.join(scripts_dir, "todo")
        self.done_dir = os.path.join(scripts_dir, "done")
        self.stdout_dir = os.path.join(scripts_dir, "stdout")
        for d in (self.todo_dir, self.done_dir, self.stdout_dir):
            os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------------
    def write_script(self, spec: JobSpec) -> str:
        """Write the job script to scripts/todo/<name>.sh."""
        lines = ["#!/bin/bash", "set -e"]
        for k, v in spec.env.items():
            lines.append(f"export {k}={v}")
        lines.extend(spec.setup_lines)
        lines.append(spec.command)
        path = os.path.join(self.todo_dir, f"{spec.name}.sh")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.chmod(path, 0o755)
        return path

    # ------------------------------------------------------------------
    def _slurm_command(self, spec: JobSpec, script: str, dependency: Optional[str]) -> list[str]:
        acc = ACCELERATORS[spec.accelerator]
        cmd = [
            "sbatch",
            f"--job-name={spec.name}",
            f"--time={spec.time_limit}",
            f"--output={self.stdout_dir}/%x-%j.out",
            f"--gres=tpu:{acc['chips']}",
        ]
        if dependency:
            # afterany: continue the chain even if the previous run was
            # preempted/timed out (ref queue_cc.py:379-408)
            cmd.append(f"--dependency=afterany:{dependency}")
        cmd.append(script)
        return cmd

    def _gcloud_script(self, spec: JobSpec, script: str) -> str:
        """Emit a driver script that provisions a TPU VM and runs the chain."""
        acc = ACCELERATORS[spec.accelerator]
        driver = os.path.join(self.done_dir, f"{spec.name}_gcloud.sh")
        body = f"""#!/bin/bash
# Provision a TPU VM and run {spec.num_runs} chained allocations of {spec.name}.
set -e
TPU_NAME={spec.name}-tpu
ZONE=${{ZONE:-us-central1-a}}
gcloud compute tpus tpu-vm create $TPU_NAME --zone=$ZONE \\
  --accelerator-type={spec.accelerator} --version={acc["runtime"]} || true
# One-time loader worker-scaling measurement on the real VM's cores: the
# 1-core build harness can only prove reader determinism, not scaling
# (BASELINE.md "Projected multi-chip scaling"); this records the actual
# curve in the job log before the first training run.
gcloud compute tpus tpu-vm ssh $TPU_NAME --zone=$ZONE --worker=0 \\
  --command "python tools/loader_scaling_check.py" || true
for RUN in $(seq 1 {spec.num_runs}); do
  echo "=== chained run $RUN/{spec.num_runs} ==="
  # --worker=all runs one process per host; SKY_DISTRIBUTED turns on
  # jax.distributed (TPU VMs autodetect the coordinator/peer set)
  gcloud compute tpus tpu-vm ssh $TPU_NAME --zone=$ZONE --worker=all \\
    --command "export SKY_DISTRIBUTED=1; bash -s" < {script}
done
"""
        with open(driver, "w") as f:
            f.write(body)
        os.chmod(driver, 0o755)
        return driver

    # ------------------------------------------------------------------
    def submit(self, spec: JobSpec, dry_run: bool = False) -> list[str]:
        """Write + submit the job chain; returns submitted job ids/paths."""
        script = self.write_script(spec)
        # bookkeeping first: move the script todo -> done and submit that
        # path (avoids racing the job start; ref queue_cc.py:355-378)
        if not dry_run:
            done_path = os.path.join(self.done_dir, os.path.basename(script))
            shutil.move(script, done_path)
            script = done_path
        submitted: list[str] = []

        if self.backend == "slurm":
            dependency = None
            for _ in range(spec.num_runs):
                cmd = self._slurm_command(spec, script, dependency)
                if dry_run:
                    submitted.append(" ".join(cmd))
                    dependency = "<jobid>"
                    continue
                out = subprocess.run(cmd, capture_output=True, text=True, check=True)
                job_id = out.stdout.strip().split()[-1]
                submitted.append(job_id)
                dependency = job_id
        elif self.backend == "gcloud":
            driver = self._gcloud_script(spec, script)
            submitted.append(driver)
            if not dry_run:
                subprocess.Popen(["bash", driver])
        else:  # local: sequential chain in one background shell
            log = os.path.join(self.stdout_dir, f"{spec.name}.out")
            chain = " && ".join([f"bash {script}"] * spec.num_runs)
            if dry_run:
                submitted.append(chain)
            else:
                proc = subprocess.Popen(
                    ["bash", "-c", f"({chain}) >> {log} 2>&1"],
                    start_new_session=True,
                )
                submitted.append(str(proc.pid))

        return submitted


def cancel_slurm_jobs(first_id: int, last_id: int) -> None:
    """scancel an inclusive job-id range (reference ``cancel_simulations.py``)."""
    for job_id in range(first_id, last_id + 1):
        subprocess.run(["scancel", str(job_id)], check=False)
