"""MLIP workflow bridge (parity with /root/reference/rewards/calculators/fairchem/calc.py:11-61).

Runs elastic (bulk modulus) or phonon (heat capacity at 300 K) MLIP workflows
in a subprocess — optionally inside a different conda env, exactly like the
reference's ``conda run -n fair-chem-v1 python elastic.py ...`` — exchanging
data through the extxyz interchange file and a result txt. The worker scripts
degrade to NaN per structure when the MLIP stack (fairchem/quacc) is absent.
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import List, Tuple

import numpy as np

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.base import Calculator


class MLIPBridge(Calculator):
    TASK_SCRIPTS = {"bulk_modulus": "ELASTIC_PATH", "heat_capacity": "PHONON_PATH"}

    def __init__(
        self,
        root_dir: str,
        task: str = "bulk_modulus",
        env_name: str | None = None,
        worker: int = 1,
    ) -> None:
        super().__init__(root_dir, task)
        if task not in self.TASK_SCRIPTS:
            raise ValueError(f"{task} is an unknown task for the MLIP bridge")
        self.env_name = env_name
        self.worker = worker

    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        from matinvent_tpu.rewards.calculators.mlip import ELASTIC_PATH, PHONON_PATH

        xyz_path = samples[1]
        if xyz_path is None:
            # no interchange file provided: write one
            from matinvent_tpu.chem.structure import save_extxyz

            xyz_path = os.path.join(self.root_dir, f"{label}.extxyz")
            save_extxyz(samples[0], xyz_path)
        xyz_path = os.path.abspath(xyz_path)
        out_path = os.path.abspath(os.path.join(self.root_dir, f"{label}.txt"))

        script = ELASTIC_PATH if self.task == "bulk_modulus" else PHONON_PATH
        cmd = (
            ["conda", "run", "-n", self.env_name] if self.env_name else []
        ) + [sys.executable if not self.env_name else "python",
             script, xyz_path, out_path, str(self.worker)]

        env = dict(os.environ)
        import matinvent_tpu

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(matinvent_tpu.__file__)))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        # never accept a stale result file from a previous run with this label
        if os.path.exists(out_path):
            os.remove(out_path)
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if not os.path.isfile(out_path):
            raise RuntimeError(
                f"MLIP worker produced no output at {out_path} "
                f"(exit {proc.returncode}): {proc.stderr[-500:]}"
            )
        results = np.atleast_1d(np.genfromtxt(out_path))
        if len(results) != len(samples[0]):
            raise RuntimeError(
                f"MLIP worker wrote {len(results)} results for "
                f"{len(samples[0])} structures"
            )
        return results
