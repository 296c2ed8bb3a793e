"""DFT reward calculator (parity with /root/reference/rewards/calculators/dft/calc.py:32-93).

Writes one CIF per structure, fans out remote scheduler jobs concurrently,
blocks until each result file appears, NaN on any failure. IO-bound fan-out
uses a thread pool (the reference used mp.Pool; threads avoid pickling the
transport and behave identically for SSH waits).
"""
from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np
import yaml

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.base import Calculator
from matinvent_tpu.rewards.calculators.dft.job import RemoteQueueJob, Transport


def dft_run(
    task: str,
    job_dir: str,
    cif_path: str,
    config_path: str,
    transport: Transport | None = None,
) -> float:
    try:
        with open(config_path) as fh:
            config = yaml.safe_load(fh)
        config["task"] = task
        config["dir"] = job_dir
        config["cif"] = cif_path
        config["config"] = config_path
        job = RemoteQueueJob.from_config(config, transport=transport)
        return float(job.submit_wait_read())
    except Exception as e:
        logging.debug(f"dft_run failed for {cif_path}: {e}")
        return float("nan")


class DFTCalc(Calculator):
    def __init__(
        self,
        root_dir: str,
        task: str = "band_gap",
        max_node: int = 8,
        config_path: str | None = None,
        transport: Transport | None = None,
    ) -> None:
        super().__init__(root_dir, task)
        self.max_node = max_node
        if config_path is None:
            from matinvent_tpu.rewards.calculators.dft import DFT_CONFIG_PATH

            config_path = DFT_CONFIG_PATH
        self.config_path = os.path.abspath(config_path)
        self.transport = transport  # None -> per-job SSHTransport from config

    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        struc_list = samples[0]
        cif_dir = os.path.join(self.root_dir, label)
        os.makedirs(cif_dir, exist_ok=True)

        param_list = []
        for i, struc in enumerate(struc_list):
            cif_path = os.path.abspath(os.path.join(cif_dir, f"{i}.cif"))
            with open(cif_path, "w") as fh:
                fh.write(struc.to_cif())
            job_dir = os.path.join(label, f"{i:0>2d}")
            param_list.append((self.task, job_dir, cif_path, self.config_path))

        with ThreadPoolExecutor(max_workers=self.max_node) as pool:
            results = list(
                pool.map(lambda p: dft_run(*p, transport=self.transport), param_list)
            )

        results = np.array(results, dtype=float)
        self.save_results(results, label)
        return results
