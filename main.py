"""CLI entry point (parity with /root/reference/main.py:11-25).

Usage:
    python main.py expname=run1 pipeline=mat_invent model=diffcsp reward=hhi \
        logger=csv rl_epoch=120 eval_size=16 [key.path=value ...]

Composes the config tree under ./configs, chdirs into the run directory
(<results_dir>/<expname>), persists the resolved config as hparams.yaml, then
instantiates and runs the pipeline.
"""
from __future__ import annotations

import os
import sys

# Optional platform override honored INSIDE the process: site customizations
# (e.g. the axon relay's sitecustomize) force jax.config.jax_platforms after
# import, so the plain JAX_PLATFORMS env var is silently ignored on such
# hosts. MATINVENT_PLATFORM=cpu runs the pipeline on host CPU (smokes, CI)
# even when the configured accelerator backend is unreachable.
if os.environ.get("MATINVENT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["MATINVENT_PLATFORM"])
elif __name__ == "__main__" and not os.environ.get("MATINVENT_SKIP_PROBE"):
    # fail fast when the accelerator relay is unreachable: backend init
    # otherwise blocks indefinitely with no diagnostic (bench.py and
    # __graft_entry__.py guard the same way). Probe in a subprocess so the
    # timeout is enforceable; costs ~backend-init time once at startup.
    from bench import _probe_backend

    if not _probe_backend():
        raise SystemExit(
            "accelerator backend unreachable (relay down?) — set "
            "MATINVENT_PLATFORM=cpu to run on host CPU, or "
            "MATINVENT_SKIP_PROBE=1 to wait for the backend anyway"
        )

# multi-host bring-up MUST precede any backend-initializing import work:
# with MATINVENT_COORDINATOR set (pod-slice launchers export one env per
# process), join the jax distributed runtime before touching anything else
if os.environ.get("MATINVENT_COORDINATOR"):
    from matinvent_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=os.environ["MATINVENT_COORDINATOR"],
        num_processes=int(os.environ.get("MATINVENT_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("MATINVENT_PROCESS_ID", "0")),
    )

from matinvent_tpu.pipeline.logger import setup_logging
from matinvent_tpu.utils.config import instantiate, load_config, save_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def main(argv: list[str]) -> None:
    setup_logging()
    cfg = load_config(CONFIG_DIR, "base", overrides=argv)

    run_dir = os.path.join(cfg.get("results_dir", "exp_res"), cfg.get("expname", "test"))
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)
    save_config(cfg, "hparams.yaml")

    model_suite = instantiate(cfg["model"])
    reward = instantiate(cfg["reward"])
    logger = instantiate(cfg["logger"])
    reinl = instantiate(
        cfg["pipeline"], model_suite=model_suite, reward=reward, logger=logger
    )
    reinl.run_rl()


if __name__ == "__main__":
    main(sys.argv[1:])
