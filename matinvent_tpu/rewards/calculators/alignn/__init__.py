"""Published-ALIGNN ingestion: jarvis-semantics graphs, JAX forward over
torch state dicts, HF-folder/figshare-zip loaders, reward calculator.

Counterpart of /root/reference/rewards/calculators/alignn/ — see calc.py.
"""
from matinvent_tpu.rewards.calculators.alignn.calc import ALIGNN, ALIGNNModel
from matinvent_tpu.rewards.calculators.alignn.graphs import (
    ALIGNNBatch,
    build_batch,
)
from matinvent_tpu.rewards.calculators.alignn.load import load_alignn_checkpoint
from matinvent_tpu.rewards.calculators.alignn.model import (
    ALIGNNSpec,
    alignn_forward,
    run_batch,
)

__all__ = [
    "ALIGNN", "ALIGNNModel", "ALIGNNBatch", "build_batch",
    "load_alignn_checkpoint", "ALIGNNSpec", "alignn_forward", "run_batch",
]
