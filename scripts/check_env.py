"""Environment preflight (counterpart of the reference's uv_install.sh:
instead of installing pins, validate what this zero-install framework needs).

    python scripts/check_env.py
"""
from __future__ import annotations

import importlib
import shutil
import sys

REQUIRED = ["jax", "flax", "optax", "numpy", "pandas", "scipy", "yaml"]
OPTIONAL = {
    "torch": "reference torch-checkpoint import/export",
    "wandb": "WandB logger (falls back to CSV)",
    "paramiko": "unused (SSH uses the OpenSSH CLI)",
}
TOOLS = {
    "g++": "native charge-balance module (falls back to Python)",
    "ssh": "remote DFT reward driver",
}


def main() -> int:
    ok = True
    for mod in REQUIRED:
        try:
            m = importlib.import_module(mod)
            print(f"[ok]   {mod} {getattr(m, '__version__', '')}")
        except ImportError:
            print(f"[FAIL] {mod} missing (required)")
            ok = False
    for mod, why in OPTIONAL.items():
        try:
            importlib.import_module(mod)
            print(f"[ok]   {mod} (optional)")
        except ImportError:
            print(f"[--]   {mod} missing (optional: {why})")
    for tool, why in TOOLS.items():
        if shutil.which(tool):
            print(f"[ok]   {tool}")
        else:
            print(f"[--]   {tool} missing ({why})")

    import jax

    print(f"[info] jax devices: {jax.devices()}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
