"""Every reward config in the tree must compose and instantiate."""
import os

import pytest

from matinvent_tpu.utils.config import instantiate, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")
REWARDS = sorted(
    f[:-5] for f in os.listdir(os.path.join(CONFIG_DIR, "reward")) if f.endswith(".yaml")
)


@pytest.mark.parametrize("name", REWARDS)
def test_reward_config_instantiates(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(CONFIG_DIR, "base", overrides=[f"reward={name}"])
    reward = instantiate(cfg["reward"])
    assert 0.0 < reward.threshold <= 1.0
    assert len(reward.prop_cfg) >= 1
    for pc in reward.prop_cfg:
        assert hasattr(pc["calculator"], "calc")
