from matinvent_tpu.models.mattergen.diffusion import MatterGenDiffusion, MatterGenConfig

__all__ = ["MatterGenDiffusion", "MatterGenConfig"]
