from matinvent_tpu.memory.replay_buffer import ReplayBuffer
from matinvent_tpu.memory.ltm import LongTimeMem

__all__ = ["ReplayBuffer", "LongTimeMem"]
