"""MatInvent-TPU: a TPU-native (JAX/XLA/Pallas/pjit) reinforcement-learning
framework for fine-tuning crystal-structure diffusion models toward target
material properties.

Capability-equivalent re-design of schwallergroup/matinvent (see SURVEY.md),
built TPU-first: static padded shapes, lax.scan reverse diffusion, mesh-sharded
sampling/finetuning, and host-side reward plugins.
"""

__version__ = "0.1.0"
