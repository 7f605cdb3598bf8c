"""quadruped_locomotion_tpu — a TPU-native quadruped balance/locomotion engine.

Ground-up JAX/XLA/Pallas re-design of the capabilities of
ShunyaoWang/quadruped_locomotion (free_gait planning + virtual-model
balance control + contact-force-distribution QP), built for batched
execution on TPU device meshes.
"""

__version__ = "0.1.0"
