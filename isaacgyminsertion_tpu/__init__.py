"""isaacgyminsertion_tpu: TPU-native visuotactile insertion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
osheraz/IsaacGymInsertion (RA-L 2025). See ARCHITECTURE.md.
"""

__version__ = "0.1.0"
