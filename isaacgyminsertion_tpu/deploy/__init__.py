from .hardware_player import (  # noqa: F401
    DiffusionHardwarePlayer,
    HardwareInterface,
    HardwarePlayer,
    PosPredHardwarePlayer,
    SimInterface,
    StudentHardwarePlayer,
)
