from .hardware_player import HardwareInterface, HardwarePlayer, SimInterface  # noqa: F401
