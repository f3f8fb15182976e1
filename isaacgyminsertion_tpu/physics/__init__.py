from . import robot, kinematics, dynamics, contact, engine  # noqa: F401
