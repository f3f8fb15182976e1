from .config import TaskConfig, default_task_config  # noqa: F401
