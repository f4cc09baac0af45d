from .keys import as_key, sim_keys
from .progress import ProgressReporter

__all__ = ["as_key", "sim_keys", "ProgressReporter"]
