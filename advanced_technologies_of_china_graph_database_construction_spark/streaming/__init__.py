from . import stateful, windows

__all__ = ["windows", "stateful"]
