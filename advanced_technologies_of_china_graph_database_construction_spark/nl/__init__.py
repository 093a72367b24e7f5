from . import engine, formatter, planner

__all__ = ["planner", "engine", "formatter"]
