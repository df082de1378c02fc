from .robots import load_robots
from .scheduler import CLAIM_ORDER, apply_robots, effective_budget_col, schedule_round

__all__ = ["load_robots", "CLAIM_ORDER", "apply_robots", "effective_budget_col", "schedule_round"]
