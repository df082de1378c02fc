from .adaptive import adaptive_budget_step, round_outcome_counts
from .allocation import apportion_budget, fetch_fairness
from .robots import (
    load_robots,
    parse_robots_body,
    parse_robots_rules,
    robots_from_bodies,
    sitemap_lines,
)
from .scheduler import (
    CLAIM_ORDER,
    apply_robots,
    max_effective_budget,
    effective_budget_col,
    mark_robots,
    schedule_round,
)

__all__ = [
    "adaptive_budget_step",
    "round_outcome_counts",
    "load_robots",
    "parse_robots_body",
    "parse_robots_rules",
    "robots_from_bodies",
    "sitemap_lines",
    "CLAIM_ORDER",
    "apply_robots",
    "mark_robots",
    "max_effective_budget",
    "effective_budget_col",
    "schedule_round",
]
