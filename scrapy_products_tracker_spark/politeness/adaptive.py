"""Adaptive per-domain politeness: AIMD budget control from fetch outcomes.

The reference's politeness envelope is static (8 concurrent per domain,
settings.py:40-41, forever). A real crawler's budget must *react*: a
domain that starts timing out or serving 403/429 bursts is telling you
to back off; a domain that serves every request cleanly can absorb
more. The classic controller is AIMD (additive-increase /
multiplicative-decrease — TCP congestion control's rule, which is why
it is the standard choice for politeness too: it converges to a fair
share and backs off exponentially under distress).

``adaptive_budget_step`` is ONE control step, a pure column transform:

    distress  = (hw_failures + logic_failures) / attempts  >  thresh
    budget'   = max(min_budget, budget DIV 2)        if distress
              = min(max_budget, budget + increase)   if clean round
              = budget                               if no attempts
                                                     (no signal)

Everything integer (DIV 2, +increase) so the trajectory is
engine-exact and replayable. The per-domain state is one int riding
the robots/config table — the broadcast side of the scheduler's join —
so a control step costs one aggregate over the round's outcome rows
(map-side combinable, counters only) joined onto a tiny table. At
10^7 domains the outcome agg is the same shuffle the round's stats
already do; no new scale surface.

Driver wiring: call between rounds with the round's outcome rows and
feed the returned table to the next ``schedule_round``. Kept OUT of
the default crawl loop: the parity fixtures pin the reference's
*static* budget behavior, and the controller is opt-in exactly like
the reference's operators would have to be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def round_outcome_counts(
    outcomes: DataFrame,
    domain_col: str = "domain",
    status_col: str = "fetch_status",
    hw_statuses: tuple = ("timeout",),
    logic_statuses: tuple = ("403", "404"),
) -> DataFrame:
    """(domain, attempts, failures) from per-URL outcome rows — the
    aggregate ``adaptive_budget_step`` consumes. ``failures`` counts
    both hardware (timeout/connection) and logic (4xx) statuses;
    everything else is a success. Map-side combinable (sums only)."""
    fail = F.col(status_col).isin(*[*hw_statuses, *logic_statuses])
    return outcomes.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("attempts"),
        F.sum(fail.cast("int")).alias("failures"),
    )


def adaptive_budget_step(
    budgets: DataFrame,
    outcome_counts: DataFrame,
    distress_milli: int = 200,
    increase: int = 2,
    min_budget: int = 1,
    max_budget: int = 1 << 20,
    budget_col: str = "max_per_round",
) -> DataFrame:
    """One AIMD step: ``budgets`` (domain, max_per_round, ...) joined
    with ``outcome_counts`` (domain, attempts, failures) -> the same
    table with ``max_per_round`` updated. Domains with no outcome rows
    this round keep their budget (no signal != good signal). Distress
    is integer-exact: ``1000*failures > distress_milli*attempts``.

    The join is left (budgets side preserved) and the outcome side is
    one row per *active* domain — broadcastable in any regime where
    a round touches fewer domains than the config table holds."""
    if min_budget < 1 or max_budget < min_budget:
        raise ValueError("need 1 <= min_budget <= max_budget")
    oc = outcome_counts.select("domain", "attempts", "failures")
    j = budgets.join(oc, "domain", "left")
    distress = (F.lit(1000) * F.col("failures")) > (F.lit(distress_milli) * F.col("attempts"))
    b = F.col(budget_col)
    new_b = (
        F.when(F.col("attempts").isNull() | (F.col("attempts") == 0), b)
        .when(distress, F.greatest(F.lit(min_budget), F.expr(f"{budget_col} DIV 2")))
        .otherwise(F.least(F.lit(max_budget), b + F.lit(increase)))
    )
    return j.withColumn(budget_col, new_b.cast("int")).drop("attempts", "failures")
