"""K × W sensitivity sweep for the handoff k-core (round-10 verdict
#7): measure survivor counts of the bounded-round delta peel over the
extracted handoff graph for K ∈ {2,3,4} × strong-tie weight W ∈
{1,2,3}, so the shipped constants (W=2, K=3 — plans/northstar.py
_HANDOFF_STRONG_W/_HANDOFF_KCORE_K) are a recorded measurement ("the
peel bites without emptying"), not a narrative. Prints a markdown
table for STRESS.md.

Usage: python tools/handoff_sensitivity.py [sf_dir ...]
       (default: sf0.001 sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    sf_dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    from iot_system_plc_data_to_influxdb_spark.session import get_spark

    spark = get_spark("handoff-sensitivity")
    from iot_system_plc_data_to_influxdb_spark.plans.northstar import (
        _HANDOFF_KCORE_ROUNDS,
        _handoff_nb,
        _kcore_delta_peel,
    )

    print("| sf_dir | W (min edge weight) | edges (directed) | "
          "K=2 survivors | K=3 | K=4 |")
    print("|---|---|---|---|---|---|")
    for sf in sf_dirs:
        for w in (1, 2, 3):
            nb = _handoff_nb(spark, sf, min_weight=w)
            n_edges = nb.count()
            cells = []
            for k in (2, 3, 4):
                surv = _kcore_delta_peel(
                    nb, k, _HANDOFF_KCORE_ROUNDS
                ).count()
                cells.append(str(surv))
            print(
                f"| {sf.rstrip('/').rsplit('/', 1)[-1]} | {w} "
                f"| {n_edges} | " + " | ".join(cells) + " |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
