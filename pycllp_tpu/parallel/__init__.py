"""Multi-device scenario sharding (no upstream analogue; SURVEY.md §2.3)."""

from pycllp_tpu.parallel.shard import (
    CollectiveAny,
    scenario_mesh,
    sharded_hsd_solve,
)

__all__ = ["CollectiveAny", "scenario_mesh", "sharded_hsd_solve"]
