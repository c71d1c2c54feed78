"""Multi-chip execution: mesh construction, sharding rules, expert parallel.

Net-new relative to the reference, which is single-process/single-node
(SURVEY.md §2.3): here expert weights shard over a `jax.sharding.Mesh`
("data", "expert") and MoE dispatch rides ICI collectives.
"""

from .mesh import make_mesh, param_shardings, data_sharding  # noqa: F401
from .ep import EPConfig, capacity_factor_from_freq  # noqa: F401
from .multihost import (  # noqa: F401
    initialize, host_expert_mesh, MultihostEPConfig, make_multihost_ep_fn,
)
