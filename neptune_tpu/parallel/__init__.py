"""Domain decomposition over device meshes — the distributed capability the
single-process reference lacks (SURVEY.md §2.8)."""

from .distributed import initialize_multihost
from .halo import allreduce_sum, halo_pad_local, sharded_stencil
from .mesh import GridMesh, single_device_mesh
from .sharded import sharded_function, sharded_opdef
from .ca_bicgstab import bicgstab_sharded
from .ca_cg import cg_sharded
from .ca_gmres import gmres_sharded
from .ca_multigrid import build_ca_levels, ca_smoother
from .ca_chebyshev import chebyshev_sharded
from .sharded_apply import (
    plan_opdef,
    plan_report,
    shardmap_opdef,
    shardmap_sweeps,
)

__all__ = [
    "bicgstab_sharded",
    "build_ca_levels",
    "ca_smoother",
    "cg_sharded",
    "chebyshev_sharded",
    "gmres_sharded",
    "shardmap_sweeps",
    "initialize_multihost",
    "allreduce_sum",
    "halo_pad_local",
    "sharded_stencil",
    "GridMesh",
    "single_device_mesh",
    "sharded_function",
    "sharded_opdef",
    "plan_opdef",
    "plan_report",
    "shardmap_opdef",
]
