from . import mesh, sharded
from .mesh import make_mesh
from .sharded import ShardedLMSolver, make_batched_sharded_solver
