from .batch import BatchedSolver, BatchResult  # noqa: F401
from .shard import ShardedSolver  # noqa: F401
