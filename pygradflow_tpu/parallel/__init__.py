from .batch import BatchedSolver, BatchResult  # noqa: F401
from .multistart import MultistartResult, multistart_solve  # noqa: F401
from .shard import ShardedSolver  # noqa: F401
