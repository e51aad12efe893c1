from .batch import (  # noqa: F401
    BatchedIntegrationResult,
    BatchedIntegrationSolver,
    ShardedIntegrationSolver,
)
from .integration_solver import IntegrationSolver  # noqa: F401
