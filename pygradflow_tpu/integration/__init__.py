from .batch import BatchedIntegrationResult, BatchedIntegrationSolver  # noqa: F401
from .integration_solver import IntegrationSolver  # noqa: F401
