from .integration_solver import IntegrationSolver  # noqa: F401
