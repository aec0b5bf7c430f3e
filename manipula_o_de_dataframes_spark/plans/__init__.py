from .abc import abc_classification  # noqa: F401
from .history import product_client_history  # noqa: F401
from .pending import pending_by_week  # noqa: F401
