"""Query plans: the oracle-paired registry consumed by __spark_entry__."""

from .parity import REGISTRY, load_views  # noqa: F401
