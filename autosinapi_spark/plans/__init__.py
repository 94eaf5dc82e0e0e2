"""Query plans / registry consumed by ``__spark_entry__``."""
