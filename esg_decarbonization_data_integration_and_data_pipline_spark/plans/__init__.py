"""Query plans: the declared-query registry used by __spark_entry__."""
