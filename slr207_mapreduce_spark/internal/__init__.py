"""Version-sensitive Spark internals, contained behind adapters."""
