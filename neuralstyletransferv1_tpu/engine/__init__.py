"""Pipeline engine: model bank, jitted stylizer, batching, CLI surface."""
