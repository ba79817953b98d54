"""Agent configs for lift."""
