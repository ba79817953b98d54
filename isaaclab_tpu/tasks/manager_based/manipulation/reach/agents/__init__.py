"""Agent configs for reach."""
