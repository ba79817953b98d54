"""Agent configs for Ant."""
