"""Agent configs for Go2 velocity tasks."""
