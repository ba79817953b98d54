"""Agent configs for Humanoid."""
