"""Agent configs for ANYmal-C velocity tasks."""
