"""Agent configs for cartpole (reference cartpole/agents/)."""
