"""Direct-workflow task families (reference isaaclab_tasks/direct/)."""
