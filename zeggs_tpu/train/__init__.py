"""Training: loss stack, RAdam optimizer, pjit'd train loop."""
