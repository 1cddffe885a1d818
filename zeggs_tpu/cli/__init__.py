"""Command-line entry points: train, generate, data pipeline."""
