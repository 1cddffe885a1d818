"""Corpus pipeline, feature extraction, and windowed training dataset."""
