"""Command-line entry points: train, sample, preprocess, bench."""
