"""Per-dataset configuration modules."""
