"""Data pipeline: on-device collection, dataset preparation, training loaders."""
