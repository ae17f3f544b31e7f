"""Command-line drivers: train / test / sample / ft (WIM)."""
