"""Infra utilities: signal handling, live epoch output, early stopping,
filters, parameters/config."""
